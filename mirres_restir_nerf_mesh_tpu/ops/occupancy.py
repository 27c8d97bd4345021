"""Occupancy (density) grid maintenance, pure JAX.

Replaces the reference CUDA bitfield machinery (`raymarching/src/raymarching.cu:268-300`
packbits + `nerf/renderer.py:1527-1601` update_extra_state) with a row-major
uint8 occupancy volume per cascade — on TPU a 128^3 byte array gathers faster
than bit extraction and costs only 2 MB/cascade.

State pytree:
  density_grid: [cascade, H, H, H] float32 (EMA of max density; -1 = untrained)
  occ:          [cascade, H, H, H] uint8   (thresholded occupancy)
  mean_density: [] float32
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class OccupancyState(NamedTuple):
    density_grid: jnp.ndarray  # [C, H, H, H] float32
    occ: jnp.ndarray           # [C, H, H, H] uint8
    mean_density: jnp.ndarray  # [] float32


def init_occupancy(cascade: int, grid_size: int = 128) -> OccupancyState:
    shape = (cascade, grid_size, grid_size, grid_size)
    return OccupancyState(
        density_grid=jnp.zeros(shape, jnp.float32),
        occ=jnp.ones(shape, jnp.uint8),  # start fully occupied like an all-pass bitfield
        mean_density=jnp.zeros((), jnp.float32),
    )


def grid_cell_centers(grid_size: int) -> jnp.ndarray:
    """Cell centers in [-1, 1]^3, shape [H,H,H,3] (reference update: 2*c/(H-1)-1)."""
    ax = jnp.arange(grid_size, dtype=jnp.float32)
    xx, yy, zz = jnp.meshgrid(ax, ax, ax, indexing="ij")
    coords = jnp.stack([xx, yy, zz], axis=-1)
    return 2.0 * coords / (grid_size - 1) - 1.0


def update_occupancy(
    state: OccupancyState,
    density_fn: Callable[[jnp.ndarray], jnp.ndarray],
    key: jax.Array,
    bound: float,
    density_thresh: float,
    decay: float = 0.95,
) -> OccupancyState:
    """EMA-max update of the density grid + re-threshold to occupancy.

    Mirrors reference `nerf/renderer.py:1538-1601`: jittered cell-center
    density queries per cascade, `max(old*decay, new)` where both valid
    (cells marked -1 by mark_untrained stay -1), threshold at
    min(mean_density, density_thresh).
    """
    C, H = state.density_grid.shape[0], state.density_grid.shape[1]
    xyzs = grid_cell_centers(H).reshape(-1, 3)  # [H^3, 3] in [-1,1]

    new_grids = []
    for cas in range(C):
        cas_bound = min(2.0 ** cas, bound)
        half_cell = cas_bound / H
        pts = xyzs * (cas_bound - half_cell)
        noise = jax.random.uniform(
            jax.random.fold_in(key, cas), pts.shape, minval=-half_cell, maxval=half_cell
        )
        sigmas = density_fn(pts + noise).reshape(-1)
        new_grids.append(sigmas)
    tmp = jnp.stack(new_grids).reshape(state.density_grid.shape)

    old = state.density_grid
    valid = (old >= 0) & (tmp >= 0)
    grid = jnp.where(valid, jnp.maximum(old * decay, tmp), old)

    mean_density = jnp.mean(jnp.clip(grid, 0.0, None))
    thresh = jnp.minimum(mean_density, density_thresh)
    occ = (grid > thresh).astype(jnp.uint8)
    return OccupancyState(density_grid=grid, occ=occ, mean_density=mean_density)


def mark_untrained_grid(
    state: OccupancyState,
    poses: jnp.ndarray,       # [M, 4, 4] cam2world
    intrinsics: jnp.ndarray,  # [4] fx, fy, cx, cy
    W: int,
    H_img: int,
    bound: float,
) -> OccupancyState:
    """Mark grid cells outside every training-camera frustum as -1.

    Mirrors reference `nerf/renderer.py:1438-1525` mark_untrained_grid: a cell
    is kept if its center projects inside at least one camera image (with a
    half-cell tolerance) in front of the camera.
    """
    C, H = state.density_grid.shape[0], state.density_grid.shape[1]
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    xyzs = grid_cell_centers(H).reshape(-1, 3)

    # world2cam: invert [R|t]
    R = poses[:, :3, :3]  # [M,3,3]
    t = poses[:, :3, 3]   # [M,3]

    grids = []
    for cas in range(C):
        cas_bound = min(2.0 ** cas, bound)
        half_cell = cas_bound / H
        pts = xyzs * (cas_bound - half_cell)  # [N,3]

        # cam coords: R^T (p - t); OpenGL convention (camera looks down -z,
        # y up) to match get_rays (reference nerf/utils.py:409-417)
        rel = pts[None, :, :] - t[:, None, :]                       # [M,N,3]
        cam = jnp.einsum("mij,mnj->mni", jnp.swapaxes(R, 1, 2), rel)  # [M,N,3]
        z = -cam[..., 2]
        u = cam[..., 0] / jnp.maximum(z, 1e-8) * fx + cx
        v = -cam[..., 1] / jnp.maximum(z, 1e-8) * fy + cy
        tol_u = half_cell * fx / jnp.maximum(z, 1e-8)
        tol_v = half_cell * fy / jnp.maximum(z, 1e-8)
        seen = (
            (z > 0)
            & (u >= -tol_u) & (u < W + tol_u)
            & (v >= -tol_v) & (v < H_img + tol_v)
        )
        seen_any = jnp.any(seen, axis=0)  # [N]
        g = state.density_grid[cas].reshape(-1)
        grids.append(jnp.where(seen_any, g, -1.0))
    grid = jnp.stack(grids).reshape(state.density_grid.shape)
    occ = (grid > jnp.minimum(state.mean_density, 1e10)).astype(jnp.uint8)
    return OccupancyState(density_grid=grid, occ=state.occ, mean_density=state.mean_density)


def packbits(occ: jnp.ndarray) -> jnp.ndarray:
    """Pack the uint8 occupancy volume into a bitfield (1 bit/cell), matching
    the reference's storage format (raymarching.cu:268-300 kernel_packbits).
    The TPU marcher gathers bytes directly; this is for compact checkpoints
    and format parity."""
    flat = (occ.reshape(-1, 8) > 0).astype(jnp.uint8)
    weights = (2 ** jnp.arange(8, dtype=jnp.uint8))[None, :]
    return jnp.sum(flat * weights, axis=1, dtype=jnp.uint8)


def unpackbits(bits: jnp.ndarray, shape) -> jnp.ndarray:
    """Inverse of packbits -> uint8 0/1 volume of `shape`."""
    b = bits[:, None] >> jnp.arange(8, dtype=jnp.uint8)[None, :]
    return (b & 1).astype(jnp.uint8).reshape(shape)
