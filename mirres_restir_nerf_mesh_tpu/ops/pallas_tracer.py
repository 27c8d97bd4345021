"""Pallas TPU kernel: dense ray-mesh closest-hit (SoA Moeller-Trumbore).

The XLA version (ops/cluster_bvh._intersect_dense) streams triangle chunks
from HBM for every ray block; this kernel tiles rays x triangles explicitly
so a triangle block is loaded into VMEM once per ray block and every
intermediate lives in VMEM registers/tiles.

Layout (lane-friendly):
  tris_cm [16, M]   component-major triangle data, rows 0-8 = v0,e1,e2,
                    row 9 = prim id (float), rows 10-15 padding (sublane align)
  rays_cm [8, N]    rows 0-5 = o,d components, 6-7 padding
  out     [4, N]    rows: best_t, best_lin(float), best_u, best_v

Grid: (N / BN, M / BM); the output block depends only on the ray index, so
triangle chunks accumulate into the same VMEM block (init at j == 0).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bvh import HitResult

BN = 512    # rays per block (lanes)
BM = 512    # triangles per block (sublanes)
BIG = 1e30


def _interpret() -> bool:
    """Run the kernel in interpreter mode off-TPU (CPU tests)."""
    return jax.default_backend() == "cpu"


def _kernel(tris_ref, rays_ref, out_ref, *, t_min: float):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        out_ref[0, :] = jnp.full((BN,), BIG, jnp.float32)   # best_t
        out_ref[1, :] = jnp.full((BN,), -1.0, jnp.float32)  # best linear slot
        out_ref[2, :] = jnp.zeros((BN,), jnp.float32)       # u
        out_ref[3, :] = jnp.zeros((BN,), jnp.float32)       # v

    # rays: [1, BN] rows broadcast against triangle sublanes
    ox = rays_ref[0, :][None, :]
    oy = rays_ref[1, :][None, :]
    oz = rays_ref[2, :][None, :]
    dx = rays_ref[3, :][None, :]
    dy = rays_ref[4, :][None, :]
    dz = rays_ref[5, :][None, :]

    # triangles: [BM, 1] columns
    v0x = tris_ref[0, :][:, None]
    v0y = tris_ref[1, :][:, None]
    v0z = tris_ref[2, :][:, None]
    e1x = tris_ref[3, :][:, None]
    e1y = tris_ref[4, :][:, None]
    e1z = tris_ref[5, :][:, None]
    e2x = tris_ref[6, :][:, None]
    e2y = tris_ref[7, :][:, None]
    e2z = tris_ref[8, :][:, None]
    prim = tris_ref[9, :][:, None]

    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv = jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / det)
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv
    t = (e2x * qx + e2y * qy + e2z * qz) * inv
    ok = (
        (jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1)
        & (t > t_min) & (prim >= 0)
    )
    t = jnp.where(ok, t, BIG)  # [BM, BN]

    # reduce over the triangle (sublane) axis
    slot = jnp.argmin(t, axis=0)                  # [BN]
    rows = jax.lax.broadcasted_iota(jnp.int32, (BM, BN), 0)
    sel = rows == slot[None, :]
    t_best = jnp.min(t, axis=0)
    u_best = jnp.max(jnp.where(sel, u, -BIG), axis=0)
    v_best = jnp.max(jnp.where(sel, v, -BIG), axis=0)

    better = t_best < out_ref[0, :]
    lin = (j * BM + slot).astype(jnp.float32)
    out_ref[0, :] = jnp.where(better, t_best, out_ref[0, :])
    out_ref[1, :] = jnp.where(better, lin, out_ref[1, :])
    out_ref[2, :] = jnp.where(better, u_best, out_ref[2, :])
    out_ref[3, :] = jnp.where(better, v_best, out_ref[3, :])


@functools.partial(jax.jit, static_argnames=("t_min",))
def pallas_dense_hit(tris_cm: jnp.ndarray, rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                     t_min: float = 1e-4):
    """tris_cm [16, Mpad] (component-major, padded, prim=-1 padding),
    rays [N,3] -> (best_t [N], best_lin [N] int32, u [N], v [N])."""
    N = rays_o.shape[0]
    M = tris_cm.shape[1]
    n_pad = (-N) % BN
    rays_cm = jnp.zeros((8, N + n_pad), jnp.float32)
    rays_cm = rays_cm.at[0:3, :N].set(rays_o.T)
    rays_cm = rays_cm.at[3:6, :N].set(rays_d.T)

    Np = N + n_pad
    grid = (Np // BN, M // BM)

    out = pl.pallas_call(
        functools.partial(_kernel, t_min=t_min),
        grid=grid,
        in_specs=[
            pl.BlockSpec((16, BM), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, BN), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, BN), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, Np), jnp.float32),
        interpret=_interpret(),
    )(tris_cm, rays_cm)

    best_t = out[0, :N]
    best_lin = out[1, :N].astype(jnp.int32)
    return best_t, best_lin, out[2, :N], out[3, :N]


def pack_tris_cm(verts: jnp.ndarray, tris: jnp.ndarray) -> jnp.ndarray:
    """[16, Mpad] component-major triangle pack for pallas_dense_hit."""
    v0 = verts[tris[:, 0]]
    e1 = verts[tris[:, 1]] - v0
    e2 = verts[tris[:, 2]] - v0
    M = tris.shape[0]
    pad = (-M) % BM
    Mp = M + pad
    cm = jnp.zeros((16, Mp), jnp.float32)
    cm = cm.at[0:3, :M].set(v0.T)
    cm = cm.at[3:6, :M].set(e1.T)
    cm = cm.at[6:9, :M].set(e2.T)
    prim = jnp.concatenate([jnp.arange(M, dtype=jnp.float32), jnp.full((pad,), -1.0)])
    cm = cm.at[9, :].set(prim)
    return cm


def pallas_intersect(verts: jnp.ndarray, tris: jnp.ndarray,
                     rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                     t_min: float = 1e-4, t_max=1e10) -> HitResult:
    """HitResult-compatible wrapper (dense, all triangles)."""
    cm = pack_tris_cm(verts, tris)
    best_t, best_lin, u, v = pallas_dense_hit(cm, rays_o, rays_d, t_min=t_min)
    t_max_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (rays_o.shape[0],))
    miss = (best_t >= jnp.minimum(BIG * 0.5, t_max_arr)) | (best_lin < 0)
    lin = jnp.clip(best_lin, 0, cm.shape[1] - 1)
    rows = cm.T[lin]  # ONE wide-row gather (column gathers are ~35x slower)
    e1 = rows[:, 3:6]
    e2 = rows[:, 6:9]
    prim = rows[:, 9].astype(jnp.int32)
    return HitResult(
        t=jnp.where(miss, jnp.inf, best_t),
        prim=jnp.where(miss, -1, prim),
        u=u,
        v=v,
        normal=jnp.where(miss[:, None], 0.0, jnp.cross(e1, e2)),
    )
