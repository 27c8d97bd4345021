"""Unified ray-tracer interface over the acceleration backends.

- 'tile'   : tile-coherent Pallas candidate streaming (ops/tile_tracer.py) —
  the production TPU backend (default).
- 'cluster': per-ray candidate gather loop (ops/cluster_bvh.py) — the
  XLA-only backend (CPU default; no Pallas interpret overhead in tests).
- 'lbvh'   : Karras LBVH + stack traversal (ops/bvh.py) — the structural
  parity backend mirroring the reference's Slang LBVH
  (`nerf/bvhworkers/intersect_test.slang`).

A Tracer is a plain container of traced arrays plus methods, so it can be
constructed inside jitted functions (vertices change every stage-1 step).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import bvh as lbvh_mod
from . import cluster_bvh as cluster_mod
from .bvh import HitResult


class Tracer:
    def __init__(self, accel, kind: str, max_candidates: int = 10,
                 dense_threshold: int = 8192, k_cap: int = 128,
                 k_cap_incoherent: int = 512, tile: int = 512):
        self.accel = accel
        self.kind = kind
        self.max_candidates = max_candidates
        self.dense_threshold = dense_threshold
        self.k_cap = k_cap
        # budget for direction-incoherent batches (bounce rays): a ray tile
        # whose directions span the sphere overlaps many more clusters
        self.k_cap_incoherent = k_cap_incoherent
        self.tile = tile

    def intersect(self, rays_o: jnp.ndarray, rays_d: jnp.ndarray, t_min: float = 1e-4,
                  t_max=1e10, incoherent: bool = False) -> HitResult:
        if self.kind == "tile":
            from . import tile_tracer

            return tile_tracer.intersect_tiles(
                self.accel, rays_o, rays_d, t_min=t_min, t_max=t_max,
                k_cap=self.k_cap_incoherent if incoherent else self.k_cap,
                tile=self.tile, dense_threshold=self.dense_threshold,
                sort_octants=incoherent,
            )
        if self.kind == "cluster":
            return cluster_mod.intersect_clusters(
                self.accel, rays_o, rays_d, t_min=t_min, t_max=t_max,
                max_candidates=self.max_candidates,
                dense_threshold=self.dense_threshold,
            )
        return lbvh_mod.intersect_bvh(self.accel, rays_o, rays_d, t_min=t_min, t_max=t_max)

    def occluded(self, rays_o: jnp.ndarray, rays_d: jnp.ndarray, t_max,
                 t_min: float = 1e-4, incoherent: bool = False) -> jnp.ndarray:
        if self.kind == "tile":
            from . import tile_tracer

            return tile_tracer.occluded_tiles(
                self.accel, rays_o, rays_d, t_max, t_min=t_min,
                k_cap=self.k_cap_incoherent if incoherent else self.k_cap,
                tile=self.tile, dense_threshold=self.dense_threshold,
                sort_octants=incoherent,
            )
        if self.kind == "cluster":
            return cluster_mod.occluded_clusters(
                self.accel, rays_o, rays_d, t_max, t_min,
                max_candidates=self.max_candidates,
                dense_threshold=self.dense_threshold,
            )
        return lbvh_mod.occluded(self.accel, rays_o, rays_d, t_max, t_min)


def default_kind() -> str:
    """'tile' on TPU, 'cluster' on CPU (Pallas interpret mode is slow)."""
    return "tile" if jax.default_backend() != "cpu" else "cluster"


def build_tracer(verts: jnp.ndarray, tris: jnp.ndarray, kind: str = "auto",
                 cluster_size: int = 128, max_candidates: int = 10,
                 dense_threshold: int = 8192, k_cap: int = 128,
                 k_cap_incoherent: int = 512, tile: int = 512) -> Tracer:
    if kind == "auto":
        kind = default_kind()
    if kind in ("cluster", "tile"):
        return Tracer(
            cluster_mod.build_clusters(verts, tris, cluster_size), kind,
            max_candidates=max_candidates, dense_threshold=dense_threshold,
            k_cap=k_cap, k_cap_incoherent=k_cap_incoherent, tile=tile,
        )
    return Tracer(lbvh_mod.build_bvh(verts, tris), kind)
