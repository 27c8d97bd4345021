"""Unified ray-tracer interface over the two acceleration backends.

- 'cluster': TPU-native dense cluster tracer (ops/cluster_bvh.py) — default.
- 'lbvh'   : Karras LBVH + stack traversal (ops/bvh.py) — the structural
  parity backend mirroring the reference's Slang LBVH.

A Tracer is a plain container of traced arrays plus methods, so it can be
constructed inside jitted functions (vertices change every stage-1 step).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import bvh as lbvh_mod
from . import cluster_bvh as cluster_mod
from .bvh import HitResult


class Tracer:
    def __init__(self, accel, kind: str, max_candidates: int = 10,
                 dense_threshold: int = 8192):
        self.accel = accel
        self.kind = kind
        self.max_candidates = max_candidates
        self.dense_threshold = dense_threshold

    def intersect(self, rays_o: jnp.ndarray, rays_d: jnp.ndarray, t_min: float = 1e-4,
                  t_max=1e10) -> HitResult:
        if self.kind == "cluster":
            return cluster_mod.intersect_clusters(
                self.accel, rays_o, rays_d, t_min=t_min, t_max=t_max,
                max_candidates=self.max_candidates,
                dense_threshold=self.dense_threshold,
            )
        return lbvh_mod.intersect_bvh(self.accel, rays_o, rays_d, t_min=t_min, t_max=t_max)

    def occluded(self, rays_o: jnp.ndarray, rays_d: jnp.ndarray, t_max,
                 t_min: float = 1e-4) -> jnp.ndarray:
        if self.kind == "cluster":
            return cluster_mod.occluded_clusters(
                self.accel, rays_o, rays_d, t_max, t_min,
                max_candidates=self.max_candidates,
                dense_threshold=self.dense_threshold,
            )
        return lbvh_mod.occluded(self.accel, rays_o, rays_d, t_max, t_min)


def build_tracer(verts: jnp.ndarray, tris: jnp.ndarray, kind: str = "cluster",
                 cluster_size: int = 128, max_candidates: int = 10,
                 dense_threshold: int = 8192) -> Tracer:
    if kind == "cluster":
        return Tracer(
            cluster_mod.build_clusters(verts, tris, cluster_size), kind,
            max_candidates=max_candidates, dense_threshold=dense_threshold,
        )
    return Tracer(lbvh_mod.build_bvh(verts, tris), kind)
