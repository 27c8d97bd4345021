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
                 k_cap_incoherent: int = 512, tile: int = 512, mesh=None,
                 queue_avg: int = 64, queue_avg_incoherent: int = 64):
        self.accel = accel
        self.kind = kind
        self.max_candidates = max_candidates
        self.dense_threshold = dense_threshold
        self.k_cap = k_cap
        # budget for direction-incoherent batches (bounce rays): a ray tile
        # whose directions span the sphere overlaps many more clusters
        self.k_cap_incoherent = k_cap_incoherent
        self.tile = tile
        # work-queue budgets (avg active candidates per tile, _run_queue):
        # the global W_cap = tiles * queue_avg clips crowded launches, which
        # the uncertain telemetry accounts — incoherent batches need a larger
        # budget than coherent ones (bench scene p50 candidate counts: ~10
        # coherent, ~160-220 incoherent)
        self.queue_avg = queue_avg
        self.queue_avg_incoherent = queue_avg_incoherent
        # jax.sharding.Mesh for data-parallel tracing: the Pallas tile kernel
        # is a custom call GSPMD cannot partition, so under a device mesh every
        # trace is wrapped in shard_map — geometry replicated, rays sharded on
        # the 'data' axis, each chip traces only its shard (no collectives;
        # the reference's DDP wraps the whole model, nerf/utils.py:761-764)
        self.mesh = mesh
        # exactness telemetry: traced per-call counts of rays whose result may
        # lie in a budget-dropped candidate cluster (tile backend only).
        # Renderers pop_telemetry() and surface the total as a metric.
        self.telemetry = []
        # workload telemetry: live lanes (t_max > t_min) entering each
        # launch — the "actually traced" ray count, as opposed to the
        # nominal per-algorithm workload (the exact-reuse threading zeroes
        # t_max on rays whose visibility is already known).
        self.traced = []

    def pop_telemetry(self) -> jnp.ndarray:
        """Sum (and clear) uncertain-ray counts recorded since the last pop.
        Call within the SAME trace scope as the recording trace calls (the
        values are JAX tracers)."""
        vals, self.telemetry = self.telemetry, []
        total = jnp.zeros((), jnp.float32)
        for v in vals:
            total = total + v
        return total

    def pop_traced(self) -> jnp.ndarray:
        """Sum (and clear) live-lane launch counts since the last pop.
        Same trace-scope rule as pop_telemetry."""
        vals, self.traced = self.traced, []
        total = jnp.zeros((), jnp.float32)
        for v in vals:
            total = total + v
        return total

    def _record_traced(self, rays_o, t_max, t_min):
        t_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                                 (rays_o.shape[0],))
        self.traced.append(jnp.sum((t_arr > t_min).astype(jnp.float32)))

    def _shmap(self, fn, rays_o, rays_d, t_max):
        """Run fn(accel, rays...) per device shard: accel replicated (P()),
        rays sharded on 'data'.  accel is passed as an explicit argument —
        shard_map forbids closing over traced arrays."""
        import jax as _jax
        from jax.sharding import PartitionSpec as P

        t_max_arr = jnp.broadcast_to(
            jnp.asarray(t_max, jnp.float32), (rays_o.shape[0],)
        )
        return _jax.shard_map(
            fn, mesh=self.mesh,
            in_specs=(P(), P("data"), P("data"), P("data")),
            out_specs=P("data"),
            check_vma=False,  # pallas_call outputs carry no vma annotation
        )(self.accel, rays_o, rays_d, t_max_arr)

    def intersect(self, rays_o: jnp.ndarray, rays_d: jnp.ndarray, t_min: float = 1e-4,
                  t_max=1e10, incoherent: bool = False, sort=None) -> HitResult:
        """sort: override the ray-reorder key (None = policy default:
        "morton" for incoherent batches, no sort for coherent ones).  Pass
        "morton_dir2" for direction-CONCENTRATED incoherent batches (ReSTIR
        winner visibility, env-importance NEE shadows)."""
        self._record_traced(rays_o, t_max, t_min)
        if self.kind == "tile":
            from . import tile_tracer

            if sort is None:
                # global (octant, origin-morton) reorder: ~2.9x over the
                # block-local octant sort on scattered-origin batches and
                # exact at the same budget (measured r3, v5e)
                sort = "morton" if incoherent else False

            def run(cm, ro, rd, tm):
                return tile_tracer.intersect_tiles_t(
                    cm, ro, rd, t_min=t_min, t_max=tm,
                    k_cap=self.k_cap_incoherent if incoherent else self.k_cap,
                    tile=self.tile, dense_threshold=self.dense_threshold,
                    sort_octants=sort,
                    queue_avg=(self.queue_avg_incoherent if incoherent
                               else self.queue_avg),
                )

            if self.mesh is not None:
                out = self._shmap(run, rays_o, rays_d, t_max)
            else:
                t_max_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (rays_o.shape[0],))
                out = run(self.accel, rays_o, rays_d, t_max_arr)
            self.telemetry.append(jnp.sum(out.uncertain.astype(jnp.float32)))
            return out.hit
        if self.kind == "cluster":
            return cluster_mod.intersect_clusters(
                self.accel, rays_o, rays_d, t_min=t_min, t_max=t_max,
                max_candidates=self.max_candidates,
                dense_threshold=self.dense_threshold,
            )
        return lbvh_mod.intersect_bvh(self.accel, rays_o, rays_d, t_min=t_min, t_max=t_max)

    def occluded(self, rays_o: jnp.ndarray, rays_d: jnp.ndarray, t_max,
                 t_min: float = 1e-4, incoherent: bool = False,
                 sort=None) -> jnp.ndarray:
        self._record_traced(rays_o, t_max, t_min)
        if self.kind == "tile":
            from . import tile_tracer

            if sort is None:
                sort = "morton" if incoherent else False

            def run(cm, ro, rd, tm):
                return tile_tracer.occluded_tiles_t(
                    cm, ro, rd, tm, t_min=t_min,
                    k_cap=self.k_cap_incoherent if incoherent else self.k_cap,
                    tile=self.tile, dense_threshold=self.dense_threshold,
                    sort_octants=sort,
                    queue_avg=(self.queue_avg_incoherent if incoherent
                               else self.queue_avg),
                )

            if self.mesh is not None:
                occ, unc = self._shmap(run, rays_o, rays_d, t_max)
            else:
                t_max_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (rays_o.shape[0],))
                occ, unc = run(self.accel, rays_o, rays_d, t_max_arr)
            self.telemetry.append(jnp.sum(unc.astype(jnp.float32)))
            return occ
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
                 k_cap_incoherent: int = 512, tile: int = 512, mesh=None,
                 queue_avg: int = 64, queue_avg_incoherent: int = 64) -> Tracer:
    if kind == "auto":
        kind = default_kind()
    if kind in ("cluster", "tile"):
        return Tracer(
            cluster_mod.build_clusters(verts, tris, cluster_size), kind,
            max_candidates=max_candidates, dense_threshold=dense_threshold,
            k_cap=k_cap, k_cap_incoherent=k_cap_incoherent, tile=tile,
            mesh=mesh, queue_avg=queue_avg,
            queue_avg_incoherent=queue_avg_incoherent,
        )
    return Tracer(lbvh_mod.build_bvh(verts, tris), kind)
