"""Standalone tracer micro-benchmark on TPU: tile vs cluster backends.

Usage: python scripts/bench_tracer.py [n_tris] [n_rays]

Methodology (CLAUDE.md cost model): the axon tunnel costs ~29 ms per scalar
fetch and ~21 ms per dispatch, so each timing runs ITERS trace calls inside
one jitted lax.fori_loop (inputs varied per iteration) with a single scalar
fetch at the end.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

ITERS = 20


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 65_536

    from mirres_restir_nerf_mesh_tpu.export.meshops import decimate, marching_tets
    from mirres_restir_nerf_mesh_tpu.ops import bvh as lbvh_mod
    from mirres_restir_nerf_mesh_tpu.ops import cluster_bvh, tile_tracer

    n = 96
    ax = np.linspace(-1, 1, n, dtype=np.float32)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    r = np.sqrt(X**2 + Y**2 + Z**2)
    field = 0.55 + 0.06 * np.sin(9 * X) * np.sin(7 * Y) * np.cos(5 * Z) - r
    verts, tris = marching_tets(field, 0.0, origin=(-1, -1, -1), spacing=(2 / (n - 1),) * 3)
    if tris.shape[0] > n_target:
        verts, tris = decimate(verts, tris, n_target)
    print(f"mesh: {verts.shape[0]} verts, {tris.shape[0]} tris")

    cm = cluster_bvh.build_clusters(jnp.asarray(verts), jnp.asarray(tris), 128)
    C, S = cm.prim.shape
    print(f"clusters: C={C}, S={S}")

    # coherent camera rays (pixel-order)
    side = int(np.sqrt(n_rays))
    ys, xs = np.meshgrid(
        np.linspace(-0.4, 0.4, side), np.linspace(-0.4, 0.4, side), indexing="ij"
    )
    d = np.stack([xs, ys, -np.ones_like(xs)], -1).reshape(-1, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = np.tile(np.array([0, 0, 2.5], np.float32), (d.shape[0], 1))
    rays_o, rays_d = jnp.asarray(o), jnp.asarray(d)
    N = rays_o.shape[0]

    # pipeline-like shadow rays: origins sweep the surface in pixel order
    # (spatially coherent, like a G-buffer), directions uniform over the
    # sphere (the early-training worst case for direction coherence)
    rng = np.random.RandomState(0)
    base = np.linspace(-0.7, 0.7, N).astype(np.float32)
    so = np.stack([base, 0.5 * np.sin(base * 9), 0.5 * np.cos(base * 7)], 1)
    sd = rng.normal(size=(N, 3)).astype(np.float32)
    sd /= np.linalg.norm(sd, axis=1, keepdims=True)
    sh_o, sh_d = jnp.asarray(so), jnp.asarray(sd)

    def bench(name, per_iter_sum, ro, rd):
        @jax.jit
        def run(ro, rd):
            def body(i, acc):
                return acc + per_iter_sum(ro + 1e-6 * i, rd)
            return jax.lax.fori_loop(0, ITERS, body, 0.0)

        v = float(run(ro, rd))  # compile + settle
        t0 = time.perf_counter()
        v = float(run(ro, rd))
        dt = (time.perf_counter() - t0 - 0.029) / ITERS
        print(f"{name:44s} {dt*1e3:8.2f} ms  {N/dt/1e6:8.2f} Mrays/s  (chk {v:.0f})")

    def closest_sum(fn):
        def f(ro, rd):
            t = fn(ro, rd)
            return jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0))
        return f

    for kc in (64, 128):
        bench(
            f"tile closest coherent k={min(kc, C)}",
            closest_sum(lambda ro, rd, kc=min(kc, C): tile_tracer.tile_trace(
                cm, ro, rd, k_cap=kc).hit.t),
            rays_o, rays_d,
        )
    bench(
        "tile closest shadow k=512 sorted",
        closest_sum(lambda ro, rd: tile_tracer.tile_trace(
            cm, ro, rd, k_cap=min(512, C), sort_octants=True).hit.t),
        sh_o, sh_d,
    )
    bench(
        "tile anyhit shadow k=512 sorted",
        lambda ro, rd: jnp.sum(tile_tracer.occluded_tiles(
            cm, ro, rd, 1e9, k_cap=min(512, C), sort_octants=True,
            dense_threshold=1).astype(jnp.float32)),
        sh_o, sh_d,
    )
    bench(
        "cluster closest coherent K=10",
        closest_sum(lambda ro, rd: cluster_bvh.intersect_clusters(
            cm, ro, rd, dense_threshold=1).t),
        rays_o, rays_d,
    )

    # exactness telemetry at the defaults
    outc = tile_tracer.tile_trace(cm, rays_o, rays_d, k_cap=min(128, C))
    outs = tile_tracer.tile_trace(
        cm, sh_o, sh_d, k_cap=min(512, C), sort_octants=True
    )
    print(
        f"uncertain telemetry: coherent {int(jnp.sum(outc.uncertain))}/{N}, "
        f"shadow {int(jnp.sum(outs.uncertain))}/{N}"
    )


if __name__ == "__main__":
    main()
