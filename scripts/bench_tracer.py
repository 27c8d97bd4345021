"""Standalone tracer micro-benchmark on TPU: tile vs cluster backends.

Usage: python scripts/bench_tracer.py [n_tris] [n_rays]
Times closest-hit on coherent camera rays and any-hit on incoherent shadow
rays, per backend, via scalar-fetch (block_until_ready does not block
through the axon tunnel).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 65_536

    from mirres_restir_nerf_mesh_tpu.export.meshops import decimate, marching_tets
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

    # incoherent shadow rays: origins = jittered sphere surface, random dirs
    rng = np.random.RandomState(0)
    so = rng.normal(size=(N, 3)).astype(np.float32)
    so = so / np.linalg.norm(so, axis=1, keepdims=True) * 0.8
    sd = rng.normal(size=(N, 3)).astype(np.float32)
    sd /= np.linalg.norm(sd, axis=1, keepdims=True)
    sh_o, sh_d = jnp.asarray(so), jnp.asarray(sd)

    def timeit(fn, *args, iters=10):
        f = jax.jit(fn)
        v = float(f(*args))  # compile + settle
        t0 = time.perf_counter()
        for _ in range(iters):
            v = float(f(*args))
        dt = (time.perf_counter() - t0) / iters
        return dt, v

    def run(name, fn, *args):
        dt, v = timeit(fn, *args)
        print(f"{name:36s} {dt*1e3:8.2f} ms  {N/dt/1e6:8.2f} Mrays/s  (chk {v:.1f})")

    for k_cap in (64, 128, 192):
        kc = min(k_cap, C)
        run(
            f"tile closest coherent k={kc}",
            lambda ro, rd, kc=kc: jnp.sum(
                jnp.where(jnp.isfinite(t := tile_tracer.tile_trace(cm, ro, rd, k_cap=kc).hit.t), t, 0.0)
            ),
            rays_o, rays_d,
        )
    run(
        "tile anyhit shadow k=128",
        lambda ro, rd: jnp.sum(
            tile_tracer.occluded_tiles(cm, ro, rd, 1e9, k_cap=min(128, C), dense_threshold=1).astype(jnp.float32)
        ),
        sh_o, sh_d,
    )
    run(
        "tile closest shadow k=128",
        lambda ro, rd: jnp.sum(
            jnp.where(jnp.isfinite(t := tile_tracer.tile_trace(cm, ro, rd, k_cap=min(128, C)).hit.t), t, 0.0)
        ),
        sh_o, sh_d,
    )

    run(
        "cluster closest coherent K=10",
        lambda ro, rd: jnp.sum(
            jnp.where(
                jnp.isfinite(t := cluster_bvh.intersect_clusters(cm, ro, rd, dense_threshold=1).t), t, 0.0
            )
        ),
        rays_o, rays_d,
    )
    run(
        "cluster anyhit shadow K=10",
        lambda ro, rd: jnp.sum(
            cluster_bvh.occluded_clusters(cm, ro, rd, 1e9, dense_threshold=1).astype(jnp.float32)
        ),
        sh_o, sh_d,
    )

    # uncertainty telemetry at the tile default
    outc = tile_tracer.tile_trace(cm, rays_o, rays_d, k_cap=min(128, C))
    outs = tile_tracer.tile_trace(cm, sh_o, sh_d, k_cap=min(128, C))
    print(
        f"uncertain: coherent {int(jnp.sum(outc.uncertain))}/{N}, "
        f"shadow {int(jnp.sum(outs.uncertain))}/{N}"
    )


if __name__ == "__main__":
    main()
