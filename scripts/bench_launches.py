"""TPU experiments on the bench frame's REAL launch shapes.

Times + uncertain counts for the three launch families of render_stage1
(primary G-buffer, NEE/initial-vis occlusion, bounce closest-hit) under the
candidate knobs being considered: primary ray order (raster vs direction-
morton) and the queue work budget (queue_avg) that currently clips bounce
tiles (scripts/diag_candidates.py: bounce counts p50 162 vs unicap ~128).

Methodology per CLAUDE.md: lax.fori_loop over ITERS in-graph iterations,
one scalar fetch, subtract the 29 ms tunnel cost.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.makedirs(os.path.join(_REPO, ".jax_cache"), exist_ok=True)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ITERS = 20


def main() -> None:
    from mirres_restir_nerf_mesh_tpu.data.provider import RayDataset
    from mirres_restir_nerf_mesh_tpu.data.synthetic import make_synthetic_dataset
    from mirres_restir_nerf_mesh_tpu.export.meshops import decimate, marching_tets
    from mirres_restir_nerf_mesh_tpu.ops import cluster_bvh, tile_tracer

    n = 96
    ax = np.linspace(-1, 1, n, dtype=np.float32)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    r = np.sqrt(X ** 2 + Y ** 2 + Z ** 2)
    field = 0.55 + 0.06 * np.sin(9 * X) * np.sin(7 * Y) * np.cos(5 * Z) - r
    verts, tris = marching_tets(field, 0.0, origin=(-1, -1, -1),
                                spacing=(2 / (n - 1),) * 3)
    verts, tris = decimate(verts, tris, 100_000)
    cm = cluster_bvh.build_clusters(jnp.asarray(verts), jnp.asarray(tris), 128)
    C, S = cm.prim.shape
    print(f"mesh {tris.shape[0]} tris C={C} S={S}", flush=True)

    H = W = 256
    data = make_synthetic_dataset(n_frames=1, H=H, W=W, bound=1.0)
    f = RayDataset(data, bound=1.0).frame_rays(0)
    ro, rd = jnp.asarray(f["rays_o"]), jnp.asarray(f["rays_d"])
    N = ro.shape[0]

    def bench(name, fn, *args):
        @jax.jit
        def run(*a):
            def body(i, acc):
                out = fn(*((a[0] + 1e-6 * i,) + a[1:]))
                return acc + out
            return jax.lax.fori_loop(0, ITERS, body, 0.0)

        v = float(run(*args))
        t0 = time.perf_counter()
        v = float(run(*args))
        dt = (time.perf_counter() - t0 - 0.029) / ITERS
        print(f"{name:52s} {dt * 1e3:8.2f} ms  (chk {v:.0f})", flush=True)
        return dt

    def unc(name, fn, *args):
        u = int(jnp.sum(jax.jit(fn)(*args)))
        print(f"{name:52s} uncertain {u}", flush=True)
        return u

    # ---- primary: raster order vs direction-morton sort ----
    for sort in (False, "dir"):
        tag = f"primary closest k=128 sort={sort}"
        fn = lambda o, d, sort=sort: jnp.sum(jnp.where(
            jnp.isfinite(tile_tracer.intersect_tiles_t(
                cm, o, d, k_cap=128, sort_octants=sort).hit.t), 1.0, 0.0))
        bench(tag, fn, ro, rd)
        unc(tag, lambda o, d, sort=sort: tile_tracer.intersect_tiles_t(
            cm, o, d, k_cap=128, sort_octants=sort).uncertain, ro, rd)

    # ---- surface points for secondary launches ----
    hit = tile_tracer.intersect_tiles(cm, ro, rd, k_cap=128)
    t = np.asarray(hit.t)
    m = np.isfinite(t)
    pts = np.asarray(ro)[m] + np.asarray(rd)[m] * t[m][:, None]
    print(f"coverage {m.mean():.3f}", flush=True)
    rng = np.random.RandomState(0)
    nrep = int(np.ceil(N / max(pts.shape[0], 1)))
    pp = np.tile(pts, (nrep, 1))[:N] + 1e-4
    live = rng.rand(N) < 0.68
    tm_live = jnp.asarray(np.where(live, 1e9, 0.0).astype(np.float32))

    # bounce closest-hit shape: sphere-spread dirs
    db = rng.standard_normal((N, 3)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    ppj, dbj = jnp.asarray(pp), jnp.asarray(db)

    # NEE shape: sun-cone dirs
    sun = np.array([0.2, 0.5, 0.84])
    sun /= np.linalg.norm(sun)
    dn = sun[None] + 0.25 * rng.standard_normal((N, 3))
    dn /= np.linalg.norm(dn, axis=1, keepdims=True)
    dnj = jnp.asarray(dn.astype(np.float32))

    for q in (64, 128, 256, 512):
        tag = f"bounce closest k=512 morton q_avg={q}"
        fn = lambda o, d, tm, q=q: jnp.sum(jnp.where(jnp.isfinite(
            tile_tracer.intersect_tiles_t(
                cm, o, d, t_max=tm, k_cap=512, sort_octants="morton",
                queue_avg=q).hit.t), 1.0, 0.0))
        bench(tag, fn, ppj, dbj, tm_live)
        unc(tag, lambda o, d, tm, q=q: tile_tracer.intersect_tiles_t(
            cm, o, d, t_max=tm, k_cap=512, sort_octants="morton",
            queue_avg=q).uncertain, ppj, dbj, tm_live)

    for q in (64, 256):
        tag = f"NEE anyhit k=512 morton q_avg={q}"
        fn = lambda o, d, tm, q=q: jnp.sum(tile_tracer.occluded_tiles_t(
            cm, o, d, tm, k_cap=512, sort_octants="morton",
            queue_avg=q)[0].astype(jnp.float32))
        bench(tag, fn, ppj, dnj, tm_live)
        unc(tag, lambda o, d, tm, q=q: tile_tracer.occluded_tiles_t(
            cm, o, d, tm, k_cap=512, sort_octants="morton",
            queue_avg=q)[1], ppj, dnj, tm_live)

    if "--knobs" in sys.argv:
        # ---- r4 knob sweeps on the worst launch family (bounce closest):
        # exact budgets (k_cap=C so nothing is k-dropped; q_avg up to the
        # point uncertain==0), cluster granularity S, and ray-tile R under
        # the queue path.  Mixed-dir cross-vis-shaped anyhit too (34% live).
        def bounce_fn(cmx, Cx, o, d, tm, q, tile=512):
            return jnp.sum(jnp.where(jnp.isfinite(
                tile_tracer.intersect_tiles_t(
                    cmx, o, d, t_max=tm, k_cap=Cx, sort_octants="morton",
                    queue_avg=q, tile=tile).hit.t), 1.0, 0.0))

        def bounce_unc(cmx, Cx, o, d, tm, q, tile=512):
            return tile_tracer.intersect_tiles_t(
                cmx, o, d, t_max=tm, k_cap=Cx, sort_octants="morton",
                queue_avg=q, tile=tile).uncertain

        for q in (256, 384, 512):
            tag = f"bounce closest k=C q_avg={q} (exact-k)"
            bench(tag, lambda o, d, tm, q=q: bounce_fn(cm, C, o, d, tm, q),
                  ppj, dbj, tm_live)
            unc(tag, lambda o, d, tm, q=q: bounce_unc(cm, C, o, d, tm, q),
                ppj, dbj, tm_live)

        for Sx in (64, 256):
            cmx = cluster_bvh.build_clusters(
                jnp.asarray(verts), jnp.asarray(tris), Sx)
            Cx = cmx.prim.shape[0]
            qx = 384 * (128 // Sx) if Sx < 128 else 192
            tag = f"bounce closest S={Sx} C={Cx} k=C q_avg={qx}"
            bench(tag, lambda o, d, tm, cmx=cmx, Cx=Cx, qx=qx: bounce_fn(
                cmx, Cx, o, d, tm, qx), ppj, dbj, tm_live)
            unc(tag, lambda o, d, tm, cmx=cmx, Cx=Cx, qx=qx: bounce_unc(
                cmx, Cx, o, d, tm, qx), ppj, dbj, tm_live)

        tag = "bounce closest R=256 k=C q_avg=384"
        bench(tag, lambda o, d, tm: bounce_fn(cm, C, o, d, tm, 384, tile=256),
              ppj, dbj, tm_live)
        unc(tag, lambda o, d, tm: bounce_unc(cm, C, o, d, tm, 384, tile=256),
            ppj, dbj, tm_live)

        # cross-vis shape: mixed sun/sky dirs, 34% live
        live2 = rng.rand(N) < 0.34
        tm2 = jnp.asarray(np.where(live2, 1e9, 0.0).astype(np.float32))
        dm = np.where(rng.rand(N, 1) < 0.5, dn, db).astype(np.float32)
        dmj = jnp.asarray(dm)
        for q in (64, 256, 384):
            tag = f"cross-vis anyhit k=C q_avg={q}"
            fn = lambda o, d, tm, q=q: jnp.sum(tile_tracer.occluded_tiles_t(
                cm, o, d, tm, k_cap=C, sort_octants="morton",
                queue_avg=q)[0].astype(jnp.float32))
            bench(tag, fn, ppj, dmj, tm2)
            unc(tag, lambda o, d, tm, q=q: tile_tracer.occluded_tiles_t(
                cm, o, d, tm, k_cap=C, sort_octants="morton",
                queue_avg=q)[1], ppj, dmj, tm2)

    if "--xvis" in sys.argv:
        # launch-SIZE sweep on the cross-vis shape (mixed dirs, 34% live):
        # reads off the fixed (prep/sort/queue-build) vs per-ray cost split
        # — the spp chain fires ONE such launch per spp at ~163k rays
        sun = np.array([0.2, 0.5, 0.84]); sun /= np.linalg.norm(sun)
        for Nx in (40960, 81920, 163840, 327680, 655360):
            repn = int(np.ceil(Nx / pts.shape[0]))
            ppx = jnp.asarray((np.tile(pts, (repn, 1))[:Nx] + 1e-4)
                              .astype(np.float32))
            dn_x = sun[None] + 0.25 * rng.standard_normal((Nx, 3))
            db_x = rng.standard_normal((Nx, 3))
            dm_x = np.where(rng.rand(Nx, 1) < 0.5, dn_x, db_x)
            dm_x /= np.linalg.norm(dm_x, axis=1, keepdims=True)
            dmx = jnp.asarray(dm_x.astype(np.float32))
            tmx = jnp.asarray(np.where(rng.rand(Nx) < 0.34, 1e9, 0.0)
                              .astype(np.float32))
            tag = f"cross-vis anyhit N={Nx} k=C q64"
            bench(tag, lambda o, d, tm: jnp.sum(tile_tracer.occluded_tiles_t(
                cm, o, d, tm, k_cap=C, sort_octants="morton",
                queue_avg=64)[0].astype(jnp.float32)), ppx, dmx, tmx)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
