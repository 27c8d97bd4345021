"""Diagnose tile-tracer candidate pressure on the bench scene (CPU).

For representative launches (primary G-buffer, initial-vis/NEE style
incoherent, bounce closest-hit) report the per-tile candidate-count
distribution, how many tiles saturate k_cap, how many are clipped by the
queue budget, and the resulting uncertain-ray count — the data needed to
pick budgets that make the bench frame EXACT (uncertain == 0) without
paying for unneeded capacity.
"""

from __future__ import annotations

import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


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
    print(f"mesh: {tris.shape[0]} tris, C={C} clusters x S={S}")

    H = W = 256
    data = make_synthetic_dataset(n_frames=1, H=H, W=W, bound=1.0)
    f = RayDataset(data, bound=1.0).frame_rays(0)
    ro, rd = np.asarray(f["rays_o"]), np.asarray(f["rays_d"])

    rng = np.random.RandomState(0)

    def diag(name, o, d, tmax, k_cap, sort, q_avg=64):
        N = o.shape[0]
        o, d = jnp.asarray(o), jnp.asarray(d)
        tmt = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (N,))
        # replicate tile_trace's sort + tiling
        if sort:
            oct_id = ((d[:, 0] > 0).astype(jnp.int32) + 2 * (d[:, 1] > 0)
                      + 4 * (d[:, 2] > 0)).astype(jnp.int32)
            dead = tmt <= 0.0
            from mirres_restir_nerf_mesh_tpu.ops.morton import morton3d

            lo = jnp.min(cm.aabb_min, axis=0)
            hi = jnp.max(cm.aabb_max, axis=0)
            cell = jnp.clip(((o - lo) / jnp.maximum(hi - lo, 1e-6) * 32.0
                             ).astype(jnp.int32), 0, 31)
            key = oct_id * (1 << 15) + morton3d(cell).astype(jnp.int32)
            key = jnp.where(dead, jnp.int32(1) << 26, key)
            _, perm = jax.lax.sort_key_val(key, jnp.arange(N, dtype=jnp.int32))
            o, d, tmt = o[perm], d[perm], tmt[perm]
        R = 512
        pad = (-N) % R
        o = jnp.concatenate([o, jnp.zeros((pad, 3))])
        d = jnp.concatenate([d, jnp.ones((pad, 3))])
        tmt = jnp.concatenate([tmt, jnp.zeros((pad,))])
        T_ = o.shape[0] // R
        rot = o.reshape(T_, R, 3)
        rdt = d.reshape(T_, R, 3)
        tmtt = tmt.reshape(T_, R)
        cand, octs, counts, dropped, entries = tile_tracer._octant_candidates_blocked(
            cm, rot, rdt, tmtt, 1e-4, k_cap)
        counts = np.asarray(counts)
        dropped = np.asarray(dropped)
        live_tiles = np.asarray(jnp.any(tmtt > 0, axis=1))
        cl = counts[live_tiles]
        W_cap = min(max(T_ * q_avg, 16384), T_ * k_cap)
        # replicate the uniform-cap clip
        caps = np.arange(1, k_cap + 1)
        fits = (np.minimum(np.maximum(counts, 1)[:, None], caps[None, :]).sum(0)
                <= W_cap)
        cap = int(fits.sum()) if fits.any() else 1
        n_clip = int((np.maximum(counts, 1) > cap).sum())
        print(f"{name:34s} tiles={T_:4d} live={int(live_tiles.sum()):4d} "
              f"counts p50={np.percentile(cl, 50):6.0f} p90={np.percentile(cl, 90):6.0f} "
              f"max={cl.max():5d}  sat_kcap={int((cl >= k_cap).sum()):4d} "
              f"drop_finite={int(np.isfinite(dropped).sum()):4d}  "
              f"Wcap={W_cap} unicap={cap} clipped={n_clip}")

    # primary: coherent pinhole rays, no sort (policy: coherent)
    diag("primary (coherent, k=128)", ro, rd, 1e10, 128, False)

    # surface points for secondary launches: exact XLA cluster backend (the
    # Pallas kernel would run in glacial interpret mode on CPU)
    hit = cluster_bvh.intersect_clusters(cm, jnp.asarray(ro), jnp.asarray(rd),
                                         max_candidates=24)
    t = np.asarray(hit.t)
    m = np.isfinite(t)
    print(f"primary coverage {m.mean():.3f}")
    pts = ro[m] + rd[m] * t[m][:, None]

    # initial-vis/NEE-like: origins on surface, dirs to bright env texel cone
    nrep = int(np.ceil(4 * H * W / max(pts.shape[0], 1)))
    pp = np.tile(pts, (nrep, 1))[: 4 * H * W]
    sun = np.array([0.2, 0.5, 0.84])
    sun /= np.linalg.norm(sun)
    dd = sun[None] + 0.25 * rng.standard_normal((pp.shape[0], 3))
    dd /= np.linalg.norm(dd, axis=1, keepdims=True)
    # 17% of lanes live (bench coverage): the rest deadened via t_max=0
    tm = np.where(rng.rand(pp.shape[0]) < 0.68, 1e9, 0.0).astype(np.float32)
    diag("NEE-ish (sun cone, 68% live)", pp, dd, tm, 512, "morton")

    # bounce closest-hit: surface origins, cosine-hemisphere dirs (spread)
    dd2 = rng.standard_normal((pp.shape[0], 3))
    dd2 /= np.linalg.norm(dd2, axis=1, keepdims=True)
    diag("bounce (uniform sphere, 68% live)", pp, dd2, tm, 512, "morton")

    # spatial cross-vis: surface origins toward mixed env winners
    diag("cross-vis (mixed dirs, 34% live)", pp, dd2,
         np.where(rng.rand(pp.shape[0]) < 0.34, 1e9, 0.0).astype(np.float32),
         512, "morton")


if __name__ == "__main__":
    main()
