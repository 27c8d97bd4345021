"""Diagnose the quality-recovery gate-2 margin (re-render PSNR vs 30 dB).

Loads the cached fixture (run tests/test_quality_recovery_e2e.py once with
QE2E_CACHE=1 to prime /tmp/qe2e_cache), trains stage-1 like the test, then
evaluates a grid over (eval spp, denoise iters) and reports:
  - per-frame masked LDR PSNR per config (noise-limited? blur-limited?)
  - the GT-vs-GT noise floor (two GT seeds) as the achievable ceiling
  - where the top-error pixels live (silhouette vs interior)
"""

from __future__ import annotations

import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
os.environ.setdefault("RUN_SLOW_TESTS", "1")
os.environ.setdefault("QE2E_CACHE", "1")

import tests.test_quality_recovery_e2e as T  # noqa: E402


def main() -> None:
    from mirres_restir_nerf_mesh_tpu.config import Config, finalize
    from mirres_restir_nerf_mesh_tpu.models.material import MaterialSpec
    from mirres_restir_nerf_mesh_tpu.models.nerf import NeRFSpec, init_nerf
    from mirres_restir_nerf_mesh_tpu.render.stage1 import Stage1Static, render_stage1
    from mirres_restir_nerf_mesh_tpu.train import stage1
    from mirres_restir_nerf_mesh_tpu.train.losses import build_topology

    cd = "/tmp/qe2e_cache"
    assert os.path.exists(os.path.join(cd, "gt.npz")), "prime the cache first"
    z = np.load(os.path.join(cd, "gt.npz"))
    frames = [
        (jnp.asarray(z[f"ro{k}"]), jnp.asarray(z[f"rd{k}"]),
         z[f"img{k}"], z[f"msk{k}"]) for k in range(T.N_VIEWS)
    ]
    zm = np.load(os.path.join(cd, "mesh.npz"))
    verts, tris = zm["verts"], zm["tris"]
    H = W = T.H

    cfg = finalize(Config(
        bound=1.0, stage=1, use_brdf=True, use_restir=True, iters=1000,
        spp=2, pt_bounces=2, env_h=16, env_w=32, ssaa=1,
        lambda_kd=0.02, lambda_ks=0.0005, lambda_nrm=0.0,
        lambda_lap=0.001, lambda_normal=0.0, lambda_edgelen=0.0,
        lambda_offsets=0.1, lambda_mask=0.1, lambda_lpips=0.0,
    ))
    nerf_spec = NeRFSpec(
        bound=1.0, hidden_dim=16, hidden_dim_color=16, geo_feat_dim=7,
        grid_levels=4, grid_log2_hashmap_size=12, grid_desired_resolution=64,
    )
    mat_spec = MaterialSpec(bound=1.0)
    static = Stage1Static(
        tris=jnp.asarray(tris), nerf_spec=nerf_spec, mat_spec=mat_spec,
        spp=cfg.spp, bounces=2, use_restir=True, H=H, W=W,
        restir_tiles=16, restir_tile_size=256, restir_light_samples=16,
        restir_brdf_samples=1, restir_neighbors=3, restir_radius=8.0,
        restir_offsets=512, denoise_iters=2, antialias=False,
    )
    state = stage1.init_state(
        jax.random.PRNGKey(0), cfg, static,
        init_nerf(jax.random.PRNGKey(1), nerf_spec), verts.shape[0],
    )
    topo = build_topology(tris, verts.shape[0])
    step = stage1.make_train_step(cfg, static, verts, topo)
    key = jax.random.PRNGKey(2)
    for i in range(cfg.iters):
        ro, rd, img, mask = frames[i % len(frames)]
        batch = {"rays_o": ro, "rays_d": rd, "pixels": jnp.asarray(img),
                 "alpha": jnp.asarray(mask.astype(np.float32))}
        key, k = jax.random.split(key)
        state, aux = step(state, batch, k)
        if (i + 1) % 250 == 0:
            print(f"iter {i+1} loss {float(aux['loss']):.5f}", flush=True)

    # GT noise floor: regenerate frame 0 GT with a different indirect seed
    # (the fixture used PRNGKey(k) per frame; re-render with key 1000+k)
    # -> approximate by comparing GT to itself is impossible from cache, so
    # report only the render grid.
    for spp_e, dn in [(16, 3), (16, 2), (16, 0), (64, 3), (64, 0), (32, 2)]:
        es = dataclasses.replace(static, spp=spp_e, denoise_iters=dn)

        @jax.jit
        def er(p, ro, rd, k):
            return render_stage1(p, es, jnp.asarray(verts), ro, rd, k)

        ps = []
        for fi in range(3):
            ro, rd, img, mask = frames[fi]
            out = er(state.params, ro, rd, jax.random.PRNGKey(9))
            m = np.asarray(out["mask"]).astype(bool)
            p, agree = T._masked_psnr(
                np.asarray(out["image_brdf"]), img, m, mask.astype(bool)
            )
            ps.append(round(p, 2))
            if spp_e == 16 and dn == 3 and fi == 0:
                # error geography: how much lives in the worst 1% pixels,
                # and are they boundary pixels?
                both = m & mask.astype(bool)
                err = np.abs(
                    np.clip(np.asarray(out["image_brdf"]), 0, 1)
                    - np.clip(img, 0, 1)
                ).sum(1) * both
                e2 = err.reshape(H, W)
                m2 = both.reshape(H, W)
                interior = m2 & np.roll(m2, 1, 0) & np.roll(m2, -1, 0) \
                    & np.roll(m2, 1, 1) & np.roll(m2, -1, 1)
                k99 = np.quantile(err[both.reshape(-1) if False else both], 0.99)
                top = e2 >= max(k99, 1e-9)
                print(f"  err>p99 pixels: {int(top.sum())}, of which "
                      f"boundary {int((top & ~interior).sum())}", flush=True)
        print(f"spp {spp_e:3d} denoise {dn}: PSNRs {ps} mean {np.mean(ps):.2f}",
              flush=True)


if __name__ == "__main__":
    main()
