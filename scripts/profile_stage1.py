"""Stage-1 frame profiler: time the full ReSTIR frame and config ablations.

The reference ships no profiler; its perf story is whatever nvidia-smi says.
Here the bench frame (same scene/config as bench.py) is timed end-to-end
and, with --ablate, re-timed under single-knob config changes so the frame
budget can be attributed (the CLAUDE.md cost-model numbers come from this).

Timing methodology (CLAUDE.md): the tunnel costs ~29 ms per scalar fetch
and ~21 ms per dispatch, so each variant is timed over whole frames with
ONE scalar fetch per frame, min of --iters repeats.

Usage:
  python scripts/profile_stage1.py                 # full frame only
  python scripts/profile_stage1.py --ablate        # + knob ablations
  python scripts/profile_stage1.py --hw 800 --spp 4 --tris 105000
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=256, help="square image size")
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--bounces", type=int, default=2)
    ap.add_argument("--tris", type=int, default=100_000)
    ap.add_argument("--radius", type=float, default=1.3,
                    help="camera radius (1.3 = bench's ~45%% coverage "
                         "lego-like framing; r1-r4 profiles used the old "
                         "~17%% framing, radius 2.0)")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--ablate", action="store_true",
                    help="re-time under single-knob config changes")
    ap.add_argument("--trainstep", action="store_true",
                    help="backward attribution: time the full train step "
                         "and loss-family ablations at the exact budgets")
    ap.add_argument("--only", type=str, default="",
                    help="comma-separated substrings: run only matching ablations "
                         "(the full-frame baseline always runs for delta attribution)")
    args = ap.parse_args()

    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    cache = os.path.join(repo, ".jax_cache")
    os.makedirs(cache, exist_ok=True)

    import jax
    import jax.numpy as jnp

    # share bench.py's persistent compile cache (repeat ablations warm-start)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mirres_restir_nerf_mesh_tpu.export.meshops import decimate, marching_tets
    from mirres_restir_nerf_mesh_tpu.models.material import MaterialSpec, init_material
    from mirres_restir_nerf_mesh_tpu.models.nerf import NeRFSpec, init_nerf
    from mirres_restir_nerf_mesh_tpu.data.synthetic import make_synthetic_dataset
    from mirres_restir_nerf_mesh_tpu.data.provider import RayDataset
    from mirres_restir_nerf_mesh_tpu.render.stage1 import (
        Stage1Params, Stage1Static, render_stage1,
    )

    # bench.py's scene: bumpy blob mesh + sky/sun HDR (see bench.py docstring)
    n = 96
    ax = np.linspace(-1, 1, n, dtype=np.float32)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    r = np.sqrt(X ** 2 + Y ** 2 + Z ** 2)
    field = 0.55 + 0.06 * np.sin(9 * X) * np.sin(7 * Y) * np.cos(5 * Z) - r
    verts, tris = marching_tets(
        field, 0.0, origin=(-1, -1, -1), spacing=(2 / (n - 1),) * 3
    )
    verts, tris = decimate(verts, tris, args.tris)

    H = W = args.hw
    data = make_synthetic_dataset(n_frames=1, H=H, W=W, bound=1.0,
                                  radius=args.radius)
    f = RayDataset(data, bound=1.0).frame_rays(0)
    key = jax.random.PRNGKey(0)
    nerf_spec = NeRFSpec(bound=1.0, compute_dtype=jnp.bfloat16)
    mat_spec = MaterialSpec(bound=1.0, compute_dtype=jnp.bfloat16)
    eh, ew = 64, 128
    theta = (np.arange(eh) + 0.5) / eh * np.pi
    sky = np.clip(np.cos(theta), 0, None)[:, None] ** 1.5
    env_np = np.tile((0.08 + 0.5 * sky)[:, :, None], (1, ew, 3)).astype(np.float32)
    env_np[6:9, 30:34] = [60.0, 55.0, 45.0]
    env_np[eh - 10:] *= [1.15, 0.9, 0.7]
    params = Stage1Params(
        nerf=init_nerf(key, nerf_spec), offsets=jnp.zeros((verts.shape[0], 3)),
        mat=init_material(key, mat_spec), env=jnp.asarray(env_np),
    )
    bv = jnp.asarray(verts)
    base = dict(
        tris=jnp.asarray(tris), nerf_spec=nerf_spec, mat_spec=mat_spec,
        spp=args.spp, bounces=args.bounces, use_restir=True, H=H, W=W,
        restir_tiles=128, restir_tile_size=1024,
        restir_light_samples=32, restir_brdf_samples=1,
        restir_neighbors=5, restir_radius=30.0, restir_offsets=8192,
        denoise_iters=4,
    )

    only = [s.strip() for s in args.only.split(",") if s.strip()]

    def frame(name, **over):
        if only and name != "full frame" and not any(s in name for s in only):
            return
        cfg = dict(base)
        cfg.update(over)
        static = Stage1Static(**cfg)

        @jax.jit
        def run(p, ro, rd, k):
            out = render_stage1(p, static, bv, ro, rd, k)
            return jnp.sum(out["image_brdf"]), out["uncertain_count"]

        s, u = run(params, f["rays_o"], f["rays_d"], key)
        float(s)  # compile + settle
        ts = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            s, u = run(params, f["rays_o"], f["rays_d"], jax.random.fold_in(key, i))
            float(s)
            ts.append(time.perf_counter() - t0)
        print(f"{name:44s} {min(ts) * 1e3:8.1f} ms   uncertain {float(u):.0f}",
              flush=True)

    print(f"devices: {jax.devices()}", flush=True)
    print(f"scene: {tris.shape[0]} tris, {H}x{W}, spp {args.spp}, "
          f"bounces {args.bounces}", flush=True)
    frame("full frame")
    if args.ablate:
        # single-knob deltas attribute the frame budget; each knob's saving
        # is (full - variant).  See CLAUDE.md for the running conclusions.
        frame("spp 1", spp=1)
        frame("spp 8", spp=8)
        frame("spp 16", spp=16)
        frame("spp 32 (reference train default)", spp=32)
        frame("bounces 0 (no indirect)", bounces=0)
        frame("bounces 1", bounces=1)
        frame("biased spatial (no cross-vis)", restir_unbiased_spatial=False)
        frame("no spatial (0 neighbors)", restir_neighbors=0)
        frame("no denoise", denoise_iters=0)
        frame("no antialias", antialias=False)
        frame("no compaction", compact_chunks=1)
        frame("compact chunks 8", compact_chunks=8)
        frame("no restir (1-sample MIS)", use_restir=False)
        # finer attribution (r4): RIS candidate count, spatial width, and
        # profiling-only block skips (Stage1Static.ablate)
        frame("light samples 16", restir_light_samples=16)
        frame("light samples 8", restir_light_samples=8)
        frame("neighbors 3", restir_neighbors=3)
        frame("ab no_field", ablate="no_field")
        frame("ab no_initial", ablate="no_initial")
        frame("ab no_temporal", ablate="no_temporal")
        frame("ab no_final", ablate="no_final")
        frame("ab no_shade", ablate="no_shade")
        frame("ab no_lighttiles", ablate="no_lighttiles")
        # exactness cost: queue/k budgets that zero `uncertain` on this scene
        frame("q_inc 256", queue_avg_incoherent=256)
        frame("exact budgets (q256 k640)", queue_avg_incoherent=256,
              k_cap_incoherent=640)
        frame("exact budgets (q320 k640)", queue_avg_incoherent=320,
              k_cap_incoherent=640)
        # exactness attribution (r4): which launches own the residual
        # `uncertain` — stacked isolators + all-exact upper bound
        frame("exact all (k640 q320 prim k640 q256)",
              queue_avg_incoherent=320, k_cap_incoherent=640,
              k_cap=640, queue_avg=256)
        frame("iso primary+final (b0 no_init nn0)", bounces=0,
              ablate="no_initial", restir_neighbors=0)
        frame("iso primary exact (b0 no_init nn0 k640 q256)", bounces=0,
              ablate="no_initial", restir_neighbors=0, k_cap=640,
              queue_avg=256)
        frame("iso indirect exact (no_init nn0 k640i q320)",
              ablate="no_initial", restir_neighbors=0,
              queue_avg_incoherent=320, k_cap_incoherent=640)
        # minimal exact configs: k_cap=C with the LEANEST queue that keeps
        # uncertain == 0 (the queue is the cost; k640 alone is ~free)
        frame("exact try (prim k640 q256, inc k640 q64)",
              k_cap=640, queue_avg=256, k_cap_incoherent=640)
        frame("exact try (prim k640 q128, inc k640 q96)",
              k_cap=640, queue_avg=128, k_cap_incoherent=640,
              queue_avg_incoherent=96)
        frame("exact try (prim k640 q256, inc k640 q128)",
              k_cap=640, queue_avg=256, k_cap_incoherent=640,
              queue_avg_incoherent=128)
        frame("spp 32 exact (k640 q256c q64i)", spp=32,
              k_cap=640, queue_avg=256, k_cap_incoherent=640)
        frame("spp 8 exact (k640 q256c q64i)", spp=8,
              k_cap=640, queue_avg=256, k_cap_incoherent=640)
        # component re-ablation at the exact-budget baseline (r4 final op
        # point): single-knob deltas vs "exact try (prim k640 q256, inc
        # k640 q64)"
        EX = dict(k_cap=640, queue_avg=256, k_cap_incoherent=640)
        frame("xb:spp 1", spp=1, **EX)
        frame("xb:bounces 0", bounces=0, **EX)
        frame("xb:biased spatial", restir_unbiased_spatial=False, **EX)
        frame("xb:no spatial", restir_neighbors=0, **EX)
        frame("xb:neighbors 3", restir_neighbors=3, **EX)
        frame("xb:light samples 16", restir_light_samples=16, **EX)
        frame("xb:no_field", ablate="no_field", **EX)
        frame("xb:no_initial", ablate="no_initial", **EX)
        frame("xb:no_lighttiles", ablate="no_lighttiles", **EX)
        frame("xb:no denoise", denoise_iters=0, **EX)
        frame("xb:compact chunks 8", compact_chunks=8, **EX)
        frame("xb:brdf samples 0", restir_brdf_samples=0, **EX)
        frame("xb:exact baseline", **EX)
        # spp-32 attribution at the BENCH operating point (the spp-4 deltas
        # under-resolve the per-spp passes; these directly attribute the
        # bench frame).  Each is a fresh ~4 min compile — use --only.
        frame("s32:exact baseline", spp=32, **EX)
        frame("s32:no_initial", spp=32, ablate="no_initial", **EX)
        frame("s32:no_temporal", spp=32, ablate="no_temporal", **EX)
        frame("s32:biased spatial", spp=32, restir_unbiased_spatial=False, **EX)
        frame("s32:no spatial", spp=32, restir_neighbors=0, **EX)
        frame("s32:bounces 0", spp=32, bounces=0, **EX)
        frame("s32:no denoise", spp=32, denoise_iters=0, **EX)
        frame("s32:no_field", spp=32, ablate="no_field", **EX)

    if args.trainstep:
        # backward attribution (VERDICT r4 next #1): time the full jitted
        # train step (fwd+bwd+3-group opt, the bench headline) against the
        # matching forward frame; the delta is the live backward + optimizer.
        from mirres_restir_nerf_mesh_tpu.config import Config, finalize
        from mirres_restir_nerf_mesh_tpu.train import stage1 as stage1_train
        from mirres_restir_nerf_mesh_tpu.train.losses import build_topology

        EX = dict(k_cap=640, queue_avg=256, k_cap_incoherent=640)
        topo = build_topology(np.asarray(tris), verts.shape[0])

        def trainstep(name, spp=args.spp, **cfg_over):
            if only and not any(s in name for s in only):
                return
            static = Stage1Static(**{**base, **EX, "spp": spp})
            kw = dict(bound=1.0, stage=1, iters=7500, use_brdf=True,
                      use_restir=True, spp=spp, pt_bounces=args.bounces,
                      env_h=eh, env_w=ew, ssaa=1, lambda_tv=0.0)
            kw.update(cfg_over)
            cfg = finalize(Config(**kw))
            st = stage1_train.init_state(
                jax.random.fold_in(key, 11), cfg, static, params.nerf,
                verts.shape[0])
            st = st._replace(params=st.params._replace(env=params.env))
            step = stage1_train.make_train_step(cfg, static, verts, topo)
            batch = {"rays_o": f["rays_o"], "rays_d": f["rays_d"],
                     "pixels": f["pixels"], "alpha": f["alpha"]}
            st, aux = step(st, batch, jax.random.fold_in(key, 12))
            float(aux["loss"])  # compile + settle
            ts = []
            for i in range(args.iters):
                t0 = time.perf_counter()
                st, aux = step(st, batch, jax.random.fold_in(key, 20 + i))
                float(aux["loss"])
                ts.append(time.perf_counter() - t0)
            print(f"{name:44s} {min(ts) * 1e3:8.1f} ms   "
                  f"uncertain {float(aux['uncertain_count']):.0f}", flush=True)

        frame("ts-ref: fwd frame (exact budgets)", **EX)
        trainstep("ts: full train step")
        trainstep("ts: no mesh-reg losses", lambda_lap=0.0, lambda_normal=0.0,
                  lambda_edgelen=0.0, lambda_offsets=0.0)
        trainstep("ts: no shading/material losses", lambda_brdf_diffuse=0.0,
                  lambda_brdf_specular=0.0, lambda_kd=0.0, lambda_ks=0.0,
                  lambda_nrm=0.0, lambda_chroma=0.0, lambda_extra_kd=0.0)
        trainstep("ts: nerf-rgb loss only", lambda_rgb_brdf=0.0,
                  lambda_mask=0.0, lambda_brdf_diffuse=0.0,
                  lambda_brdf_specular=0.0, lambda_kd=0.0, lambda_ks=0.0,
                  lambda_nrm=0.0, lambda_chroma=0.0, lambda_extra_kd=0.0,
                  lambda_lap=0.0, lambda_normal=0.0, lambda_edgelen=0.0,
                  lambda_offsets=0.0)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
