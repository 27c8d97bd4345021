"""Stage-0 train-step profiler: attribute the it/s budget at the bench
operating point (8192 rays x 64 compacted samples, num_points=2^18, full
16L/2^19 hash field — reference main.py:70-72 adapted per BASELINE.md).

The reference's stage-0 hot loop is kernel_march_rays_train +
grid_encode_forward/backward (raymarching.cu:338-498,
gridencoder.cu:88-660); here the same step decomposes into march (candidate
lattice + occupancy gather + stride compaction), cross-ray compaction
(sort + row gather), hash-grid encode fwd (combined table gather) / bwd
(Pallas MXU one-hot scatter), MLPs, composite, losses, optimizer+EMA.

Methodology (CLAUDE.md): in-graph lax.fori_loop over the step with ONE
scalar fetch, minus the ~29 ms tunnel fetch cost; min over repeats.

Usage:
  python scripts/profile_stage0.py            # full step + block isolates
  python scripts/profile_stage0.py --ablate   # + config ablations
  python scripts/profile_stage0.py --only march,field
"""

from __future__ import annotations

import argparse
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=8192)
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--points", type=int, default=2 ** 18)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--loop", type=int, default=4, help="steps per timed graph")
    ap.add_argument("--ablate", action="store_true")
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    cache = os.path.join(repo, ".jax_cache")
    os.makedirs(cache, exist_ok=True)

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mirres_restir_nerf_mesh_tpu.config import Config, finalize
    from mirres_restir_nerf_mesh_tpu.data.provider import RayDataset
    from mirres_restir_nerf_mesh_tpu.data.synthetic import make_synthetic_dataset
    from mirres_restir_nerf_mesh_tpu.models import nerf as nerf_model
    from mirres_restir_nerf_mesh_tpu.models.nerf import NeRFSpec
    from mirres_restir_nerf_mesh_tpu.train import stage0

    only = [s.strip() for s in args.only.split(",") if s.strip()]

    def run(name, make_fn):
        """make_fn() -> (jitted fn(key_i) -> scalar). Times args.loop calls
        inside one fori_loop graph, min over args.iters repeats."""
        if only and not any(s in name for s in only):
            return
        fn = make_fn()

        @jax.jit
        def looped(key):
            def body(i, acc):
                return acc + fn(jax.random.fold_in(key, i))

            return jax.lax.fori_loop(0, args.loop, body, jnp.zeros(()))

        key = jax.random.PRNGKey(0)
        float(looped(key))  # compile + settle
        ts = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            float(looped(jax.random.fold_in(key, 100 + i)))
            ts.append(time.perf_counter() - t0)
        per = (min(ts) - 0.029) / args.loop * 1e3
        print(f"{name:46s} {per:9.2f} ms/step  ({1e3 / per:6.2f} it/s)",
              flush=True)
        return per

    def run_threaded(name, make_fn):
        """make_fn() -> (step(st, k) -> (st', loss), st0). Threads the train
        state through the fori_loop carry so the backward and optimizer
        update stay LIVE.  (The old full-step rows returned only aux['loss']
        from a discarded new state — XLA DCEd the entire bwd+opt, which is
        how the r4 '8.26 it/s' figure overstated the honest 4.8 it/s step.)"""
        if only and not any(s in name for s in only):
            return
        step, st0 = make_fn()

        @jax.jit
        def looped(st, key):
            def body(i, carry):
                st, _ = carry
                return step(st, jax.random.fold_in(key, i))

            return jax.lax.fori_loop(0, args.loop, body, (st, jnp.zeros(())))

        key = jax.random.PRNGKey(0)
        st, loss = looped(st0, key)
        float(loss)  # compile + settle
        ts = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            st, loss = looped(st, jax.random.fold_in(key, 100 + i))
            float(loss)
            ts.append(time.perf_counter() - t0)
        per = (min(ts) - 0.029) / args.loop * 1e3
        print(f"{name:46s} {per:9.2f} ms/step  ({1e3 / per:6.2f} it/s)",
              flush=True)
        return per

    def make_cfg(**over):
        kw = dict(
            bound=1.0, num_rays=args.rays, samples_per_ray=args.k,
            num_points=args.points, dt_gamma=0.0, lambda_tv=1e-8,
            grid_size=128,
        )
        kw.update(over)
        return finalize(Config(**kw))

    cfg = make_cfg()
    data = make_synthetic_dataset(n_frames=8, H=256, W=256, bound=cfg.bound)
    sampler = RayDataset(data, bound=cfg.bound)
    spec = NeRFSpec(bound=cfg.bound, compute_dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    state0 = stage0.init_state(key, cfg, spec)
    occ_update = stage0.make_occ_update(cfg, spec)
    state0 = occ_update(state0, jax.random.fold_in(key, 1))
    occ_frac = float(jnp.mean((state0.occ.occ > 0).astype(jnp.float32)))
    print(f"devices: {jax.devices()}", flush=True)
    print(f"op point: {args.rays} rays x K={args.k}, M={args.points}, "
          f"occ density {occ_frac:.3f}", flush=True)

    def full_step(c=None, st=None):
        c = c or cfg
        st = st or state0
        step_fn = stage0.make_train_step(c, spec, sampler)

        def make():
            def step(s, k):
                s2, aux = step_fn(s, k)
                return s2, aux["loss"]

            return step, st

        return make

    # valid-count telemetry at this occupancy
    ts_fn = stage0.make_train_step(cfg, spec, sampler)
    _, aux0 = ts_fn(state0, jax.random.fold_in(key, 2))
    print(f"valid march samples per step: {int(aux0['num_points'])} "
          f"(capacity {args.points})", flush=True)

    run_threaded("full step", full_step())

    if not args.ablate and not only:
        print("DONE", flush=True)
        return

    # --- forward-only loss (isolates backward+opt) ---
    def fwd_only(c=None):
        c = c or cfg
        n_march = stage0.march_candidates_for(c, sampler)  # static; not traceable

        def make():
            def fn(k):
                loss, _ = stage0.stage0_loss(
                    state0.params, state0.occ.occ,
                    sampler.sample(jax.random.fold_in(k, 0), c.num_rays),
                    jax.random.fold_in(k, 1), c, spec, state0.step,
                    march_candidates=n_march,
                )
                return loss

            return fn

        return make

    run("fwd loss only", fwd_only())
    run("fwd loss only adaptive (-O)", fwd_only(make_cfg(adaptive_num_rays=True)))

    # --- grad only (isolates optimizer/EMA) ---
    def grad_only(c=None):
        c = c or cfg

        def make():
            def fn(k):
                g, aux = jax.grad(stage0.stage0_loss, has_aux=True)(
                    state0.params, state0.occ.occ,
                    sampler.sample(jax.random.fold_in(k, 0), c.num_rays),
                    jax.random.fold_in(k, 1), c, spec, state0.step,
                    march_candidates=stage0.march_candidates_for(c, sampler),
                )
                # consume EVERY grad leaf so no part of the backward DCEs
                # (reduces are HBM-read-priced, < 1 ms total)
                gsum = sum(jnp.sum(x.astype(jnp.float32))
                           for x in jax.tree_util.tree_leaves(g))
                return aux["loss"] + gsum

            return fn

        return make

    run("fwd+bwd only (no opt)", grad_only())
    run("fwd+bwd only adaptive (-O)", grad_only(make_cfg(adaptive_num_rays=True)))
    run("fwd+bwd adaptive no-TV", grad_only(make_cfg(adaptive_num_rays=True,
                                                     lambda_tv=0.0)))

    # --- config single-knobs on the full step ---
    run_threaded("no TV loss", full_step(make_cfg(lambda_tv=0.0)))
    run_threaded("capacity 2^17", full_step(make_cfg(num_points=2 ** 17)))
    run_threaded("capacity 2^16", full_step(make_cfg(num_points=2 ** 16)))
    run_threaded("capacity 2^15", full_step(make_cfg(num_points=2 ** 15)))
    run_threaded("max_steps 512", full_step(make_cfg(max_steps=512)))
    run_threaded("max_steps 256", full_step(make_cfg(max_steps=256)))
    run_threaded("rays 4096", full_step(make_cfg(num_rays=4096)))

    # --- block isolates ---
    from mirres_restir_nerf_mesh_tpu.ops.marching import (
        composite_rays, march_rays, near_far_from_aabb,
    )

    aabb = jnp.array([-1.0, -1, -1, 1, 1, 1], jnp.float32)

    def march_only(max_steps=1024):
        def make():
            occ = state0.occ.occ

            def fn(k):
                b = sampler.sample(jax.random.fold_in(k, 0), cfg.num_rays)
                nears, fars = near_far_from_aabb(b["rays_o"], b["rays_d"], aabb, 0.05)
                m = march_rays(
                    b["rays_o"], b["rays_d"], occ, nears, fars, bound=1.0,
                    K=args.k, max_steps=max_steps, dt_gamma=0.0,
                    perturb_key=jax.random.fold_in(k, 1),
                )
                return jnp.sum(m.ts) + jnp.sum(m.valid)

            return fn

        return make

    run("march only (S=1024)", march_only())
    run("march only (S=512)", march_only(512))

    # march sub-attribution: occupancy-test phase only (top_k/selection DCEd)
    def march_pre(max_steps=1024):
        def make():
            from mirres_restir_nerf_mesh_tpu.ops.marching import (
                SQRT3, _candidate_ts, _occupancy_at,
            )

            occ = state0.occ.occ
            dt_min = 2.0 * SQRT3 / 1024
            dt_max = 2.0 * SQRT3 * 1.0 / 128

            def fn(k):
                b = sampler.sample(jax.random.fold_in(k, 0), cfg.num_rays)
                nears, fars = near_far_from_aabb(b["rays_o"], b["rays_d"], aabb, 0.05)
                noise = jax.random.uniform(jax.random.fold_in(k, 1), (cfg.num_rays,))
                ts, dts = _candidate_ts(nears, max_steps, dt_min, dt_max, 0.0, noise)
                pts = b["rays_o"][:, None, :] + b["rays_d"][:, None, :] * ts[..., None]
                mask = (ts < fars[:, None]) & _occupancy_at(occ, pts, dts, 1.0)
                return jnp.sum(mask)

            return fn

        return make

    run("march occupancy-phase only (S=1024)", march_pre())
    run("march occupancy-phase only (S=512)", march_pre(512))

    # reference -O operating point: adaptive_num_rays -> cross-ray compaction
    # (stage0_loss compact_points engages ONLY with this flag)
    run_threaded("full step adaptive (-O compaction)",
        full_step(make_cfg(adaptive_num_rays=True)))
    run_threaded("full step adaptive cap 2^17",
        full_step(make_cfg(adaptive_num_rays=True, num_points=2 ** 17)))

    # --- field eval at M points (the compacted workload) ---
    def field_fwd(M, bwd=False, encode_only=False):
        def make():
            pts0 = jax.random.uniform(jax.random.PRNGKey(7), (M, 3),
                                      minval=-1.0, maxval=1.0)
            dirs0 = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (M, 1))

            def eval_fn(params, pts):
                if encode_only:
                    from mirres_restir_nerf_mesh_tpu.ops.hashgrid import hashgrid_encode

                    return jnp.sum(hashgrid_encode(
                        params["encoder"], pts, spec.grid, spec.bound
                    ).astype(jnp.float32))
                sig, rgb = nerf_model.forward(params, pts, dirs0, spec)
                return jnp.sum(sig) + jnp.sum(rgb)

            def fn(k):
                pts = pts0 + 1e-6 * jax.random.uniform(k, ())
                if bwd:
                    v, g = jax.value_and_grad(eval_fn)(state0.params, pts)
                    return v + jnp.sum(g["encoder"][:4] ** 2)
                return eval_fn(state0.params, pts)

            return fn

        return make

    M = args.points
    run(f"field fwd @ {M} pts", field_fwd(M))
    run(f"field fwd+bwd @ {M} pts", field_fwd(M, bwd=True))
    run(f"encode fwd @ {M} pts", field_fwd(M, encode_only=True))
    run(f"encode fwd+bwd @ {M} pts", field_fwd(M, bwd=True, encode_only=True))
    run(f"field fwd @ {M // 4} pts", field_fwd(M // 4))
    run(f"field fwd+bwd @ {M // 4} pts", field_fwd(M // 4, bwd=True))

    # --- occ update (amortized /update_extra_interval in training) ---
    def occ_only():
        def make():
            def fn(k):
                st = occ_update(state0, k)
                return jnp.sum(st.occ.occ.astype(jnp.float32))

            return fn

        return make

    run("occ update (every 16 steps)", occ_only())

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
