"""Benchmark harness: prints ONE JSON line for the driver.

Headline metric (BASELINE.json north star): stage-1 TRAIN-STEP ray
throughput per chip — the full jitted fwd + bwd + 3-group optimizer update
(the thing `nerf/utils.py:1567-1589` runs per iteration), not just the
forward frame.  Counts every traced ray of the nominal per-algorithm
workload (primary G-buffer + per-spp ReSTIR initial/spatial/final
visibility + bounce closest-hits + bounce NEE shadows,
`nerf/renderer_restir.py:314-471`).  vs_baseline is relative to the
50 Mrays/s/chip north-star target.

Operating point: 256x256 pixels, spp 32 (the reference TRAIN-TIME default,
main.py:108), 2 bounces, 5 spatial neighbors with cross-visibility, ~100k
triangles, reference light tiles (128 x 1024), EXACT tracer budgets
(uncertain == 0), and a camera framing with reference-like object coverage
(>= 40% primary hits — reported as `coverage`; r1-r4 benches framed the
object at ~17% coverage, which live-lane compaction turned into a ~2x
nominal-throughput flattering factor, VERDICT r4 weak #1).

The forward-frame number is kept as a secondary field
(`forward_Mrays_per_s`) for r1-r4 continuity; note the framing change when
comparing across rounds.  Timing spread across the timed groups rides in
`spread` (max |t - median| / median).

Timing methodology (CLAUDE.md): the tunnel costs ~29 ms per scalar fetch
and ~21 ms per dispatch; frames are timed in groups of N_FRAMES inside one
fori_loop graph with ONE scalar fetch per group; the train step is timed
per-call (it runs seconds — the overhead is < 2%).

The environment is a realistic sky+sun HDR (bright sun disk, sky gradient,
ground bounce) — a constant envmap would spread ReSTIR winner directions
uniformly, a distribution no trained or real environment produces.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def rays_per_frame(H: int, W: int, spp: int, neighbors: int, bounces: int,
                   unbiased_spatial: bool) -> int:
    initial_vis = 1
    spatial = (2 * neighbors) if unbiased_spatial else 0
    final_vis = 1
    bounce = 2 * bounces  # closest-hit + NEE shadow per bounce
    per_spp = initial_vis + spatial + final_vis + bounce
    return H * W * (1 + spp * per_spp)  # +1: primary G-buffer per frame


def spread_of(times) -> float:
    med = float(np.median(times))
    return float(max(abs(t - med) for t in times) / med)


def main() -> None:
    import os

    # persistent compile cache: the stage-1 train-step graph compiles slowly
    # the first time; the driver's run then warm-starts from this cache
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mirres_restir_nerf_mesh_tpu.config import Config, finalize
    from mirres_restir_nerf_mesh_tpu.export.meshops import decimate, marching_tets
    from mirres_restir_nerf_mesh_tpu.models.material import MaterialSpec, init_material
    from mirres_restir_nerf_mesh_tpu.models.nerf import NeRFSpec, init_nerf
    from mirres_restir_nerf_mesh_tpu.render.stage1 import (
        Stage1Params,
        Stage1Static,
        render_stage1,
    )
    from mirres_restir_nerf_mesh_tpu.data.synthetic import make_synthetic_dataset
    from mirres_restir_nerf_mesh_tpu.data.provider import RayDataset
    from mirres_restir_nerf_mesh_tpu.train import stage1 as stage1_train
    from mirres_restir_nerf_mesh_tpu.train.losses import build_topology

    # representative mesh: ~100k tris (reference extracts 3e5-face meshes;
    # 1e5 after the bench decimation keeps compile time in the driver budget)
    n = 96
    ax = np.linspace(-1, 1, n, dtype=np.float32)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    r = np.sqrt(X ** 2 + Y ** 2 + Z ** 2)
    field = 0.55 + 0.06 * np.sin(9 * X) * np.sin(7 * Y) * np.cos(5 * Z) - r
    verts, tris = marching_tets(field, 0.0, origin=(-1, -1, -1), spacing=(2 / (n - 1),) * 3)
    verts, tris = decimate(verts, tris, 100_000)

    H = W = 256
    SPP = 32
    BOUNCES = 2
    NEIGHBORS = 5

    # camera radius 1.3: the ~0.55-radius blob subtends ~45% of the frame
    # (lego-like framing); measured coverage is reported in the JSON
    data = make_synthetic_dataset(n_frames=1, H=H, W=W, bound=1.0, radius=1.3)
    sampler = RayDataset(data, bound=1.0)
    f = sampler.frame_rays(0)

    nerf_spec = NeRFSpec(bound=1.0, compute_dtype=jnp.bfloat16)
    mat_spec = MaterialSpec(bound=1.0, compute_dtype=jnp.bfloat16)
    static = Stage1Static(
        tris=jnp.asarray(tris), nerf_spec=nerf_spec, mat_spec=mat_spec,
        spp=SPP, bounces=BOUNCES, use_restir=True, H=H, W=W,
        restir_tiles=128, restir_tile_size=1024,
        restir_light_samples=32, restir_brdf_samples=1,
        restir_neighbors=NEIGHBORS, restir_radius=30.0, restir_offsets=8192,
        denoise_iters=4,
        # exact tracer budgets for this scene (~624 clusters at S=128):
        # k_cap = C everywhere is ~free, and the lean queues keep the
        # work-queue from truncating (measured r4, CLAUDE.md "Exactness
        # attribution") -> uncertain_per_frame == 0
        k_cap=640, queue_avg=256, k_cap_incoherent=640,
        queue_avg_incoherent=64,
    )
    key = jax.random.PRNGKey(0)
    # sky+sun env: cosine-graded sky, 60x sun disk, warm ground
    eh, ew = 64, 128
    theta = (np.arange(eh) + 0.5) / eh * np.pi
    sky = np.clip(np.cos(theta), 0, None)[:, None] ** 1.5
    env_np = np.tile((0.08 + 0.5 * sky)[:, :, None], (1, ew, 3)).astype(np.float32)
    env_np[6:9, 30:34] = [60.0, 55.0, 45.0]
    env_np[eh - 10:] *= [1.15, 0.9, 0.7]
    params = Stage1Params(
        nerf=init_nerf(key, nerf_spec),
        offsets=jnp.zeros((verts.shape[0], 3)),
        mat=init_material(key, mat_spec),
        env=jnp.asarray(env_np),
    )
    bv = jnp.asarray(verts)

    # ---------------- forward frame (secondary, r1-r4 continuity) ----------
    # N whole frames INSIDE one graph (fori_loop body = the full frame; the
    # vertex offsets are perturbed per iteration so the per-step BVH rebuild
    # is NOT hoisted as loop-invariant), ONE dispatch + ONE fetch per group.
    N_FRAMES = 4
    N_GROUPS = 5

    @jax.jit
    def run_frames(params, ro, rd, key):
        def body(i, carry):
            acc, traced, unc, cov = carry
            p_i = params._replace(
                offsets=params.offsets + 1e-6 * (i + 1).astype(jnp.float32)
            )
            out = render_stage1(p_i, static, bv, ro, rd, jax.random.fold_in(key, i))
            return (acc + jnp.sum(out["image_brdf"]),
                    traced + out["traced_rays"],
                    unc + out["uncertain_count"],
                    cov + jnp.mean(out["mask"].astype(jnp.float32)))

        return jax.lax.fori_loop(
            0, N_FRAMES, body,
            (jnp.zeros(()), jnp.zeros(()), jnp.zeros(()), jnp.zeros(())),
        )

    s0, traced, unc, cov = run_frames(params, f["rays_o"], f["rays_d"], key)
    float(s0)  # compile + settle
    # one untimed warm group: the first post-compile dispatch can hit
    # relayout/autotune work that is not steady-state (r5: it skewed the
    # recorded spread to >1.0 while the median stayed clean)
    s0, _, _, _ = run_frames(params, f["rays_o"], f["rays_d"], jax.random.fold_in(key, 99))
    float(s0)
    uncertain = float(unc) / N_FRAMES
    coverage = float(cov) / N_FRAMES
    # actually-traced lanes (t_max > t_min entering tracer launches): lower
    # than the nominal workload because exact-reuse threading eliminates
    # rays whose visibility is already known (VERDICT r3 item 2)
    traced_rays = float(traced) / N_FRAMES

    fwd_times = []
    for i in range(N_GROUPS):
        t0 = time.perf_counter()
        s, _, _, _ = run_frames(params, f["rays_o"], f["rays_d"], jax.random.fold_in(key, 100 + i))
        float(s)
        fwd_times.append(time.perf_counter() - t0)
    fwd_dt = float(np.median(fwd_times)) / N_FRAMES

    total_rays = rays_per_frame(H, W, SPP, NEIGHBORS, BOUNCES, True)
    fwd_mrays = total_rays / fwd_dt / 1e6

    # ---------------- train step (headline, BASELINE.json north star) ------
    cfg = finalize(Config(
        bound=1.0, stage=1, iters=7500, use_brdf=True, use_restir=True,
        spp=SPP, pt_bounces=BOUNCES, env_h=eh, env_w=ew, ssaa=1,
        lambda_tv=0.0,
    ))
    topo = build_topology(np.asarray(tris), verts.shape[0])
    state = stage1_train.init_state(
        jax.random.fold_in(key, 11), cfg, static, params.nerf, verts.shape[0]
    )
    # start from the same env as the forward bench (trained-like radiance)
    state = state._replace(params=state.params._replace(env=params.env))
    train_step = stage1_train.make_train_step(cfg, static, verts, topo)
    batch = {
        "rays_o": f["rays_o"], "rays_d": f["rays_d"],
        "pixels": f["pixels"], "alpha": f["alpha"],
    }
    state, aux = train_step(state, batch, jax.random.fold_in(key, 12))
    float(aux["loss"])  # compile + settle
    ts_times = []
    N_STEPS = 5
    for i in range(N_STEPS):
        t0 = time.perf_counter()
        state, aux = train_step(state, batch, jax.random.fold_in(key, 20 + i))
        float(aux["loss"])
        ts_times.append(time.perf_counter() - t0)
    ts_dt = float(np.median(ts_times))
    ts_mrays = total_rays / ts_dt / 1e6
    ts_uncertain = float(aux["uncertain_count"])

    stage0 = bench_stage0()

    print(
        json.dumps(
            {
                "metric": "stage1_trainstep_Mrays_per_s",
                "value": round(ts_mrays, 4),
                "unit": "Mrays/s/chip",
                "vs_baseline": round(ts_mrays / 50.0, 4),
                # primary-hit fraction of the frame at this camera framing
                # (the honest-workload knob: live-lane compaction makes frame
                # time scale with coverage, VERDICT r4 weak #1)
                "coverage": round(coverage, 4),
                "trainstep_s": round(ts_dt, 4),
                "trainstep_spread": round(spread_of(ts_times), 4),
                "trainstep_uncertain": round(ts_uncertain, 1),
                # forward-frame secondary (r1-r4 headline; those rounds framed
                # the object at ~17% coverage — not directly comparable)
                "forward_Mrays_per_s": round(fwd_mrays, 4),
                "forward_frame_s": round(fwd_dt, 4),
                "forward_spread": round(spread_of(fwd_times), 4),
                # honest-workload tail: both ray definitions (the headline
                # counts the nominal per-algorithm workload the reference
                # actually traces, nerf/renderer_restir.py:314-471)
                "nominal_rays_per_frame": total_rays,
                "traced_rays_per_frame": int(traced_rays),
                "traced_Mrays_per_s": round(traced_rays / fwd_dt / 1e6, 4),
                # tile-tracer exactness telemetry at the bench budgets
                # (0 = no ray's result can lie in a budget-dropped candidate)
                "uncertain_per_frame": round(uncertain, 1),
                # stage-0 trained-phase training throughput at the adapted
                # reference operating point (main.py:70-72 via CLAUDE.md)
                **stage0,
            }
        )
    )


def bench_stage0() -> dict:
    """Stage-0 train-step throughput at the adapted reference operating
    point: 8192 rays x 64 compacted samples, num_points=2^18 with the
    reference -O cross-ray compaction engaged (adaptive_num_rays,
    main.py:70-72 — the field evaluates the 2^18-point budget), full-size
    hash field (16L / 2^19), span-adaptive march lattice.

    Timed as an in-graph fori_loop of SEQUENTIAL train steps (state threaded
    through the carry) with ONE scalar fetch per group: per-call dispatch +
    fetch through the axon tunnel cost ~50 ms/step — a harness artifact real
    training (which does not fetch the loss every step) never pays; r1-r4
    stage-0 numbers carried it.  Returns it/s + Msamples/s fields;
    Msamples/s counts the field-evaluated point budget per step."""
    import jax
    import jax.numpy as jnp

    from mirres_restir_nerf_mesh_tpu.config import Config, finalize
    from mirres_restir_nerf_mesh_tpu.data.provider import RayDataset
    from mirres_restir_nerf_mesh_tpu.data.synthetic import make_synthetic_dataset
    from mirres_restir_nerf_mesh_tpu.models.nerf import NeRFSpec
    from mirres_restir_nerf_mesh_tpu.train import stage0

    cfg = finalize(Config(
        bound=1.0, num_rays=8192, samples_per_ray=64, num_points=2 ** 18,
        dt_gamma=0.0, lambda_tv=1e-8, grid_size=128, adaptive_num_rays=True,
    ))
    data = make_synthetic_dataset(n_frames=8, H=256, W=256, bound=cfg.bound)
    sampler = RayDataset(data, bound=cfg.bound)
    spec = NeRFSpec(bound=cfg.bound, compute_dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    state = stage0.init_state(key, cfg, spec)
    train_step = stage0.make_train_step(cfg, spec, sampler)
    occ_update = stage0.make_occ_update(cfg, spec)
    # settle the occupancy grid into its trained-phase sparsity regime
    state = occ_update(state, jax.random.fold_in(key, 1))

    N_STEPS = 16

    @jax.jit
    def run_steps(state, key):
        def body(i, carry):
            st, _ = carry
            st, aux = train_step(st, jax.random.fold_in(key, i))
            return (st, aux["loss"])

        return jax.lax.fori_loop(0, N_STEPS, body, (state, jnp.zeros(())))

    state, loss = run_steps(state, jax.random.fold_in(key, 2))
    float(loss)  # compile + settle
    times = []
    for i in range(4):
        t0 = time.perf_counter()
        state, loss = run_steps(state, jax.random.fold_in(key, 3 + i))
        float(loss)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) / N_STEPS
    # occupancy update: runs every update_extra_interval(=16) steps in real
    # training (utils.py:1138); reported separately so the step time stays
    # attributable (r4-comparable) — amortized cost is stage0_occ_update_s/16
    # settle occ_update against the CURRENT state pytree first: the leaves
    # coming out of the fori_loop carry can differ in weak_type from the
    # init-state leaves it was first compiled for, and that recompile
    # (~70 s) must not land in the timed region (r5 bench artifact)
    state = occ_update(state, jax.random.fold_in(key, 98))
    float(jnp.sum(state.occ.occ.astype(jnp.float32)))
    t0 = time.perf_counter()
    state = occ_update(state, jax.random.fold_in(key, 99))
    float(jnp.sum(state.occ.occ.astype(jnp.float32)))
    occ_dt = time.perf_counter() - t0
    # points the field evaluates per step: the compaction capacity
    pts = min(cfg.num_points, cfg.num_rays * cfg.samples_per_ray)
    return {
        "stage0_it_per_s": round(1.0 / dt, 3),
        "stage0_Msamples_per_s": round(pts / dt / 1e6, 3),
        "stage0_spread": round(spread_of(times), 4),
        "stage0_occ_update_s": round(occ_dt, 4),
    }


if __name__ == "__main__":
    main()
