"""Benchmark harness: prints ONE JSON line for the driver.

Headline metric (BASELINE.json): stage-1 2-bounce ReSTIR path-tracing ray
throughput per chip.  Counts every traced ray (primary G-buffer once per
frame + per-spp ReSTIR initial/spatial/final visibility + bounce
closest-hits + bounce NEE shadows) through the full render_stage1 forward.
vs_baseline is relative to the 50 Mrays/s/chip north-star target.

Operating point: 256x256 pixels, spp 32 — the reference's TRAIN-TIME
default (reference main.py:108, BASELINE.md) — 2 bounces, 5 spatial
neighbors with cross-visibility, ~100k triangles, reference light tiles
(128 x 1024), and EXACT tracer budgets (k_cap = cluster count, uncertain
== 0: no ray's result can lie in a budget-dropped candidate).  r1-r3
benches ran spp 4 (compile-budget caution); spp is a linear scan axis
(~36.5 ms/spp marginal, CLAUDE.md), so the spp-4 history converts as
(1 + 4*per_spp) / (1 + 32*per_spp) rays-per-frame ratio.  Reported value
is the median of timed frame groups; each group is forced to completion
with a scalar fetch (block_until_ready does not block through the axon
tunnel).

The environment is a realistic sky+sun HDR (bright sun disk, sky gradient,
ground bounce) — the workload the reference trains on (real HDRIs /
TensoIR envs).  A constant envmap would spread ReSTIR winner directions
and NEE samples uniformly over the sphere, a direction distribution no
trained or real environment produces.
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


def main() -> None:
    import os

    # persistent compile cache: the stage-1 frame graph compiles slowly the
    # first time; the driver's run then warm-starts from this cache
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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

    data = make_synthetic_dataset(n_frames=1, H=H, W=W, bound=1.0)
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

    # throughput timing (CLAUDE.md methodology): the tunnel costs ~29 ms per
    # scalar fetch and ~21 ms per dispatch, which at a ~230 ms frame is ~20%
    # measurement overhead.  Time N whole frames INSIDE one graph (fori_loop
    # body = the full frame; the vertex offsets are perturbed per iteration
    # so the per-step BVH rebuild is NOT hoisted as loop-invariant — training
    # rebuilds it every step) and pay ONE dispatch + ONE fetch per repeat.
    N_FRAMES = 2  # ~1.3 s/frame at spp 32; 2 frames bound the bench wall time

    @jax.jit
    def run_frames(params, ro, rd, key):
        def body(i, carry):
            acc, traced, unc = carry
            p_i = params._replace(
                offsets=params.offsets + 1e-6 * (i + 1).astype(jnp.float32)
            )
            out = render_stage1(p_i, static, bv, ro, rd, jax.random.fold_in(key, i))
            return (acc + jnp.sum(out["image_brdf"]),
                    traced + out["traced_rays"],
                    unc + out["uncertain_count"])

        return jax.lax.fori_loop(
            0, N_FRAMES, body, (jnp.zeros(()), jnp.zeros(()), jnp.zeros(()))
        )

    s0, traced, unc = run_frames(params, f["rays_o"], f["rays_d"], key)
    float(s0)  # compile + settle
    uncertain = float(unc) / N_FRAMES
    # actually-traced lanes (t_max > t_min entering tracer launches): lower
    # than the nominal workload because exact-reuse threading eliminates
    # rays whose visibility is already known (VERDICT r3 item 2)
    traced_rays = float(traced) / N_FRAMES

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        s, _, _ = run_frames(params, f["rays_o"], f["rays_d"], jax.random.fold_in(key, 100 + i))
        float(s)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) / N_FRAMES

    total_rays = rays_per_frame(H, W, SPP, NEIGHBORS, BOUNCES, True)
    mrays = total_rays / dt / 1e6

    stage0 = bench_stage0()

    print(
        json.dumps(
            {
                "metric": "stage1_restir_pt_Mrays_per_s",
                "value": round(mrays, 4),
                "unit": "Mrays/s/chip",
                "vs_baseline": round(mrays / 50.0, 4),
                # honest-workload tail: both ray definitions (the headline
                # counts the nominal per-algorithm workload the reference
                # actually traces, nerf/renderer_restir.py:314-471)
                "nominal_rays_per_frame": total_rays,
                "traced_rays_per_frame": int(traced_rays),
                "traced_Mrays_per_s": round(traced_rays / dt / 1e6, 4),
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
    point: 8192 rays x 64 compacted samples, num_points=2^18, full-size
    hash field (16L / 2^19).  Returns it/s + Msamples/s fields."""
    import jax
    import jax.numpy as jnp

    from mirres_restir_nerf_mesh_tpu.config import Config, finalize
    from mirres_restir_nerf_mesh_tpu.data.provider import RayDataset
    from mirres_restir_nerf_mesh_tpu.data.synthetic import make_synthetic_dataset
    from mirres_restir_nerf_mesh_tpu.models.nerf import NeRFSpec
    from mirres_restir_nerf_mesh_tpu.train import stage0

    cfg = finalize(Config(
        bound=1.0, num_rays=8192, samples_per_ray=64, num_points=2 ** 18,
        dt_gamma=0.0, lambda_tv=1e-8, grid_size=128,
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

    state, aux = train_step(state, jax.random.fold_in(key, 2))
    float(jax.tree_util.tree_leaves(aux)[0])  # compile + settle
    times = []
    for i in range(5):
        t0 = time.perf_counter()
        state, aux = train_step(state, jax.random.fold_in(key, 3 + i))
        float(jax.tree_util.tree_leaves(aux)[0])
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    return {
        "stage0_it_per_s": round(1.0 / dt, 3),
        "stage0_Msamples_per_s": round(cfg.num_rays * cfg.samples_per_ray / dt / 1e6, 3),
    }


if __name__ == "__main__":
    main()
