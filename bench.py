"""Benchmark harness: prints ONE JSON line for the driver.

Round-1 metric: stage-0 training throughput (rays/s through the full
march->hash-MLP->composite->backward step) on the real chip.
vs_baseline is relative to the BASELINE.json north-star 50 Mrays/s/chip
(defined there for the stage-1 2-bounce ReSTIR step; stage-1 bench lands
when that path is complete, keeping the same metric name/unit).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main() -> None:
    from mirres_restir_nerf_mesh_tpu.config import Config, finalize
    from mirres_restir_nerf_mesh_tpu.data.provider import RayDataset
    from mirres_restir_nerf_mesh_tpu.data.synthetic import make_synthetic_dataset
    from mirres_restir_nerf_mesh_tpu.models.nerf import NeRFSpec
    from mirres_restir_nerf_mesh_tpu.train import stage0

    cfg = finalize(
        Config(
            bound=1.0,
            iters=1000,
            num_rays=8192,
            max_steps=512,
            samples_per_ray=64,
            grid_size=128,
            dt_gamma=0.0,
            lambda_tv=0.0,
            fp16=True,
        )
    )
    spec = NeRFSpec(bound=cfg.bound, compute_dtype=jnp.bfloat16)
    data = make_synthetic_dataset(n_frames=8, H=96, W=96, bound=cfg.bound)
    sampler = RayDataset(data, bound=cfg.bound)

    key = jax.random.PRNGKey(0)
    state = stage0.init_state(key, cfg, spec)
    train_step = stage0.make_train_step(cfg, spec, sampler)
    occ_update = stage0.make_occ_update(cfg, spec)

    # warm up / compile
    state = occ_update(state, jax.random.PRNGKey(1))
    state, aux = train_step(state, jax.random.PRNGKey(2))
    jax.block_until_ready(aux["loss"])

    iters = 30
    t0 = time.perf_counter()
    for i in range(iters):
        key, sub = jax.random.split(key)
        state, aux = train_step(state, sub)
    jax.block_until_ready(aux["loss"])
    dt = time.perf_counter() - t0

    rays_per_s = iters * cfg.num_rays / dt
    mrays = rays_per_s / 1e6
    print(
        json.dumps(
            {
                "metric": "stage0_train_Mrays_per_s",
                "value": round(mrays, 4),
                "unit": "Mrays/s/chip",
                "vs_baseline": round(mrays / 50.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
