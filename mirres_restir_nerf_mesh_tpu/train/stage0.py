"""Stage-0 trainer: radiance-field optimization (jit-compiled step + host loop).

Re-implements the reference Trainer's stage-0 path (`nerf/utils.py:709-1136,
1519-1620`): Adam(eps=1e-15) with warmup+exponential LR, EMA(0.95) on params,
rgb MSE + mask + entropy + eikonal + hash-TV losses, occupancy-grid EMA update
every `update_extra_interval` steps.  All three reference AMP/GradScaler
mechanics are unnecessary on TPU (bfloat16 has fp32 range); params stay fp32.

Multi-chip: the train step is data-parallel over rays — batch arrays are
sharded over the 'data' mesh axis and the gradient psum is inserted by XLA
when jitted with sharded inputs (see parallel/mesh.py).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..models import nerf as nerf_model
from ..ops.hashgrid import hashgrid_tv_loss
from ..ops.occupancy import OccupancyState, init_occupancy, update_occupancy
from ..render.volume import render_rays


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    ema_params: Any
    occ: OccupancyState
    step: jnp.ndarray


def lr_schedule(cfg: Config):
    """Warmup to 500 then exponential decay to 0.1x (reference main.py:284)."""
    iters = cfg.iters

    def fn(step):
        warm = 0.01 + 0.99 * (step / 500.0)
        decay = 0.1 ** ((step - 500.0) / max(iters - 500.0, 1.0))
        return jnp.where(step <= 500, warm, decay)

    return fn


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    sched = lr_schedule(cfg)
    return optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-15),
        optax.scale_by_schedule(lambda s: -cfg.lr * sched(s)),
    )


def init_state(key: jax.Array, cfg: Config, spec: nerf_model.NeRFSpec) -> TrainState:
    params = nerf_model.init_nerf(key, spec)
    opt = make_optimizer(cfg)
    return TrainState(
        params=params,
        opt_state=opt.init(params),
        ema_params=params,
        occ=init_occupancy(cfg.cascade, cfg.grid_size),
        step=jnp.zeros((), jnp.int32),
    )


def _aabb(cfg: Config) -> jnp.ndarray:
    if cfg.scene_aabb is not None:
        return jnp.asarray(cfg.scene_aabb, jnp.float32)
    b = cfg.bound
    return jnp.array([-b, -b, -b, b, b, b], jnp.float32)


def march_candidates_for(cfg: Config, sampler) -> Optional[int]:
    """EXACT span-adaptive candidate-lattice length (ops/marching.py
    march_rays n_candidates): the maximum [near, far) span over every
    training ray bounds how many dt_min lattice slots can ever be live —
    beyond-far candidates are masked, so S = ceil(span/dt_min) + 2 skips
    their occupancy gathers for free.  For cameras outside the AABB that is
    ~60% of the lattice (measured on v5e: march 110 -> 72 ms at S 1024 ->
    512, scripts/profile_stage0.py).  The reference CUDA marcher's while
    loop simply terminates at `far` (raymarching.cu:338-498).

    The dt_max margin covers the perturb shift (t0 <= near + dt_max,
    _candidate_ts) and dt >= dt_min holds for any dt_gamma, so the bound is
    safe for geometric schedules too.  Returns None when the scan cannot
    bound the span below max_steps."""
    import numpy as np

    data = getattr(sampler, "data", None)
    if data is None:
        return None
    aabb = np.asarray(
        cfg.scene_aabb
        if cfg.scene_aabb is not None
        else [-cfg.bound, -cfg.bound, -cfg.bound, cfg.bound, cfg.bound, cfg.bound],
        np.float32,
    )
    dt_min = 2.0 * math.sqrt(3.0) / cfg.max_steps
    span = 0.0
    for i in range(data.num_frames):
        f = sampler.frame_rays(i)
        ro = np.asarray(f["rays_o"], np.float32)
        rd = np.asarray(f["rays_d"], np.float32)
        inv = 1.0 / np.where(np.abs(rd) < 1e-15, 1e-15, rd)
        t0 = (aabb[None, 0:3] - ro) * inv
        t1 = (aabb[None, 3:6] - ro) * inv
        tmin = np.minimum(t0, t1).max(axis=-1)
        tmax = np.maximum(t0, t1).min(axis=-1)
        near = np.maximum(tmin, cfg.min_near)
        hit = (tmax >= tmin) & (tmax >= cfg.min_near)
        if hit.any():
            span = max(span, float((tmax - near)[hit].max()))
    if span <= 0.0:
        return None
    dt_max = 2.0 * math.sqrt(3.0) * cfg.bound / cfg.grid_size
    s = int(math.ceil((span + dt_max) / dt_min)) + 1
    return s if s < cfg.max_steps else None


def stage0_loss(
    params: Any,
    occ: jnp.ndarray,
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    cfg: Config,
    spec: nerf_model.NeRFSpec,
    step: jnp.ndarray,
    march_candidates: Optional[int] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    max_level = None
    if cfg.progressive_level:
        ratio = jnp.minimum(1.0, step.astype(jnp.float32) / (0.5 * cfg.iters))
        max_level = 4 + (12.0 * ratio).astype(jnp.int32)

    cos_anneal = 1.0
    if cfg.sdf:
        cos_anneal = jnp.minimum(1.0, step.astype(jnp.float32) / (0.5 * cfg.iters))

    k_perturb, k_stoch = jax.random.split(key)
    out = render_rays(
        params, occ, batch["rays_o"], batch["rays_d"], spec, _aabb(cfg),
        K=cfg.samples_per_ray, max_steps=cfg.max_steps, dt_gamma=cfg.dt_gamma,
        min_near=cfg.min_near, bg_color=batch["bg_color"], perturb_key=k_perturb,
        contract=cfg.contract, max_level=max_level, cos_anneal_ratio=cos_anneal,
        cam_near_far=batch.get("cam_near_far"),
        march_candidates=march_candidates,
        stochastic_key=k_stoch if cfg.stochastic_interp else None,
        # adaptive_num_rays (-O): the reference adapts the ray count to a
        # num_points budget (utils.py:1133-1134); with static shapes the same
        # budget is enforced by cross-ray compaction of the field evaluation
        compact_points=cfg.num_points if cfg.adaptive_num_rays else None,
    )

    pred = out["image"]
    gt = batch["pixels"]
    loss = cfg.lambda_rgb * jnp.mean((pred - gt) ** 2)

    if cfg.lambda_mask > 0:
        loss = loss + cfg.lambda_mask * jnp.mean((out["weights_sum"] - batch["alpha"]) ** 2)

    if cfg.lambda_entropy > 0:
        w = jnp.clip(out["weights"], 1e-5, 1 - 1e-5)
        ent = -w * jnp.log2(w) - (1 - w) * jnp.log2(1 - w)
        w2 = jnp.clip(out["weights_sum"], 1e-5, 1 - 1e-5)
        ent2 = -w2 * jnp.log2(w2) - (1 - w2) * jnp.log2(1 - w2)
        loss = loss + cfg.lambda_entropy * (jnp.mean(ent) + jnp.mean(ent2))

    if cfg.sdf and cfg.lambda_eikonal > 0:
        nrm = out["normal"]
        loss = loss + cfg.lambda_eikonal * jnp.mean(
            (jnp.linalg.norm(nrm, axis=-1) - 1.0) ** 2
        )

    if "depth" in batch and cfg.lambda_depth > 0:
        # sparse/dense depth supervision with per-ray confidence weights and
        # the 1000-step lambda ramp (reference utils.py:979-1000)
        lam = cfg.lambda_depth * jnp.minimum(1.0, step.astype(jnp.float32) / 1000.0)
        mask = batch["depth"] > 0
        w = batch.get("depth_weight", 1.0)
        loss = loss + lam * jnp.mean(w * mask * (out["depth"] - batch["depth"]) ** 2)

    if cfg.lambda_tv > 0:
        # TV on hash grid at the marched sample locations (reference
        # utils.py:1138-1161 post_train_step -> encoder.grad_total_variation)
        pts = jax.lax.stop_gradient(out["xyzs"].reshape(-1, 3))
        loss = loss + cfg.lambda_tv * hashgrid_tv_loss(params["encoder"], pts, spec.grid, spec.bound)

    aux = {
        "loss": loss,
        "psnr": -10.0 * jnp.log10(jnp.maximum(jnp.mean((pred - gt) ** 2), 1e-12)),
        "num_points": out["num_points"],
    }
    return loss, aux


def make_train_step(cfg: Config, spec: nerf_model.NeRFSpec, sampler, mesh=None):
    """Returns jitted (state, key) -> (state, aux). `sampler` is a
    RayDataset-like object whose .sample(key, n) is traceable.  With `mesh`,
    the sampled ray batch is sharded over the 'data' axis (params replicated,
    XLA-inserted grad psum — the TPU equivalent of the reference's DDP,
    nerf/utils.py:761-764)."""
    opt = make_optimizer(cfg)
    # exact span-adaptive candidate lattice (one host-side scan per build)
    n_march = march_candidates_for(cfg, sampler)

    @jax.jit
    def train_step(state: TrainState, key: jax.Array):
        k_batch, k_perturb = jax.random.split(key)
        batch = sampler.sample(k_batch, cfg.num_rays)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(mesh, P("data"))
            batch = jax.tree_util.tree_map(
                lambda x: jax.lax.with_sharding_constraint(x, sh)
                if getattr(x, "ndim", 0) >= 1 and x.shape[0] == cfg.num_rays
                else x,
                batch,
            )

        grads, aux = jax.grad(stage0_loss, has_aux=True)(
            state.params, state.occ.occ, batch, k_perturb, cfg, spec, state.step,
            march_candidates=n_march,
        )
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = jax.tree_util.tree_map(
            lambda e, p: 0.95 * e + 0.05 * p, state.ema_params, params
        )
        return TrainState(params, opt_state, ema, state.occ, state.step + 1), aux

    return train_step


def init_double_sphere(
    params: Any,
    spec: nerf_model.NeRFSpec,
    key: jax.Array,
    r1: float = 0.5,
    r2: float = 1.5,
    iters: int = 2048,
    batch_size: int = 8192,
    lr: float = 1e-3,
) -> Any:
    """SDF pretraining toward two nested spheres (reference
    network.py:196-217 init_double_sphere; cameras sit between the spheres)."""
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, k):
        xyz = jax.random.uniform(k, (batch_size, 3), minval=-spec.bound, maxval=spec.bound)
        d = jnp.linalg.norm(xyz, axis=-1)
        gt = jnp.where(d < (r1 + r2) / 2, d - r1, r2 - d)

        def loss_fn(p):
            pred = nerf_model.density(p, xyz, spec)["sigma"]
            return jnp.mean((pred - gt) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(iters):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
    return params


def make_occ_update(cfg: Config, spec: nerf_model.NeRFSpec):
    @jax.jit
    def occ_update(state: TrainState, key: jax.Array) -> TrainState:
        k_stoch = jax.random.fold_in(key, 777)

        def density_fn(pts):
            sig = nerf_model.density(
                state.params, pts, spec,
                stochastic_key=k_stoch if cfg.stochastic_interp else None,
            )["sigma"]
            if cfg.sdf:
                inv_s = jnp.clip(jnp.exp(state.params["variance"] * 10.0), 1e-6, 1e6)
                sig = jax.nn.sigmoid(-sig * inv_s) * inv_s
            return sig

        occ = update_occupancy(
            state.occ, density_fn, key, cfg.bound, cfg.density_thresh
        )
        return state._replace(occ=occ)

    return occ_update


def make_render_fn(cfg: Config, spec: nerf_model.NeRFSpec, use_ema: bool = True):
    """Jitted full-frame renderer for eval (chunked by caller)."""

    @jax.jit
    def render_chunk(state: TrainState, rays_o, rays_d):
        params = state.ema_params if use_ema else state.params
        out = render_rays(
            params, state.occ.occ, rays_o, rays_d, spec, _aabb(cfg),
            K=cfg.samples_per_ray_infer, max_steps=cfg.max_steps,
            dt_gamma=cfg.dt_gamma, min_near=cfg.min_near, contract=cfg.contract,
            # bound the hash-encode gather buffer on TPU (see render_rays
            # _maybe_chunked): full 8192x96-point eval chunks OOM HBM
            field_chunk=65536,
        )
        return out["image"], out["depth"], out["weights_sum"]

    return render_chunk


def render_frame(state, render_chunk, rays_o, rays_d, H: int, W: int, chunk: int = 8192):
    """Host-side chunked frame render -> (image [H,W,3], depth [H,W])."""
    import numpy as np

    n = rays_o.shape[0]
    imgs, deps = [], []
    pad = (-n) % chunk
    ro = jnp.pad(rays_o, ((0, pad), (0, 0)))
    rd = jnp.pad(rays_d, ((0, pad), (0, 0)))
    for s in range(0, n + pad, chunk):
        img, dep, _ = render_chunk(state, ro[s : s + chunk], rd[s : s + chunk])
        imgs.append(np.asarray(img))
        deps.append(np.asarray(dep))
    image = np.concatenate(imgs)[:n].reshape(H, W, 3)
    depth = np.concatenate(deps)[:n].reshape(H, W)
    return image, depth
