"""Stage-1 trainer: joint mesh / material / environment optimization.

Re-implements the reference Trainer's stage-1 machinery
(`nerf/utils.py:778-829, 1002-1136, 1567-1589`):
  - three optimizer groups as one optax.multi_transform:
      net   : radiance field, Adam(eps=1e-15), lr warmup+exp decay
      vert  : vertex offsets, same schedule at lr_vert
      mat   : material field, Adam, lr 0.03 * 10^(-2e-4 * iter) falloff
      light : envmap, Adam, same falloff at lr 0.09
  - the reference's grad hacks (light grads x64, material-encoder grads /8,
    utils.py:1578-1579) are reproduced as gradient-transform prescaling
  - envmap clamped to >= 0.01 after each update (utils.py:1587-1589)
  - loss assembly: nerf-rgb MSE + brdf L1 + mask + monochrome shading +
    material smoothness + laplacian / normal-consistency / edge / offsets.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..models import envlight, material as material_mod
from ..models import nerf as nerf_model
from ..render.stage1 import Stage1Params, Stage1Static, act_voffsets, render_stage1
from . import losses as L
from .stage0 import lr_schedule


class Stage1State(NamedTuple):
    params: Stage1Params
    opt_state: Any
    step: jnp.ndarray


def brdf_lr_falloff(step):
    """10^(-2e-4 * iter): 1.0 -> 0.1 over 5k iters (utils.py:820-824)."""
    return jnp.maximum(0.0, 10.0 ** (-(step) * 2e-4))


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    sched = lr_schedule(cfg)

    def adam(lr_fn, eps=1e-15, pre_scale=1.0):
        chain = []
        if pre_scale != 1.0:
            chain.append(optax.scale(pre_scale))
        chain += [
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=eps),
            optax.scale_by_schedule(lambda s: -lr_fn(s)),
        ]
        return optax.chain(*chain)

    transforms = {
        "net": adam(lambda s: cfg.lr * sched(s)),
        "vert": adam(lambda s: cfg.lr_vert * sched(s)),
        "mat": adam(lambda s: cfg.learning_rate_mat * brdf_lr_falloff(s), eps=1e-8),
        # encoder grads /= 8 in the reference; fold into pre-scale
        "mat_enc": adam(
            lambda s: cfg.learning_rate_mat * brdf_lr_falloff(s), eps=1e-8, pre_scale=1.0 / 8.0
        ),
        # light grads *= 64
        "light": adam(
            lambda s: cfg.learning_rate_lgt * brdf_lr_falloff(s), eps=1e-8, pre_scale=64.0
        ),
    }

    def label_fn(params: Stage1Params):
        return Stage1Params(
            nerf=jax.tree_util.tree_map(lambda _: "net", params.nerf),
            offsets="vert",
            mat={
                "encoder": "mat_enc",
                "net": jax.tree_util.tree_map(lambda _: "mat", params.mat["net"]),
            },
            env="light",
        )

    return optax.multi_transform(transforms, label_fn)


def init_state(
    key: jax.Array,
    cfg: Config,
    static: Stage1Static,
    nerf_params: Any,
    num_verts: int,
) -> Stage1State:
    k_mat = jax.random.fold_in(key, 1)
    params = Stage1Params(
        nerf=nerf_params,
        offsets=jnp.zeros((num_verts, 3), jnp.float32),
        mat=material_mod.init_material(k_mat, static.mat_spec),
        env=envlight.init_envlight(cfg.env_h, cfg.env_w),
    )
    opt = make_optimizer(cfg)
    return Stage1State(params=params, opt_state=opt.init(params), step=jnp.zeros((), jnp.int32))


def stage1_loss(
    params: Stage1Params,
    static: Stage1Static,
    base_verts: jnp.ndarray,
    topo: L.MeshTopology,
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    cfg: Config,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    out = render_stage1(params, static, base_verts, batch["rays_o"], batch["rays_d"], key)

    # SSAA: render_stage1 ran at (H*s, W*s); box-downsample the image buffers
    # to the GT resolution (reference renderer.py:1264-1290 SSAA downscale)
    s = static.ssaa if static.ssaa > 1 and static.H > 0 else 1
    if s > 1:
        Hs, Ws = static.H // s, static.W // s

        def down(x):
            c = x.shape[-1] if x.ndim == 2 else 1
            return x.reshape(Hs, s, Ws, s, -1).mean(axis=(1, 3)).reshape(Hs * Ws, -1)

        for k in ("image", "image_brdf", "diffuse_light", "specular_light",
                  "img_brdf_indirect"):
            out[k] = down(out[k])
        out["weights_sum"] = down(out["weights_sum"][:, None])[:, 0]

    gt = batch["pixels"]
    gt_linear = batch.get("pixels_linear", gt)
    loss = cfg.lambda_rgb * jnp.mean((out["image"] - gt) ** 2)

    if cfg.use_brdf:
        loss = loss + cfg.lambda_rgb_brdf * jnp.mean(jnp.abs(out["image_brdf"] - gt))

    if cfg.lambda_mask > 0 and "alpha" in batch:
        loss = loss + cfg.lambda_mask * jnp.mean((out["weights_sum"] - batch["alpha"]) ** 2)

    if cfg.lambda_lpips > 0 and static.H > 0:
        # perceptual loss on the full frame for nerf AND brdf images
        # (reference utils.py:1079-1082)
        from .lpips import _default_params_cached, lpips_distance

        lp_params, _ = _default_params_cached(cfg.lpips_weights)
        Hs, Ws = static.H // s, static.W // s
        gt_img = gt.reshape(Hs, Ws, 3)
        loss = loss + cfg.lambda_lpips * lpips_distance(
            lp_params, out["image"].reshape(Hs, Ws, 3), gt_img
        )
        if cfg.use_brdf:
            loss = loss + cfg.lambda_lpips * lpips_distance(
                lp_params, out["image_brdf"].reshape(Hs, Ws, 3), gt_img
            )

    if cfg.use_brdf:
        loss = loss + L.shading_loss(
            out["diffuse_light"], out["specular_light"],
            gt_linear - out["img_brdf_indirect"],
            cfg.lambda_brdf_diffuse, cfg.lambda_brdf_specular,
        )
        loss = loss + L.material_smoothness_grad(
            out["kd_grad"], out["ks_grad"], out["normal_grad"],
            cfg.lambda_kd, cfg.lambda_ks, cfg.lambda_nrm,
        )
        if cfg.lambda_extra_kd > 0 and "normal_ao" in out:
            # AO-weighted albedo smoothness (reference utils.py:284-288
            # material_extra_kd_smoothness_grad at :1073-1074)
            kd_luma = jnp.mean(out["kd_grad"], axis=-1)
            loss = loss + cfg.lambda_extra_kd * jnp.mean(kd_luma * out["normal_ao"])
        if cfg.lambda_chroma > 0:
            loss = loss + L.chroma_loss(out["kd"], gt, cfg.lambda_chroma)

    verts = base_verts + act_voffsets(params.offsets)
    if cfg.lambda_lap > 0:
        loss = loss + cfg.lambda_lap * L.laplacian_smooth_loss(verts, topo)
    if cfg.lambda_normal > 0:
        loss = loss + cfg.lambda_normal * L.normal_consistency_loss(
            verts, jnp.asarray(static.tris), topo
        )
    if cfg.lambda_edgelen > 0:
        loss = loss + cfg.lambda_edgelen * L.edge_length_loss(verts, topo)
    if cfg.lambda_offsets > 0:
        loss = loss + cfg.lambda_offsets * L.offsets_loss(act_voffsets(params.offsets))

    # per-face error accumulation for the refine hook (reference
    # renderer.py:1376-1396 update_triangles_errors)
    n_faces = int(static.tris.shape[0])
    pix_err = jax.lax.stop_gradient(jnp.mean(jnp.abs(out["image"] - gt), axis=-1))
    if s > 1:
        # broadcast the per-(downsampled)-pixel error back to the
        # supersampled lattice where face ids live
        Hs, Ws = static.H // s, static.W // s
        pix_err = jnp.repeat(jnp.repeat(pix_err.reshape(Hs, Ws), s, 0), s, 1).reshape(-1)
    fid = jnp.where(out["mask"], out["face_id"], n_faces)  # drop misses
    face_err = jax.ops.segment_sum(
        jnp.where(out["mask"], pix_err, 0.0), fid, num_segments=n_faces + 1
    )[:n_faces]
    face_cnt = jax.ops.segment_sum(
        out["mask"].astype(jnp.float32), fid, num_segments=n_faces + 1
    )[:n_faces]

    aux = {
        "loss": loss,
        "uncertain_count": out["uncertain_count"],
        "psnr": -10.0 * jnp.log10(jnp.maximum(jnp.mean((out["image"] - gt) ** 2), 1e-12)),
        "psnr_brdf": -10.0
        * jnp.log10(jnp.maximum(jnp.mean((out["image_brdf"] - gt) ** 2), 1e-12)),
        "face_err": face_err,
        "face_cnt": face_cnt,
    }
    return loss, aux


def make_train_step(cfg: Config, static: Stage1Static, base_verts, topo: L.MeshTopology,
                    mesh=None):
    """With `mesh`, the pixel batch is sharded over the 'data' axis; params
    replicated; XLA inserts the grad psum and the halo collectives for the
    image-space passes (spatial reuse, denoise)."""
    opt = make_optimizer(cfg)
    bv = jnp.asarray(base_verts)

    @jax.jit
    def train_step(state: Stage1State, batch: Dict[str, jnp.ndarray], key: jax.Array):
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(mesh, P("data"))
            batch = jax.tree_util.tree_map(
                lambda x: jax.lax.with_sharding_constraint(x, sh)
                if getattr(x, "ndim", 0) >= 1
                else x,
                batch,
            )
        grads, aux = jax.grad(stage1_loss, has_aux=True)(
            state.params, static, bv, topo, batch, key, cfg
        )
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # envmap clamp (reference utils.py:1587-1589)
        params = params._replace(env=jnp.clip(params.env, 0.01, None))
        return Stage1State(params, opt_state, state.step + 1), aux

    return train_step
