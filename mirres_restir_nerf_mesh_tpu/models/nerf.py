"""Instant-NGP-style radiance field (hash-grid + tiny MLPs), functional JAX.

Re-implements the reference `nerf/network.py:59-301` NeRFNetwork as pure
functions over a params pytree:
  sigma path: hashgrid(16 levels x 2ch, ->2048*bound) -> 2x64 MLP (no bias)
              -> trunc_exp(sigma), 15-dim geo features
  color path: SH(deg 4) dir encoding ++ geo_feat -> 3x64 MLP (no bias) -> sigmoid
  sdf mode:   sigma head is an SDF value; extra `variance` scalar parameter.

MLPs run in bfloat16 on the MXU when compute_dtype=bfloat16 (the TPU analog
of the reference's AMP fp16 autocast); params stay float32.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.hashgrid import HashGridSpec, hashgrid_encode, init_hashgrid
from ..ops.sh import sh_encode
from ..utils.math import safe_normalize, trunc_exp


@dataclass(frozen=True)
class NeRFSpec:
    bound: float = 1.0
    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    sh_degree: int = 4
    sdf: bool = False
    compute_dtype: Any = jnp.float32
    # hash-grid knobs (reference defaults: 16L x 2ch, 2^19 table, 16->2048*bound)
    grid_levels: int = 16
    grid_log2_hashmap_size: int = 19
    grid_base_resolution: int = 16
    grid_desired_resolution: int = 0   # 0 -> 2048 * bound

    @property
    def grid(self) -> HashGridSpec:
        return HashGridSpec(
            num_levels=self.grid_levels,
            level_dim=2,
            base_resolution=self.grid_base_resolution,
            log2_hashmap_size=self.grid_log2_hashmap_size,
            desired_resolution=self.grid_desired_resolution or int(2048 * self.bound),
            interpolation="linear",
        )


def _init_linear(key: jax.Array, d_in: int, d_out: int) -> jnp.ndarray:
    """Kaiming-uniform like torch.nn.Linear default: U(-1/sqrt(in), 1/sqrt(in))."""
    lim = 1.0 / jnp.sqrt(d_in)
    return jax.random.uniform(key, (d_in, d_out), minval=-lim, maxval=lim, dtype=jnp.float32)


def init_nerf(key: jax.Array, spec: NeRFSpec) -> Dict[str, Any]:
    keys = jax.random.split(key, 8)
    grid = spec.grid
    in_dim = grid.output_dim
    in_dim_dir = spec.sh_degree ** 2

    sigma_net = []
    d = in_dim
    for l in range(spec.num_layers):
        d_out = (1 + spec.geo_feat_dim) if l == spec.num_layers - 1 else spec.hidden_dim
        sigma_net.append(_init_linear(keys[1 + l], d, d_out))
        d = d_out

    color_net = []
    d = in_dim_dir + spec.geo_feat_dim
    for l in range(spec.num_layers_color):
        d_out = 3 if l == spec.num_layers_color - 1 else spec.hidden_dim_color
        color_net.append(_init_linear(keys[4 + l], d, d_out))
        d = d_out

    params = {
        "encoder": init_hashgrid(keys[0], grid),
        "sigma_net": sigma_net,
        "color_net": color_net,
    }
    if spec.sdf:
        params["variance"] = jnp.asarray(0.3, jnp.float32)
    return params


def _mlp(ws, h, dtype):
    h = h.astype(dtype)
    for l, w in enumerate(ws):
        h = h @ w.astype(dtype)
        if l != len(ws) - 1:
            h = jax.nn.relu(h)
    return h.astype(jnp.float32)


def density(params: Dict[str, Any], x: jnp.ndarray, spec: NeRFSpec,
            max_level: Optional[jnp.ndarray] = None,
            stochastic_key: Optional[jax.Array] = None) -> Dict[str, jnp.ndarray]:
    """x: [N,3] in [-bound, bound] -> {'sigma': [N], 'geo_feat': [N,15]}.

    In sdf mode, 'sigma' is the raw SDF value (reference network.py:177-193).
    stochastic_key enables the unbiased one-corner hash-grid estimator
    (training fast path on TPU).
    """
    h = hashgrid_encode(params["encoder"], x, spec.grid, bound=spec.bound,
                        max_level=max_level, stochastic_key=stochastic_key)
    h = _mlp(params["sigma_net"], h, spec.compute_dtype)
    raw = h[..., 0]
    sigma = raw if spec.sdf else trunc_exp(raw)
    return {"sigma": sigma, "geo_feat": h[..., 1:]}


def color(params: Dict[str, Any], geo_feat: jnp.ndarray, d: jnp.ndarray, spec: NeRFSpec) -> jnp.ndarray:
    """Direction-conditioned color head. d must be normalized. -> [N,3] in [0,1]."""
    de = sh_encode(d, spec.sh_degree)
    h = jnp.concatenate([de, geo_feat], axis=-1)
    h = _mlp(params["color_net"], h, spec.compute_dtype)
    return jax.nn.sigmoid(h)


def forward(params: Dict[str, Any], x: jnp.ndarray, d: jnp.ndarray, spec: NeRFSpec,
            max_level: Optional[jnp.ndarray] = None,
            stochastic_key: Optional[jax.Array] = None):
    """Full field eval: sigma [N], rgb [N,3] (reference network.py:146-174)."""
    res = density(params, x, spec, max_level=max_level, stochastic_key=stochastic_key)
    rgb = color(params, res["geo_feat"], d, spec)
    return res["sigma"], rgb


def rgb_only(params: Dict[str, Any], x: jnp.ndarray, d: jnp.ndarray, spec: NeRFSpec) -> jnp.ndarray:
    """Color query without sigma (reference network.py:rgb, used by stage 1)."""
    res = density(params, x, spec)
    return color(params, res["geo_feat"], d, spec)


def normal_fd(params: Dict[str, Any], x: jnp.ndarray, spec: NeRFSpec, epsilon: float = 1e-4) -> jnp.ndarray:
    """Finite-difference density/SDF gradient (reference network.py:221-241)."""
    def sig(p):
        return density(params, jnp.clip(p, -spec.bound, spec.bound), spec)["sigma"]

    grads = []
    for ax in range(3):
        e = jnp.zeros((1, 3)).at[0, ax].set(epsilon)
        grads.append(0.5 * (sig(x + e) - sig(x - e)) / epsilon)
    return jnp.stack(grads, axis=-1)


def normal_autodiff(params: Dict[str, Any], x: jnp.ndarray, spec: NeRFSpec) -> jnp.ndarray:
    """Autodiff spatial gradient of sigma/SDF wrt position."""
    def sig_sum(p):
        return jnp.sum(density(params, p, spec)["sigma"])

    return jax.grad(sig_sum)(x)


def neus_alpha(
    sdf: jnp.ndarray,
    variance: jnp.ndarray,
    normal: jnp.ndarray,
    dirs: jnp.ndarray,
    dts: jnp.ndarray,
    cos_anneal_ratio: float = 1.0,
) -> jnp.ndarray:
    """NeuS SDF->alpha conversion (reference renderer.py:750-765)."""
    inv_s = jnp.clip(jnp.exp(variance * 10.0), 1e-6, 1e6)
    n = safe_normalize(normal)
    true_cos = jnp.sum(dirs * n, axis=-1)
    iter_cos = -(
        jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - cos_anneal_ratio)
        + jax.nn.relu(-true_cos) * cos_anneal_ratio
    )
    prev_sdf = sdf - iter_cos * dts * 0.5
    next_sdf = sdf + iter_cos * dts * 0.5
    prev_cdf = jax.nn.sigmoid(prev_sdf * inv_s)
    next_cdf = jax.nn.sigmoid(next_sdf * inv_s)
    p = prev_cdf - next_cdf
    c = prev_cdf
    return jnp.clip((p + 1e-5) / (c + 1e-5), 0.0, 1.0)
