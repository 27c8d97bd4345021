"""Neural 3D material texture (kd rgb + roughness/metallic), functional JAX.

Re-implements the reference MLPTexture3D (`nerf/render_helper.py:53-124`):
hash grid (16 levels x 2ch, base 16 -> 4096, 2^19 table) -> 2-layer/32-hidden
MLP -> sigmoid -> min_max remap to [kd_min..kd_max, ks_min..ks_max].
Channel layout: [kd.r, kd.g, kd.b, ks.occ(unused), roughness, metallic].

The reference's x128 gradient-scaling trick is a tcnn fp16 artifact and is
not needed (params and grads stay fp32 here).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.hashgrid import HashGridSpec, hashgrid_encode, init_hashgrid


@dataclass(frozen=True)
class MaterialSpec:
    bound: float = 1.0
    channels: int = 6
    hidden: int = 32
    min_vals: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0, 0.08, 0.0)
    max_vals: Tuple[float, ...] = (1.0, 1.0, 1.0, 0.0, 1.0, 0.0)
    compute_dtype: Any = jnp.float32

    @property
    def grid(self) -> HashGridSpec:
        # reference: tcnn HashGrid n_levels=16, 2ch, 2^19, base 16,
        # per_level_scale from desired resolution 4096 (render_helper.py:62-70)
        return HashGridSpec(
            num_levels=16,
            level_dim=2,
            base_resolution=16,
            log2_hashmap_size=19,
            desired_resolution=int(4096 * self.bound),
        )


def init_material(key: jax.Array, spec: MaterialSpec) -> Dict[str, Any]:
    k0, k1, k2 = jax.random.split(key, 3)
    in_dim = spec.grid.output_dim

    def lin(k, i, o):
        lim = 1.0 / jnp.sqrt(i)
        return jax.random.uniform(k, (i, o), minval=-lim, maxval=lim, dtype=jnp.float32)

    return {
        "encoder": init_hashgrid(k0, spec.grid),
        "net": [lin(k1, in_dim, spec.hidden), lin(k2, spec.hidden, spec.channels)],
    }


def sample_material(params: Dict[str, Any], x: jnp.ndarray, spec: MaterialSpec,
                    stochastic_key=None) -> jnp.ndarray:
    """x [N,3] in [-bound, bound] -> material [N, 6] in [min, max].

    stochastic_key: use the unbiased one-corner hash-grid estimator (8x fewer
    gathers).  Right for Monte-Carlo consumers (bounce-hit material re-query,
    reference mlp_mat.sample_no_di) where the variance folds into the path
    noise; keep None for the differentiable primary-hit query."""
    h = hashgrid_encode(params["encoder"], x, spec.grid, bound=spec.bound,
                        stochastic_key=stochastic_key)
    dtype = spec.compute_dtype
    h = h.astype(dtype)
    h = jax.nn.relu(h @ params["net"][0].astype(dtype))
    h = (h @ params["net"][1].astype(dtype)).astype(jnp.float32)
    s = jax.nn.sigmoid(h)
    mn = jnp.asarray(spec.min_vals, jnp.float32)
    mx = jnp.asarray(spec.max_vals, jnp.float32)
    return mn + (mx - mn) * s


def split_material(mat: jnp.ndarray):
    """-> (kd [N,3], roughness [N], metallic [N]). Matches the reference's
    use of channels 0:3 kd, 4 roughness, 5 metallic (ks layout
    [occ, roughness, metallic], renderer.py:1017-1060)."""
    return mat[..., 0:3], mat[..., 4], mat[..., 5]
