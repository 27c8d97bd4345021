"""Small math helpers shared across the framework (pure JAX)."""

from __future__ import annotations

import jax.numpy as jnp


def safe_normalize(x: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    """Normalize along the last axis, guarding the zero vector."""
    return x / jnp.sqrt(jnp.maximum(jnp.sum(x * x, axis=-1, keepdims=True), eps))


def dot(a: jnp.ndarray, b: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def length(x: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    return jnp.sqrt(jnp.maximum(jnp.sum(x * x, axis=-1, keepdims=True), eps))


def reflect(d: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Reflect direction d about normal n (both [..,3])."""
    return d - 2.0 * dot(d, n) * n


def srgb_to_linear(x: jnp.ndarray) -> jnp.ndarray:
    """sRGB EOTF (reference nerf/utils.py srgb helpers)."""
    return jnp.where(x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(x: jnp.ndarray) -> jnp.ndarray:
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(x <= 0.0031308, 12.92 * x, 1.055 * (jnp.maximum(x, 1e-8) ** (1.0 / 2.4)) - 0.055)


def luminance(rgb: jnp.ndarray) -> jnp.ndarray:
    """Rec.709 luminance, as used for ReSTIR target functions."""
    return rgb[..., 0] * 0.2126 + rgb[..., 1] * 0.7152 + rgb[..., 2] * 0.0722


import jax as _jax


@_jax.custom_vjp
def trunc_exp(x):
    """exp whose gradient is computed from the clamped input
    (reference activation.py trunc_exp): avoids density-gradient explosion."""
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


def onb_frame(n: jnp.ndarray):
    """Build an orthonormal basis (t, b, n) around normal n, branchlessly
    (Frisvad/Duff revised; reference utils/helper.slang Frame)."""
    s = jnp.where(n[..., 2:3] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2:3])
    b = n[..., 0:1] * n[..., 1:2] * a
    t = jnp.stack(
        [1.0 + s[..., 0] * n[..., 0] * n[..., 0] * a[..., 0], s[..., 0] * b[..., 0], -s[..., 0] * n[..., 0]],
        axis=-1,
    )
    bt = jnp.stack(
        [b[..., 0], s[..., 0] + n[..., 1] * n[..., 1] * a[..., 0], -n[..., 1]],
        axis=-1,
    )
    return t, bt, n
