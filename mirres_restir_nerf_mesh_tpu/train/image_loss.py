"""Image-space loss library: SMAPE / MSE / RelMSE with log / tonemap
transforms (counterpart of reference `nerf/renderutils/c_src/loss.cu:105-227`,
compiled but unused upstream; provided here as jittable functions)."""

from __future__ import annotations

import jax.numpy as jnp


def _tonemap_srgb(x):
    return jnp.where(x <= 0.0031308, 12.92 * x, 1.055 * jnp.maximum(x, 1e-8) ** (1 / 2.4) - 0.055)


def _transform(x, mode: str):
    if mode == "log":
        return jnp.log(jnp.clip(x, 0.0, 65535.0) + 1.0)
    if mode == "tonemap":
        return _tonemap_srgb(jnp.clip(x, 0.0, 65535.0))
    return x


def image_loss(img: jnp.ndarray, ref: jnp.ndarray, loss: str = "l1",
               transform: str = "none") -> jnp.ndarray:
    """loss in {l1, mse, smape, relmse}, transform in {none, log, tonemap}."""
    a = _transform(img, transform)
    b = _transform(ref, transform)
    if loss == "mse":
        return jnp.mean((a - b) ** 2)
    if loss == "smape":
        return jnp.mean(jnp.abs(a - b) / (jnp.abs(a) + jnp.abs(b) + 0.01))
    if loss == "relmse":
        return jnp.mean((a - b) ** 2 / (b * b + 0.01))
    return jnp.mean(jnp.abs(a - b))


def mape_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """MAPE (reference loss.py:7-16)."""
    return jnp.mean(jnp.abs(pred - target) / (jnp.abs(target) + 1e-2))


def huber_loss(pred: jnp.ndarray, target: jnp.ndarray, delta: float = 0.1) -> jnp.ndarray:
    """Huber (reference loss.py:18-26)."""
    d = jnp.abs(pred - target)
    return jnp.mean(jnp.where(d <= delta, 0.5 * d * d / delta, d - 0.5 * delta))
