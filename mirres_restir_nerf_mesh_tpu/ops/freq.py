"""Frequency (sin/cos positional) encoder, pure JAX.

Reference: `freqencoder/src/freqencoder.cu:30-128` — output layout is
[x, sin(2^0 x), cos(2^0 x), ..., sin(2^{L-1} x), cos(2^{L-1} x)] per input dim.
"""

from __future__ import annotations

import jax.numpy as jnp


def freq_encode(x: jnp.ndarray, degree: int = 12) -> jnp.ndarray:
    """x: [..., D] -> [..., D * (1 + 2*degree)]."""
    outs = [x]
    for i in range(degree):
        s = x * (2.0 ** i)
        outs.append(jnp.sin(s))
        outs.append(jnp.cos(s))
    return jnp.concatenate(outs, axis=-1)
