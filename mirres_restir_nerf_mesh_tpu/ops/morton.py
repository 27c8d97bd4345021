"""Morton (Z-order) encode/decode for the occupancy grid, pure JAX.

Reference: `raymarching/src/raymarching.cu:214-264` (kernel_morton3D /
kernel_morton3D_invert).  The TPU framework stores the occupancy grid in
plain row-major layout (gather-friendlier than Morton on TPU), but Morton
codes are still needed for LBVH construction and kept API-compatible here.
"""

from __future__ import annotations

import jax.numpy as jnp


def _expand_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of v out to every third bit (uint32)."""
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3d(coords: jnp.ndarray) -> jnp.ndarray:
    """coords: [..., 3] int in [0, 1024) -> [...] uint32 morton codes."""
    c = coords.astype(jnp.uint32)
    return (
        _expand_bits(c[..., 0])
        | (_expand_bits(c[..., 1]) << jnp.uint32(1))
        | (_expand_bits(c[..., 2]) << jnp.uint32(2))
    )


def _compact_bits(v: jnp.ndarray) -> jnp.ndarray:
    v = v & jnp.uint32(0x49249249)
    v = (v | (v >> jnp.uint32(2))) & jnp.uint32(0xC30C30C3)
    v = (v | (v >> jnp.uint32(4))) & jnp.uint32(0x0F00F00F)
    v = (v | (v >> jnp.uint32(8))) & jnp.uint32(0xFF0000FF)
    v = (v | (v >> jnp.uint32(16))) & jnp.uint32(0x000003FF)
    return v


def morton3d_invert(codes: jnp.ndarray) -> jnp.ndarray:
    """codes: [...] uint32 -> [..., 3] int32 grid coords."""
    c = codes.astype(jnp.uint32)
    x = _compact_bits(c)
    y = _compact_bits(c >> jnp.uint32(1))
    z = _compact_bits(c >> jnp.uint32(2))
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int32)
