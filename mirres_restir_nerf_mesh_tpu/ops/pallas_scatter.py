"""Pallas TPU kernel: scatter-add via one-hot matmul on the MXU.

XLA's scatter-add costs ~50 ns per update row on TPU (serialized random
writes), which makes the hash-grid backward the dominant stage-0 cost. This
kernel reformulates the accumulation as dense matmuls:

  table index -> (row = idx // 128, lane = idx % 128)
  dTab[r, c*128 + l] = sum_n  onehot(row_n)[r] * onehot(lane_n)[l] * upd[n, c]
                     = (A^T @ B)[r, c*128 + l]
  A [Nc, R]   = one-hot rows       (bf16, built by iota compare on the VPU)
  B [Nc, C*128] = per-channel blocks of the lane one-hot scaled by upd[:, c]
  (the caller's reshape(R, C, LANES).transpose(0, 2, 1) undoes this layout)

Each grid step processes one chunk of updates and accumulates into the same
VMEM output block (init at step 0); the MXU does the heavy lifting instead of
serialized memory transactions.  Used as the custom backward of the hash-grid
table gather (see hashgrid.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NC = 512        # updates per grid step
LANES = 128


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _kernel(idx_ref, upd_ref, out_ref, *, R: int, C: int):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        out_ref[:, :] = jnp.zeros((R, LANES * C), jnp.float32)

    idx = idx_ref[0, :]                      # [NC] int32 (-1 = padding)
    # fold validity into an out-of-range row id: padding rows one-hot to zero
    row = jnp.where(idx >= 0, idx // LANES, R)
    lane = jnp.where(idx >= 0, idx % LANES, 0)

    # A [NC, R] one-hot rows (bf16 for the MXU)
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (NC, R), 1)
    A = (r_iota == row[:, None]).astype(jnp.bfloat16)

    # B [NC, 128*C]: per channel block, lane one-hot scaled by update value
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (NC, LANES), 1)
    lane_oh = (l_iota == lane[:, None]).astype(jnp.float32)
    bs = []
    for c in range(C):
        bs.append(lane_oh * upd_ref[:, c][:, None])
    B = jnp.concatenate(bs, axis=1).astype(jnp.bfloat16)  # [NC, 128*C]

    out_ref[:, :] += jax.lax.dot_general(
        A, B, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("table_rows", "channels"))
def pallas_scatter_add(idx: jnp.ndarray, upd: jnp.ndarray, table_rows: int,
                       channels: int) -> jnp.ndarray:
    """idx [M] int32 in [0, table_rows), upd [M, C] -> accumulated [table_rows, C]."""
    M = idx.shape[0]
    C = channels
    pad_m = (-M) % NC
    idx_p = jnp.concatenate([idx.astype(jnp.int32), jnp.full((pad_m,), -1, jnp.int32)])
    upd_p = jnp.concatenate([upd.astype(jnp.float32), jnp.zeros((pad_m, C))])
    Mp = M + pad_m

    R = -(-table_rows // LANES)  # ceil
    out = pl.pallas_call(
        functools.partial(_kernel, R=R, C=C),
        grid=(Mp // NC,),
        in_specs=[
            pl.BlockSpec((1, NC), lambda s: (0, s), memory_space=pltpu.VMEM),
            pl.BlockSpec((NC, C), lambda s: (s, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, LANES * C), lambda s: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, LANES * C), jnp.float32),
        interpret=_interpret(),
    )(idx_p.reshape(1, Mp), upd_p)

    # [R, 128*C] -> [R*128, C] -> [table_rows, C]
    out = out.reshape(R, C, LANES).transpose(0, 2, 1).reshape(R * LANES, C)
    return out[:table_rows]
