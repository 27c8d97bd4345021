"""Live-lane compaction for per-pixel field queries.

The reference's CUDA/Slang kernels early-out on uncovered pixels
(`occ_map == 0` guards at the top of every per-pixel kernel, e.g.
FinalShading.slang:121-136) — idle CUDA threads are nearly free.  On TPU
the equivalent waste is real: random table-row gathers are latency-priced
per row whether or not the row is needed, and duplicate/dead indices do
NOT coalesce (measured, CLAUDE.md cost model).  A hash-grid encode over a
65k-pixel G-buffer at 17% coverage pays 83% of its ~30 ms for masked
lanes.

`masked_apply` is the TPU-idiomatic early-out: stable-sort live lanes to
the front (lax.sort_key_val, ~1 ms at 65k and preserves the pixel-order
coherence of the live block), slice the permuted batch into `chunks`
equal static chunks, and run the payload under `lax.cond` per chunk —
chunks past the live count execute only a constant fill.  XLA:TPU compiles
`cond` to a real branch, so skipped chunks cost nothing; the count of
executed chunks adapts to scene coverage at run time with zero
recompilation.  Exactness: lanes in executed chunks (live or not) get the
same values as the uncompacted call; lanes in skipped chunks are dead by
construction and get `fill`.  Differentiable: cond's VJP conds the
backward, so skipped chunks also skip their gradient scatter-adds.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def live_first_permutation(mask: jnp.ndarray):
    """Stable live-first permutation of a [P] bool mask.

    Returns (perm, inv_perm, live): `x[perm]` orders live lanes first
    (pixel order preserved within each class), `inv_perm` undoes it,
    `live` is the traced live count used to gate chunk execution."""
    P = mask.shape[0]
    order = jnp.where(mask, 0, 1).astype(jnp.int32)
    iota = jnp.arange(P, dtype=jnp.int32)
    _, perm = jax.lax.sort_key_val(order, iota)
    _, inv_perm = jax.lax.sort_key_val(perm, iota)
    return perm, inv_perm, jnp.sum(mask.astype(jnp.int32))


def chunked_tree(live: jnp.ndarray, chunks: int, csz: int, run_fn: Callable):
    """Chunked lax.cond execution for payloads with pytree outputs.

    run_fn(c) computes chunk c (rows [c*csz, (c+1)*csz) of a live-first
    permuted domain) and returns a pytree whose leaves share a leading
    chunk axis.  Chunks whose start lies past `live` return zeros without
    executing (lax.cond compiles to a real branch on TPU).  Leaves are
    concatenated along axis 0.  Used for the ReSTIR spp chain, whose
    reservoir carry makes the simpler masked_apply shape unusable."""
    outs = []
    for c in range(chunks):
        run = lambda c=c: run_fn(c)

        def skip(run=run):
            shapes = jax.eval_shape(run)
            return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

        outs.append(jax.lax.cond(live > c * csz, run, skip))
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)


def pack_cols(args: Sequence[jnp.ndarray]):
    """Pack [P, ...] arrays into ONE [P, C] float32 carrier + specs so a
    permutation costs ONE row gather instead of len(args) gathers — random
    row gathers are latency-priced per ROW regardless of width (CLAUDE.md
    cost model), so N separate `a[perm]` gathers cost N x rows while the
    packed form costs 1 x rows.  int/bool columns ride as bitcast/cast f32
    under stop_gradient (they carry no tangents; gathers and concats are
    pure data movement, so the bit patterns survive untouched).  bf16/f16
    upcast exactly."""
    specs, cols = [], []
    for a in args:
        a2 = a.reshape(a.shape[0], -1)
        dt = a.dtype
        if dt == jnp.bool_:
            c = jax.lax.stop_gradient(a2.astype(jnp.float32))
        elif jnp.issubdtype(dt, jnp.integer):
            c = jax.lax.stop_gradient(
                jax.lax.bitcast_convert_type(a2.astype(jnp.int32), jnp.float32)
            )
        elif dt == jnp.float32:
            c = a2
        else:
            c = a2.astype(jnp.float32)
        specs.append((dt, a.shape[1:], a2.shape[1]))
        cols.append(c)
    return jnp.concatenate(cols, axis=1), specs


def unpack_cols(packed: jnp.ndarray, specs):
    """Inverse of pack_cols on (a row subset of) the carrier."""
    out, col = [], 0
    for dt, shp, w in specs:
        c = packed[:, col:col + w]
        col += w
        if dt == jnp.bool_:
            a = c > 0.5
        elif jnp.issubdtype(dt, jnp.integer):
            a = jax.lax.bitcast_convert_type(c, jnp.int32).astype(dt)
        elif dt == jnp.float32:
            a = c
        else:
            a = c.astype(dt)
        out.append(a.reshape((c.shape[0],) + shp))
    return out


def masked_apply(
    fn: Callable,
    mask: jnp.ndarray,
    args: Sequence[jnp.ndarray],
    fills: Sequence[float],
    chunks: int = 4,
    key=None,
):
    """Apply a rowwise `fn(*args) -> (out1, ..., outk)` only where needed.

    fn must be rowwise-independent (row i of each output depends only on
    row i of each arg) and shape-polymorphic in the leading axis.  args are
    [P, ...] arrays (trailing dims arbitrary); outputs are [P, C_j] (2-D).
    fills: per-output constant for never-executed lanes — choose values
    that keep downstream masked math NaN-free (e.g. 0.5 for pre-activation
    material outputs).  chunks=1 disables compaction (plain fn call).

    key: optional PRNG key for Monte-Carlo payloads — fn is then called as
    fn(chunk_key, *chunk_args) with an independent key per chunk.  Chunked
    results are statistically equivalent (NOT bitwise equal) to the
    uncompacted call: lanes draw different but equally-distributed randoms.
    """
    P = mask.shape[0]
    if chunks <= 1 or P % chunks != 0:
        return fn(*args) if key is None else fn(key, *args)

    csz = P // chunks
    order = jnp.where(mask, 0, 1).astype(jnp.int32)
    iota = jnp.arange(P, dtype=jnp.int32)
    _, perm = jax.lax.sort_key_val(order, iota)          # stable: live first
    _, inv_perm = jax.lax.sort_key_val(perm, iota)
    live = jnp.sum(mask.astype(jnp.int32))

    # ONE packed row-gather permute for all args (see pack_cols)
    packed_args, specs = pack_cols(args)
    packed_p = packed_args[perm]
    ckeys = None if key is None else jax.random.split(key, chunks)
    outs_c = []
    for c in range(chunks):
        sl_p = packed_p[c * csz:(c + 1) * csz]
        call = (
            (lambda sl_p=sl_p: fn(*unpack_cols(sl_p, specs)))
            if key is None
            else (lambda sl_p=sl_p, c=c: fn(ckeys[c], *unpack_cols(sl_p, specs)))
        )

        def run(call=call):
            out = call()
            return out if isinstance(out, tuple) else (out,)

        def skip(call=call):
            shapes = jax.eval_shape(call)
            if not isinstance(shapes, tuple):
                shapes = (shapes,)
            return tuple(
                jnp.full(s.shape, f, s.dtype) for s, f in zip(shapes, fills)
            )

        outs_c.append(jax.lax.cond(live > c * csz, run, skip))

    n_out = len(outs_c[0])
    outs = tuple(
        jnp.concatenate([oc[j] for oc in outs_c], axis=0) for j in range(n_out)
    )
    # unpermute all outputs with ONE wide-row gather
    widths = [o.shape[1] for o in outs]
    packed = jnp.concatenate(outs, axis=1)[inv_perm]
    res = []
    col = 0
    for w in widths:
        res.append(packed[:, col:col + w])
        col += w
    return res[0] if n_out == 1 else tuple(res)
