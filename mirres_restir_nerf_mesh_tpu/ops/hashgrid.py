"""Multi-resolution hash-grid encoder (Instant-NGP style), TPU-native.

Re-implements the behavior of the reference CUDA grid encoder
(`gridencoder/src/gridencoder.cu:88-660`, `gridencoder/grid.py:100-175`) as a
pure-JAX program: per-level trilinear interpolation over either a dense grid
(small levels) or a spatially-hashed table (large levels).  Gradients to both
the embedding tables and the input positions come from JAX autodiff
(gather -> scatter-add under XLA), replacing the hand-written CUDA backward.

Layout notes (matching the reference exactly so hyperparameters transfer):
  scale_l      = base_resolution * per_level_scale**l - 1
  resolution_l = ceil(scale_l) + 1
  dense level if (resolution_l + 1)**3 <= hashmap_size, with stride
  (resolution_l + 1) per axis (align_corners=False), else xor-hash with
  primes (1, 2654435761, 805459861) modulo the level table size.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _gather_rows(emb: jnp.ndarray, idx: jnp.ndarray, offset: int, size: int):
    """Table-row gather whose backward uses the Pallas MXU one-hot
    scatter-add (ops/pallas_scatter.py) instead of XLA's serialized
    scatter (~50ns/row): the hash-grid backward is the dominant stage-0
    cost. idx holds ABSOLUTE row ids (level offset already added)."""
    return jnp.take(emb, idx, axis=0)


def _gather_rows_fwd(emb, idx, offset, size):
    return jnp.take(emb, idx, axis=0), (idx, emb.shape[0])


def _gather_rows_bwd(offset, size, res, g):
    idx, n_rows = res
    C = g.shape[-1]
    if jax.default_backend() == "cpu":
        full = jnp.zeros((n_rows, C), g.dtype).at[idx.reshape(-1)].add(g.reshape(-1, C))
        return (full, None)
    from .pallas_scatter import pallas_scatter_add

    local = pallas_scatter_add(
        (idx.reshape(-1) - offset).astype(jnp.int32), g.reshape(-1, C), size, C
    )
    full = jax.lax.dynamic_update_slice(jnp.zeros((n_rows, C), g.dtype), local, (offset, 0))
    return (full, None)


_gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _gather_rows_multi(emb: jnp.ndarray, idx: jnp.ndarray, levels):
    """ALL levels' table gathers as ONE gather op.

    Separate per-level gathers pay ~1.5 ms of per-op overhead each on v5e
    (measured: 13 gathers of 262k rows = 33.8 ms, one combined 13x262k
    gather = 14.7 ms); the forward combines every level's ABSOLUTE row ids
    into idx [N, K] and issues a single take.  The backward still runs the
    MXU one-hot scatter PER LEVEL (its [NC, table_rows/128] one-hot must
    fit VMEM, so it needs the small per-level range), driven by `levels`:
    a static tuple of (col0, col1, offset, size) column groups."""
    return jnp.take(emb, idx, axis=0)


def _grm_fwd(emb, idx, levels):
    return jnp.take(emb, idx, axis=0), (idx, emb.shape[0])


def _grm_bwd(levels, res, g):
    idx, n_rows = res
    C = g.shape[-1]
    if jax.default_backend() == "cpu":
        full = jnp.zeros((n_rows, C), g.dtype).at[idx.reshape(-1)].add(
            g.reshape(-1, C)
        )
        return (full, None)
    from .pallas_scatter import pallas_scatter_add

    full = jnp.zeros((n_rows, C), g.dtype)
    for (c0, c1, off, size) in levels:
        local = pallas_scatter_add(
            (idx[:, c0:c1].reshape(-1) - off).astype(jnp.int32),
            g[:, c0:c1].reshape(-1, C), size, C,
        )
        full = jax.lax.dynamic_update_slice(full, local, (off, 0))
    return (full, None)


_gather_rows_multi.defvjp(_grm_fwd, _grm_bwd)


@dataclass(frozen=True)
class HashGridSpec:
    """Static metadata for a hash-grid encoder instance."""

    input_dim: int = 3
    num_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    per_level_scale: float = 2.0
    desired_resolution: Optional[int] = None
    interpolation: str = "linear"  # linear | smoothstep
    gridtype: str = "hash"         # hash | tiled

    @property
    def scale_factor(self) -> float:
        if self.desired_resolution is not None:
            return 2.0 ** (
                math.log2(self.desired_resolution / self.base_resolution)
                / (self.num_levels - 1)
            )
        return self.per_level_scale

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim

    def level_meta(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Returns (offsets[num_levels+1], scales, resolutions, is_dense)."""
        max_params = 2 ** self.log2_hashmap_size
        offsets = [0]
        scales = []
        resolutions = []
        dense = []
        offset = 0
        for lvl in range(self.num_levels):
            scale = self.base_resolution * (self.scale_factor ** lvl) - 1.0
            res = int(math.ceil(scale)) + 1
            n_dense = (res + 1) ** self.input_dim
            params_in_level = min(max_params, n_dense)
            params_in_level = int(math.ceil(params_in_level / 8) * 8)
            scales.append(scale)
            resolutions.append(res)
            dense.append(self.gridtype == "tiled" or n_dense <= max_params)
            offset += params_in_level
            offsets.append(offset)
        return (
            np.array(offsets, dtype=np.int64),
            np.array(scales, dtype=np.float64),
            np.array(resolutions, dtype=np.int64),
            np.array(dense, dtype=bool),
        )

    @property
    def n_params(self) -> int:
        offsets, _, _, _ = self.level_meta()
        return int(offsets[-1])


def init_hashgrid(key: jax.Array, spec: HashGridSpec, std: float = 1e-4) -> jnp.ndarray:
    """Embedding table init: U(-1e-4, 1e-4) (reference grid.py:reset_parameters)."""
    n = spec.n_params
    return jax.random.uniform(key, (n, spec.level_dim), minval=-std, maxval=std, dtype=jnp.float32)


# 8 corner offsets of the trilinear cell, shape [8, 3]
_CORNERS = np.stack(np.meshgrid(*([np.arange(2)] * 3), indexing="ij"), axis=-1).reshape(-1, 3)


def _level_lookup(
    embeddings: jnp.ndarray,
    x01: jnp.ndarray,
    scale: float,
    resolution: int,
    offset: int,
    size: int,
    dense: bool,
    smoothstep: bool,
) -> jnp.ndarray:
    """One level of trilinear hash-grid interpolation. x01: [N,3] in [0,1]."""
    pos = x01 * scale + 0.5
    pg = jnp.floor(pos)
    frac = pos - pg
    if smoothstep:
        frac = frac * frac * (3.0 - 2.0 * frac)
    pg = pg.astype(jnp.uint32)  # [N,3]

    corners = jnp.asarray(_CORNERS, dtype=jnp.uint32)  # [8,3]

    R1 = resolution + 1
    if dense and size >= R1 * R1 * R1:
        # packed-corner fast path: view the level as a 3D grid and stack the
        # 8 corner neighborhoods channel-wise, so every point needs ONE
        # wide-row gather instead of eight (gathers are latency-priced per
        # ROW regardless of width — CLAUDE.md cost model; exact same values).
        # Guarded: a tiled level that overflows max_params is marked dense but
        # holds < R1^3 rows — it takes the modular-index path below.
        C = embeddings.shape[-1]
        lvl = jax.lax.dynamic_slice(embeddings, (offset, 0), (size, C))
        grid = lvl[: R1 * R1 * R1].reshape(R1, R1, R1, C)
        res = resolution
        packed = jnp.concatenate(
            [
                grid[cx : cx + res, cy : cy + res, cz : cz + res]
                for (cx, cy, cz) in _CORNERS
            ],
            axis=-1,
        ).reshape(res * res * res, 8 * C)
        pgc = jnp.minimum(pg, jnp.uint32(res - 1))
        idx = (
            pgc[:, 0] + pgc[:, 1] * jnp.uint32(res) + pgc[:, 2] * jnp.uint32(res * res)
        ).astype(jnp.int32)
        vals = jnp.take(packed, idx, axis=0).reshape(-1, 8, C)  # [N,8,C]
    else:
        pgc = pg[:, None, :] + corners[None, :, :]  # [N,8,3]
        if dense:
            # tiled level overflowing max_params: linear index wraps mod size
            # (reference gridencoder.cu tiled-grid semantics)
            idx = (
                pgc[..., 0]
                + pgc[..., 1] * jnp.uint32(R1)
                + pgc[..., 2] * jnp.uint32(R1 * R1)
            )
        else:
            primes = jnp.asarray(_PRIMES)
            idx = (pgc[..., 0] * primes[0]) ^ (pgc[..., 1] * primes[1]) ^ (pgc[..., 2] * primes[2])
        idx = (idx % jnp.uint32(size)).astype(jnp.int32)
        vals = _gather_rows(embeddings, jnp.int32(offset) + idx, offset, size)  # [N,8,C]

    w = jnp.where(corners[None, :, :] == 1, frac[:, None, :], 1.0 - frac[:, None, :])
    w = w[..., 0] * w[..., 1] * w[..., 2]  # [N,8]
    return jnp.sum(vals * w[..., None], axis=1)  # [N,C]


def _level_lookup_stochastic(
    embeddings: jnp.ndarray,
    x01: jnp.ndarray,
    u: jnp.ndarray,
    scale: float,
    resolution: int,
    offset: int,
    size: int,
    dense: bool,
) -> jnp.ndarray:
    """Unbiased one-corner estimator of trilinear interpolation.

    Picks corner bit b_d = (u_d < frac_d) per axis, so P(corner) equals its
    trilinear weight and E[feat[corner]] == trilinear(feats).  One gather per
    point per level instead of eight — the TPU-native answer to the ~15ns
    hard cost of every random table-row access (XLA gather), trading variance
    (absorbed by SGD) for an 8x cut in memory transactions.
    """
    pos = x01 * scale + 0.5
    pg = jnp.floor(pos)
    frac = pos - pg
    corner = (u < frac).astype(jnp.uint32)
    pgc = pg.astype(jnp.uint32) + corner  # [N,3]

    if dense:
        stride = resolution + 1
        idx = (
            pgc[..., 0]
            + pgc[..., 1] * jnp.uint32(stride)
            + pgc[..., 2] * jnp.uint32(stride * stride)
        )
    else:
        primes = jnp.asarray(_PRIMES)
        idx = (pgc[..., 0] * primes[0]) ^ (pgc[..., 1] * primes[1]) ^ (pgc[..., 2] * primes[2])
    idx = (idx % jnp.uint32(size)).astype(jnp.int32)
    return _gather_rows(embeddings, jnp.int32(offset) + idx, offset, size)


def hashgrid_encode(
    embeddings: jnp.ndarray,
    x: jnp.ndarray,
    spec: HashGridSpec,
    bound: float = 1.0,
    max_level: Optional[jnp.ndarray] = None,
    stochastic_key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Encode positions x in [-bound, bound]^3 -> [N, num_levels*level_dim].

    max_level: optional traced scalar; levels >= max_level output zeros
    (progressive-level training, reference grid.py forward max_level).
    stochastic_key: if given, use the unbiased one-corner estimator (training
    fast path); None = exact trilinear interpolation (eval / parity path).
    """
    x01 = (x + bound) / (2.0 * bound)
    x01 = jnp.clip(x01, 0.0, 1.0)
    offsets, scales, resolutions, dense = spec.level_meta()
    smoothstep = spec.interpolation == "smoothstep"

    u = None
    if stochastic_key is not None:
        # one uniform triple per point, shared across levels (the per-level
        # fracs differ, so corners decorrelate across levels anyway)
        u = jax.random.uniform(stochastic_key, x01.shape)

    corners = jnp.asarray(_CORNERS, dtype=jnp.uint32)
    primes = jnp.asarray(_PRIMES)
    N = x01.shape[0]

    # gather batching: every level that goes through the table-row path
    # contributes its ABSOLUTE row ids to ONE combined gather
    # (_gather_rows_multi), and every dense packed-corner level contributes
    # its cell id to ONE combined gather over the stacked packed tables —
    # per-level gathers pay ~1.5 ms of fixed per-op cost each on v5e, so a
    # 16-level encode collapses from ~6 ops to 2.
    feats: list = [None] * spec.num_levels
    m_cols = []          # index columns [N, k] per batched level
    m_meta = []          # (c0, c1, offset, size) per batched level
    m_weight = []        # per batched level: corner weights [N, k] or None
    m_lvl = []
    col = 0
    d_tabs = []          # packed [res^3, 8C] per dense level
    d_idx = []           # cell ids [N] per dense level (with row offset)
    d_weight = []        # trilinear corner weights [N,8] per dense level
    d_lvl = []
    d_rows = 0

    for lvl in range(spec.num_levels):
        scale = float(scales[lvl])
        resolution = int(resolutions[lvl])
        offset = int(offsets[lvl])
        size = int(offsets[lvl + 1] - offsets[lvl])
        is_dense = bool(dense[lvl])

        pos = x01 * scale + 0.5
        pg = jnp.floor(pos)
        frac = pos - pg

        if stochastic_key is not None:
            corner = (u < frac).astype(jnp.uint32)
            pgc = pg.astype(jnp.uint32) + corner  # [N,3]
            if is_dense:
                stride = resolution + 1
                idx = (
                    pgc[..., 0]
                    + pgc[..., 1] * jnp.uint32(stride)
                    + pgc[..., 2] * jnp.uint32(stride * stride)
                )
            else:
                idx = (
                    (pgc[..., 0] * primes[0])
                    ^ (pgc[..., 1] * primes[1])
                    ^ (pgc[..., 2] * primes[2])
                )
            idx = (idx % jnp.uint32(size)).astype(jnp.int32)
            m_cols.append(idx[:, None] + offset)
            m_meta.append((col, col + 1, offset, size))
            m_weight.append(None)
            m_lvl.append(lvl)
            col += 1
            continue

        if smoothstep:
            frac = frac * frac * (3.0 - 2.0 * frac)
        R1 = resolution + 1
        w = jnp.where(
            corners[None, :, :] == 1, frac[:, None, :], 1.0 - frac[:, None, :]
        )
        w = w[..., 0] * w[..., 1] * w[..., 2]  # [N,8]

        if is_dense and size >= R1 * R1 * R1:
            # packed-corner level: cell rows carry all 8 corner features
            # (same packing as _level_lookup's fast path), stacked with the
            # other dense levels' tables for one combined gather below
            C = embeddings.shape[-1]
            lvl_tab = jax.lax.dynamic_slice(embeddings, (offset, 0), (size, C))
            grid = lvl_tab[: R1 * R1 * R1].reshape(R1, R1, R1, C)
            res = resolution
            packed = jnp.concatenate(
                [
                    grid[cx : cx + res, cy : cy + res, cz : cz + res]
                    for (cx, cy, cz) in _CORNERS
                ],
                axis=-1,
            ).reshape(res * res * res, 8 * C)
            pgc0 = jnp.minimum(pg.astype(jnp.uint32), jnp.uint32(res - 1))
            cid = (
                pgc0[:, 0] + pgc0[:, 1] * jnp.uint32(res)
                + pgc0[:, 2] * jnp.uint32(res * res)
            ).astype(jnp.int32)
            d_tabs.append(packed)
            d_idx.append(cid + d_rows)
            d_weight.append(w)
            d_lvl.append(lvl)
            d_rows += res * res * res
            continue

        pgc = pg.astype(jnp.uint32)[:, None, :] + corners[None, :, :]  # [N,8,3]
        if is_dense:
            idx = (
                pgc[..., 0]
                + pgc[..., 1] * jnp.uint32(R1)
                + pgc[..., 2] * jnp.uint32(R1 * R1)
            )
        else:
            idx = (
                (pgc[..., 0] * primes[0])
                ^ (pgc[..., 1] * primes[1])
                ^ (pgc[..., 2] * primes[2])
            )
        idx = (idx % jnp.uint32(size)).astype(jnp.int32)
        m_cols.append(idx + offset)
        m_meta.append((col, col + 8, offset, size))
        m_weight.append(w)
        m_lvl.append(lvl)
        col += 8

    if m_cols:
        idx_cat = jnp.concatenate(m_cols, axis=1)  # [N, col]
        vals = _gather_rows_multi(embeddings, idx_cat, tuple(m_meta))
        for (c0, c1, _, _), w, lvl in zip(m_meta, m_weight, m_lvl):
            v = vals[:, c0:c1]
            if w is None:
                feats[lvl] = v[:, 0]
            else:
                feats[lvl] = jnp.sum(v * w[..., None], axis=1)

    if d_tabs:
        C = embeddings.shape[-1]
        stacked = d_tabs[0] if len(d_tabs) == 1 else jnp.concatenate(d_tabs, axis=0)
        dvals = jnp.take(
            stacked, jnp.stack(d_idx, axis=1), axis=0
        )  # [N, nd, 8C]; plain autodiff: bwd = scatter-add into the packed
        #    tables, whose transpose routes back through the slicing
        for j, (w, lvl) in enumerate(zip(d_weight, d_lvl)):
            v = dvals[:, j].reshape(N, 8, C)
            feats[lvl] = jnp.sum(v * w[..., None], axis=1)

    outs = []
    for lvl in range(spec.num_levels):
        feat = feats[lvl]
        if max_level is not None:
            feat = feat * (lvl < max_level).astype(feat.dtype)
        outs.append(feat)
    return jnp.concatenate(outs, axis=-1)


def hashgrid_tv_loss(
    embeddings: jnp.ndarray,
    x: jnp.ndarray,
    spec: HashGridSpec,
    bound: float = 1.0,
    max_points: int = 4096,
) -> jnp.ndarray:
    """Total-variation regularizer at sampled points.

    Matches the intent of the reference in-grad TV kernel
    (`gridencoder/src/gridencoder.cu:506-604` kernel_grad_tv): for each sample
    point's base grid cell, penalize squared differences to the +1 neighbor
    along each axis at every level.  Expressed as a loss so XLA autodiff
    produces the scatter-add the CUDA kernel hand-writes.
    """
    # subsample: a regularizer at weight ~1e-8 does not need every marched
    # point, and the gathers/scatters it induces would otherwise rival the
    # main loss (points arrive in random ray order, so a prefix is unbiased)
    if x.shape[0] > max_points:
        x = x[:max_points]
    x01 = jnp.clip((x + bound) / (2.0 * bound), 0.0, 1.0)
    offsets, scales, resolutions, dense = spec.level_meta()
    primes = jnp.asarray(_PRIMES)

    total = jnp.zeros((), dtype=jnp.float32)
    for lvl in range(spec.num_levels):
        scale = float(scales[lvl])
        res = int(resolutions[lvl])
        size = int(offsets[lvl + 1] - offsets[lvl])
        off = int(offsets[lvl])

        pg = jnp.floor(x01 * scale + 0.5).astype(jnp.uint32)  # [N,3]

        def index_of(p):
            if bool(dense[lvl]):
                stride = res + 1
                i = p[..., 0] + p[..., 1] * jnp.uint32(stride) + p[..., 2] * jnp.uint32(stride * stride)
            else:
                i = (p[..., 0] * primes[0]) ^ (p[..., 1] * primes[1]) ^ (p[..., 2] * primes[2])
            return (i % jnp.uint32(size)).astype(jnp.int32) + off

        # plain take here: with the 4096-point subsample the XLA scatter in
        # its backward is cheap, while routing through _gather_rows would
        # materialize a full-size grad array per level (64 of them)
        base = jnp.take(embeddings, index_of(pg), axis=0)  # [N,C]
        for d in range(3):
            nb = pg.at[:, d].add(jnp.uint32(1))
            nbv = jnp.take(embeddings, index_of(nb), axis=0)
            total = total + jnp.mean((nbv - base) ** 2)
    return total
