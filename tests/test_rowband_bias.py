"""Row-band stage-1 training bias (VERDICT r3 weak 7).

`--stage1_rows` trains on contiguous row bands; image-space passes
(spatial reuse, denoise, antialias) clip at band boundaries.  This test
quantifies that boundary bias: a banded render must differ from the
full-frame render by no more than the Monte-Carlo seed-to-seed noise
floor (scaled), both overall and on the boundary rows specifically.
Reference training always renders full frames (nerf/renderer_restir.py
operates on the whole image), so band bias is a TPU-memory tradeoff this
framework introduces and must bound."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mirres_restir_nerf_mesh_tpu.data.provider import RayDataset
from mirres_restir_nerf_mesh_tpu.data.synthetic import make_synthetic_dataset
from mirres_restir_nerf_mesh_tpu.export.meshops import decimate, marching_tets
from mirres_restir_nerf_mesh_tpu.models.material import MaterialSpec, init_material
from mirres_restir_nerf_mesh_tpu.models.nerf import NeRFSpec, init_nerf
from mirres_restir_nerf_mesh_tpu.render.stage1 import (
    Stage1Params, Stage1Static, render_stage1,
)

H = W = 64
BANDS = 4
ROWS = H // BANDS


@pytest.fixture(scope="module")
def scene():
    n = 32
    ax = np.linspace(-1, 1, n, dtype=np.float32)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    field = 0.5 - np.sqrt(X ** 2 + Y ** 2 + Z ** 2)
    v, t = marching_tets(field, 0.0, origin=(-1, -1, -1), spacing=(2 / (n - 1),) * 3)
    v, t = decimate(v, t, 500)
    data = make_synthetic_dataset(n_frames=1, H=H, W=W, bound=1.0)
    f = RayDataset(data, bound=1.0).frame_rays(0)

    key = jax.random.PRNGKey(0)
    nerf_spec = NeRFSpec(bound=1.0, hidden_dim=16, hidden_dim_color=16,
                         geo_feat_dim=7, grid_levels=4,
                         grid_log2_hashmap_size=12, grid_desired_resolution=64)
    mat_spec = MaterialSpec(bound=1.0)
    params = Stage1Params(
        nerf=init_nerf(key, nerf_spec),
        offsets=jnp.zeros((v.shape[0], 3)),
        mat=init_material(key, mat_spec),
        env=jnp.full((8, 16, 3), 0.6, jnp.float32),
    )
    return v, t, f, params, nerf_spec, mat_spec


def _static(v, t, nerf_spec, mat_spec, rows):
    return Stage1Static(
        tris=jnp.asarray(t), nerf_spec=nerf_spec, mat_spec=mat_spec,
        spp=4, bounces=1, use_restir=True, H=rows, W=W,
        restir_tiles=4, restir_tile_size=64, restir_light_samples=8,
        restir_brdf_samples=1, restir_neighbors=3, restir_radius=4.0,
        restir_offsets=256, denoise_iters=3, antialias=True,
    )


def test_rowband_bias_within_noise_floor(scene):
    v, t, f, params, nerf_spec, mat_spec = scene
    bv = jnp.asarray(v)

    st_full = _static(v, t, nerf_spec, mat_spec, H)
    st_band = _static(v, t, nerf_spec, mat_spec, ROWS)

    @jax.jit
    def full(k):
        out = render_stage1(params, st_full, bv, f["rays_o"], f["rays_d"], k)
        return out["image_brdf"].reshape(H, W, 3)

    @jax.jit
    def band(k, ro, rd):
        out = render_stage1(params, st_band, bv, ro, rd, k)
        return out["image_brdf"].reshape(ROWS, W, 3)

    key = jax.random.PRNGKey(7)
    img_a = np.asarray(full(jax.random.fold_in(key, 0)))
    img_b = np.asarray(full(jax.random.fold_in(key, 1)))
    rows = []
    for b in range(BANDS):
        sl = slice(b * ROWS * W, (b + 1) * ROWS * W)
        rows.append(np.asarray(band(jax.random.fold_in(key, 2 + b),
                                    f["rays_o"][sl], f["rays_d"][sl])))
    img_c = np.concatenate(rows, axis=0)

    noise = np.abs(img_a - img_b).mean()          # MC seed-to-seed floor
    bias = np.abs(img_c - img_a).mean()           # band vs full delta
    assert np.isfinite(img_c).all()
    # banded rendering is a different-seed estimate of the same image plus
    # boundary clipping; its delta must stay within the noise scale
    assert bias <= 1.5 * noise + 5e-3, (bias, noise)

    # boundary rows (within 2 of each internal cut) must not be
    # categorically worse than interior rows
    d = np.abs(img_c - img_a).mean(axis=(1, 2))   # per-row delta
    cut_rows = []
    for b in range(1, BANDS):
        cut_rows += [b * ROWS - 2, b * ROWS - 1, b * ROWS, b * ROWS + 1]
    interior = np.delete(d, cut_rows)
    boundary = d[cut_rows]
    assert boundary.mean() <= 3.0 * max(interior.mean(), 1e-4), (
        boundary.mean(), interior.mean())
