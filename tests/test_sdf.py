"""SDF/NeuS mode tests: double-sphere pretraining and NeuS alpha conversion."""

import jax
import jax.numpy as jnp
import numpy as np

from mirres_restir_nerf_mesh_tpu.models.nerf import NeRFSpec, init_nerf, density, neus_alpha
from mirres_restir_nerf_mesh_tpu.train.stage0 import init_double_sphere


def test_double_sphere_pretrain_fits_sdf():
    spec = NeRFSpec(bound=1.0, sdf=True)
    params = init_nerf(jax.random.PRNGKey(0), spec)
    params = init_double_sphere(
        params, spec, jax.random.PRNGKey(1), iters=250, batch_size=4096
    )

    pts = jax.random.uniform(jax.random.PRNGKey(2), (2048, 3), minval=-1, maxval=1)
    d = jnp.linalg.norm(pts, axis=-1)
    gt = jnp.where(d < 1.0, d - 0.5, 1.5 - d)
    pred = density(params, pts, spec)["sigma"]
    err = float(jnp.mean(jnp.abs(pred - gt)))
    assert err < 0.12, err
    # sign structure: negative inside r=0.35, positive at r~0.9
    inner = pts / jnp.maximum(d[:, None], 1e-6) * 0.3
    shell = pts / jnp.maximum(d[:, None], 1e-6) * 0.9
    assert float(jnp.mean(density(params, inner, spec)["sigma"])) < 0
    assert float(jnp.mean(density(params, shell, spec)["sigma"])) > 0


def test_neus_alpha_peaks_at_surface():
    # sdf decreasing along the ray: crossing zero gives high alpha
    sdf = jnp.array([0.5, 0.2, 0.01, -0.2, -0.5])
    normal = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (5, 1))
    dirs = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (5, 1))
    dts = jnp.full((5,), 0.25)
    variance = jnp.asarray(0.3)
    alpha = neus_alpha(sdf, variance, normal, dirs, dts)
    assert alpha.shape == (5,)
    assert bool(jnp.isfinite(alpha).all())
    assert float(alpha[2]) > float(alpha[0])  # near-surface sample dominates
    assert float(alpha.max()) <= 1.0 and float(alpha.min()) >= 0.0
