"""Pure-JAX LPIPS (train/lpips.py): metric sanity + the lambda_lpips loss
path (reference nerf/utils.py:630-708 meters, :1079-1082 loss)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mirres_restir_nerf_mesh_tpu.train import lpips as lpips_mod
from mirres_restir_nerf_mesh_tpu.train.metrics import lpips_fn


def test_lpips_metric_ordering():
    rng = np.random.RandomState(0)
    base = rng.rand(64, 64, 3).astype(np.float32)
    slight = np.clip(base + rng.normal(0, 0.02, base.shape).astype(np.float32), 0, 1)
    heavy = np.clip(base + rng.normal(0, 0.3, base.shape).astype(np.float32), 0, 1)

    params = lpips_mod.random_params()
    d0 = float(lpips_mod.lpips_distance(params, jnp.asarray(base), jnp.asarray(base)))
    d1 = float(lpips_mod.lpips_distance(params, jnp.asarray(slight), jnp.asarray(base)))
    d2 = float(lpips_mod.lpips_distance(params, jnp.asarray(heavy), jnp.asarray(base)))
    assert d0 < 1e-6
    assert d0 < d1 < d2


def test_lpips_fn_fallback_and_kind():
    fn = lpips_fn("")
    assert fn is not None
    assert fn.kind in ("vgg", "random-vgg")
    a = np.zeros((32, 32, 3), np.float32)
    b = np.ones((32, 32, 3), np.float32) * 0.5
    assert fn(a, a) < 1e-6
    assert fn(a, b) > 0


def test_lpips_loss_is_differentiable():
    params = lpips_mod.random_params()
    gt = jnp.zeros((32, 32, 3))

    def loss(x):
        return lpips_mod.lpips_distance(params, x, gt)

    x = jnp.full((32, 32, 3), 0.7)
    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0
