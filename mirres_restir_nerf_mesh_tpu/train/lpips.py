"""LPIPS perceptual metric/loss in pure JAX (VGG16 backbone).

Re-implements the reference's `lpips.LPIPS(net='vgg')` usage
(`nerf/utils.py:630-708` metric meters, `utils.py:1056-1066` patch loss):
VGG16 conv features tapped after relu1_2 / relu2_2 / relu3_3 / relu4_3 /
relu5_3, unit-normalized along channels, squared differences reduced by
non-negative 1x1 "lin" weights and averaged over space, summed over taps.

Weights: the official LPIPS VGG weights cannot be downloaded in this
environment (zero egress).  Two modes:
  - `load_weights(path)`: a vendored .npz with conv{i}_w/conv{i}_b and
    lin{j}_w arrays gives the exact published metric (cfg.lpips_weights).
  - `random_params(key)`: deterministic He-initialized features with uniform
    lin weights — the "random-VGG" perceptual distance.  Random convnet
    features are an established perceptual baseline (they preserve the
    multi-scale, channel-correlated structure LPIPS relies on); values are
    NOT comparable to published LPIPS numbers and are labeled as such by
    `lpips_kind()`.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, tap_after_this_layer)
_PLAN: List[Tuple[int, bool]] = [
    (64, False), (64, True),          # relu1_2
    (128, False), (128, True),        # relu2_2
    (256, False), (256, False), (256, True),    # relu3_3
    (512, False), (512, False), (512, True),    # relu4_3
    (512, False), (512, False), (512, True),    # relu5_3
]
# max-pool before these layer indices (after each tapped block)
_POOL_BEFORE = {2, 4, 7, 10}

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def random_params(key: jax.Array = None) -> Dict[str, Any]:
    """Deterministic random-feature VGG (He init) + uniform lin weights."""
    key = key if key is not None else jax.random.PRNGKey(0)
    params: Dict[str, Any] = {}
    cin = 3
    taps = 0
    for i, (cout, tap) in enumerate(_PLAN):
        key, k = jax.random.split(key)
        std = float(np.sqrt(2.0 / (3 * 3 * cin)))
        params[f"conv{i}_w"] = jax.random.normal(k, (3, 3, cin, cout), jnp.float32) * std
        params[f"conv{i}_b"] = jnp.zeros((cout,), jnp.float32)
        if tap:
            params[f"lin{taps}_w"] = jnp.full((cout,), 1.0 / cout, jnp.float32)
            taps += 1
        cin = cout
    return params


def load_weights(path: str) -> Optional[Dict[str, Any]]:
    """Vendored-weights loader (.npz with conv{i}_w/b, lin{j}_w)."""
    if not path or not os.path.exists(path):
        return None
    raw = np.load(path)
    return {k: jnp.asarray(raw[k]) for k in raw.files}


# torchvision VGG16 `features` indices of the 13 conv layers, in order —
# the official state-dict layout (validated against
# tests/fixtures/lpips_vgg_manifest.json without the weights file)
_VGG16_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]


def convert_state_dicts(
    vgg_sd: Dict[str, np.ndarray], lin_sd: Dict[str, np.ndarray]
) -> Dict[str, np.ndarray]:
    """Map the official torch state dicts onto this module's param layout
    (pure numpy; shared by scripts/fetch_lpips_weights.py and the manifest
    test).  vgg_sd: torchvision `vgg16(pretrained).features.state_dict()`
    (`features.{i}.weight` OIHW); lin_sd: the lpips package's vgg.pth
    (`lin{j}.model.1.weight` [1,C,1,1]) — reference nerf/utils.py:600-708
    evaluates through exactly these two checkpoints."""
    out: Dict[str, np.ndarray] = {}
    for i, idx in enumerate(_VGG16_CONV_IDX):
        w = np.asarray(vgg_sd[f"features.{idx}.weight"], np.float32)  # [O,I,kh,kw]
        b = np.asarray(vgg_sd[f"features.{idx}.bias"], np.float32)
        if w.shape[0] != _PLAN[i][0] or w.shape[2:] != (3, 3):
            raise ValueError(
                f"features.{idx}.weight has shape {w.shape}, expected "
                f"[{_PLAN[i][0]}, Cin, 3, 3]"
            )
        out[f"conv{i}_w"] = np.transpose(w, (2, 3, 1, 0))             # HWIO
        out[f"conv{i}_b"] = b
    for j in range(5):
        w = np.asarray(lin_sd[f"lin{j}.model.1.weight"], np.float32)
        out[f"lin{j}_w"] = w.reshape(-1)
    return out


def _features(params: Dict[str, Any], x: jnp.ndarray) -> List[jnp.ndarray]:
    """x [N,H,W,3] in [-1,1] -> list of tapped feature maps."""
    h = (x - _SHIFT[None, None, None]) / _SCALE[None, None, None]
    feats = []
    for i, (cout, tap) in enumerate(_PLAN):
        if i in _POOL_BEFORE:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
        h = jax.lax.conv_general_dilated(
            h, params[f"conv{i}_w"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + params[f"conv{i}_b"]
        h = jax.nn.relu(h)
        if tap:
            feats.append(h)
    return feats


def lpips_distance(params: Dict[str, Any], pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """pred/gt [H,W,3] (or [N,H,W,3]) in [0,1] -> scalar (or [N]) distance."""
    squeeze = pred.ndim == 3
    if squeeze:
        pred, gt = pred[None], gt[None]
    fp = _features(params, pred * 2.0 - 1.0)
    fg = _features(params, gt * 2.0 - 1.0)
    total = 0.0
    for j, (a, b) in enumerate(zip(fp, fg)):
        na = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10)
        nb = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10)
        d2 = (na - nb) ** 2                                   # [N,h,w,C]
        w = jnp.maximum(params[f"lin{j}_w"], 0.0)
        total = total + jnp.mean(jnp.sum(d2 * w, axis=-1), axis=(1, 2))
    return total[0] if squeeze else total


@functools.lru_cache(maxsize=1)
def _default_params_cached(weights_path: str = ""):
    p = load_weights(weights_path)
    kind = "vgg" if p is not None else "random-vgg"
    if p is None:
        p = random_params()
    return p, kind


def lpips_kind(weights_path: str = "") -> str:
    """'vgg' (vendored official weights) or 'random-vgg' (fallback)."""
    return _default_params_cached(weights_path)[1]


def make_lpips(weights_path: str = ""):
    """Returns a jitted callable (pred, gt) -> float distance."""
    params, _ = _default_params_cached(weights_path)
    f = jax.jit(functools.partial(lpips_distance, params))

    def _fn(pred, gt):
        return float(f(jnp.asarray(pred, jnp.float32), jnp.asarray(gt, jnp.float32)))

    return _fn
