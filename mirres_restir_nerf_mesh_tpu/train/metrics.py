"""Image quality metrics in pure JAX (PSNR / SSIM; LPIPS optional, gated).

Reference meters: `nerf/utils.py:477-708` (PSNRMeter/SSIMMeter/LPIPSMeter and
their `_brdf` twins).  LPIPS requires a pretrained VGG; it is exposed behind
`lpips_available()` and skipped when the weights package is absent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psnr(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((pred - gt) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    ax = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * (ax / sigma) ** 2)
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def ssim(pred: jnp.ndarray, gt: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """SSIM over [H, W, C] images (gaussian 11x11, standard constants)."""
    k = _gaussian_kernel()[:, :, None, None]  # [11,11,1,1]

    def filt(x):
        # x: [H, W, C] -> depthwise conv
        x = jnp.transpose(x, (2, 0, 1))[:, None]  # [C,1,H,W]
        y = jax.lax.conv_general_dilated(
            x, jnp.transpose(k, (2, 3, 0, 1)), (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return jnp.transpose(y[:, 0], (1, 2, 0))

    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_p, mu_g = filt(pred), filt(gt)
    mu_p2, mu_g2, mu_pg = mu_p * mu_p, mu_g * mu_g, mu_p * mu_g
    # clamp variances at 0: the filtered second moment can dip below mu^2
    # numerically, which otherwise pushes SSIM above 1
    sp = jnp.maximum(filt(pred * pred) - mu_p2, 0.0)
    sg = jnp.maximum(filt(gt * gt) - mu_g2, 0.0)
    spg = filt(pred * gt) - mu_pg
    num = (2 * mu_pg + c1) * (2 * spg + c2)
    den = (mu_p2 + mu_g2 + c1) * (sp + sg + c2)
    return jnp.mean(num / den)


def lpips_available() -> bool:
    try:
        import lpips  # noqa: F401

        return True
    except Exception:
        return False


def lpips_fn(weights_path: str = ""):
    """LPIPS(vgg) callable on numpy [H,W,3] images.

    Preference order: the `lpips` torch package (exact published metric) ->
    vendored weights through the pure-JAX backbone -> deterministic
    random-VGG perceptual fallback (train/lpips.py; values not comparable to
    published LPIPS, flagged via .kind)."""
    if lpips_available():
        import lpips
        import numpy as np
        import torch

        net = lpips.LPIPS(net="vgg")

        def _fn(pred, gt):
            p = torch.from_numpy(np.asarray(pred)).permute(2, 0, 1)[None] * 2 - 1
            g = torch.from_numpy(np.asarray(gt)).permute(2, 0, 1)[None] * 2 - 1
            with torch.no_grad():
                return float(net(p.float(), g.float()))

        _fn.kind = "vgg"
        return _fn

    from .lpips import lpips_kind, make_lpips

    fn = make_lpips(weights_path)
    fn.kind = lpips_kind(weights_path)
    return fn
