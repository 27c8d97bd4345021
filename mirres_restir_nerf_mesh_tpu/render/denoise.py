"""Differentiable screen-space denoisers, pure JAX (stencil programs).

Two variants, matching the reference:
  - Edge-avoiding a-trous wavelet (EAW) filter: 5x5 B3-spline taps, weights
    exp(-d2/phi) over color/normal/position, iterated with the step width
    halving each pass (reference EAWDenoise.slang:48-180 +
    Denoising.py:154-202; phis c=1.0, n=0.1, p=0.1 from
    renderer_restir.py:483).
  - Bilateral denoiser: gaussian x normal^128 x relative-depth weights over a
    (2*ceil(2.5 sigma)+1) window (reference renderutils/c_src/denoising.cu).

Both differentiate through the COLOR only (weights are stop-gradient'd wrt
color to match the hand-written backward kernels, which treat the weights as
constants)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# 5x5 B3-spline kernel (EAWDenoise.slang:113-139)
_B3 = np.outer([1 / 16, 1 / 4, 3 / 8, 1 / 4, 1 / 16], [1 / 16, 1 / 4, 3 / 8, 1 / 4, 1 / 16])


def _shift2d(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift [H,W,C] by (dy,dx), zero padding; also returns validity mask."""
    H, W = x.shape[0], x.shape[1]
    pad_y = (max(dy, 0), max(-dy, 0))
    pad_x = (max(dx, 0), max(-dx, 0))
    xp = jnp.pad(x, (pad_y, pad_x) + ((0, 0),) * (x.ndim - 2))
    return xp[pad_y[1] : pad_y[1] + H, pad_x[1] : pad_x[1] + W]


def _valid2d(H, W, dy, dx):
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    return ((yy - dy >= 0) & (yy - dy < H) & (xx - dx >= 0) & (xx - dx < W))


def eaw_step(
    color: jnp.ndarray,   # [H,W,3]
    normal: jnp.ndarray,  # [H,W,3]
    pos: jnp.ndarray,     # [H,W,3]
    mask: jnp.ndarray,    # [H,W] bool (occ_map)
    step_width: int,
    c_phi: float,
    n_phi: float,
    p_phi: float,
) -> jnp.ndarray:
    H, W = color.shape[0], color.shape[1]
    cval_ng = jax.lax.stop_gradient(color)

    num = jnp.zeros_like(color)
    den = jnp.zeros((H, W, 1))
    for ky in range(5):
        for kx in range(5):
            dy = (ky - 2) * step_width
            dx = (kx - 2) * step_width
            k = float(_B3[ky, kx])
            ctmp = _shift2d(color, dy, dx)
            ctmp_ng = jax.lax.stop_gradient(ctmp)
            ntmp = _shift2d(normal, dy, dx)
            ptmp = _shift2d(pos, dy, dx)
            ok = _valid2d(H, W, dy, dx) & _shift2d(mask[..., None], dy, dx)[..., 0]

            d2c = jnp.sum((cval_ng - ctmp_ng) ** 2, -1)
            w_c = jnp.minimum(jnp.exp(-d2c / c_phi), 1.0)
            d2n = jnp.sum((normal - ntmp) ** 2, -1)
            w_n = jnp.minimum(jnp.exp(-d2n / n_phi), 1.0)
            d2p = jnp.sum((pos - ptmp) ** 2, -1)
            w_p = jnp.minimum(jnp.exp(-d2p / p_phi), 1.0)

            w = jnp.where(ok, w_c * w_n * w_p * k, 0.0)[..., None]
            num = num + ctmp * w
            den = den + w

    out = num / jnp.maximum(den, 1e-8)
    return jnp.where(mask[..., None], out, color)


def eaw_denoise(
    color: jnp.ndarray,
    normal: jnp.ndarray,
    pos: jnp.ndarray,
    mask: jnp.ndarray,
    iterations: int = 4,
    step_width: int = 8,
    c_phi: float = 1.0,
    n_phi: float = 0.1,
    p_phi: float = 0.1,
    differentiable: bool = True,
) -> jnp.ndarray:
    """Iterated a-trous filtering, step width halving per pass
    (Denoising.py:180-201; stepWidth = 2^(iters-1), renderer.py:1105)."""
    if not differentiable:
        color = jax.lax.stop_gradient(color)
        normal = jax.lax.stop_gradient(normal)
        pos = jax.lax.stop_gradient(pos)
    sw = step_width
    for _ in range(iterations):
        color = eaw_step(color, normal, pos, mask, max(int(sw), 1), c_phi, n_phi, p_phi)
        sw //= 2
    return color


def normal_ao(normal: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Screen-space AO from local normal agreement (reference
    EAWDenoise.slang:591-648 process_normal_ao, consumed by the
    lambda_extra_kd albedo-smoothness loss, renderer.py:1151-1158):
    over an 8x8 window, sum clamped dot(n_center, n_nbr) over valid hit
    pixels; ao = clamp(50 * (1 - sum/count), 0, 1).  High where normals
    disagree (creases/concavities), 0 on misses.  normal [H,W,3],
    mask [H,W] -> ao [H,W], no gradients."""
    normal = jax.lax.stop_gradient(normal)
    H, W = normal.shape[0], normal.shape[1]
    s = jnp.zeros((H, W))
    cnt = jnp.zeros((H, W))
    for dy in range(-4, 4):
        for dx in range(-4, 4):
            ntmp = _shift2d(normal, dy, dx)
            ok = (
                _valid2d(H, W, dy, dx)
                & _shift2d(mask[..., None], dy, dx)[..., 0]
            )
            d = jnp.clip(jnp.sum(normal * ntmp, -1), 0.0, 1.0)
            s = s + jnp.where(ok, d, 0.0)
            cnt = cnt + ok
    w = 1.0 - s / jnp.maximum(cnt, 1.0)
    ao = jnp.clip(w * 50.0, 0.0, 1.0)
    return jnp.where(mask, ao, 0.0)


# 25-tap offset pattern shared by the EAW and variance kernels
_OFF25 = [(i - 2, j - 2) for j in range(5) for i in range(5)]


def variance_phi(
    color: jnp.ndarray,   # [H,W,3]
    normal: jnp.ndarray,  # [H,W,3]
    pos: jnp.ndarray,     # [H,W,3]
    mask: jnp.ndarray,    # [H,W]
    step_width: int,
) -> jnp.ndarray:
    """Per-pixel phi estimate from local 25-tap variance (reference
    EAWDenoise.slang:448-588 process_variance; compiled but driven from the
    commented-out per-pixel path in Denoising.py:108-113 — kept for parity):
    phi = (2*sum_c var(color), 0.1*sum_c var(normal), 0.1*sum_c var(pos)),
    1e-6 on misses.  Returns [H,W,3]."""
    H, W = color.shape[0], color.shape[1]
    sums = [jnp.zeros((H, W, 3)) for _ in range(3)]
    sqs = [jnp.zeros((H, W, 3)) for _ in range(3)]
    cnt = jnp.zeros((H, W, 1))
    for (ox, oy) in _OFF25:
        dy, dx = oy * step_width, ox * step_width
        ok = _valid2d(H, W, dy, dx)[..., None]
        for idx, buf in enumerate((color, normal, pos)):
            t = _shift2d(buf, dy, dx)
            sums[idx] = sums[idx] + jnp.where(ok, t, 0.0)
            sqs[idx] = sqs[idx] + jnp.where(ok, t * t, 0.0)
        cnt = cnt + ok
    cnt = jnp.maximum(cnt, 1.0)
    phis = []
    for idx, scale in ((0, 2.0), (1, 0.1), (2, 0.1)):
        mean = sums[idx] / cnt
        var = jnp.maximum(sqs[idx] / cnt - mean * mean, 0.0)
        phis.append(scale * jnp.sum(var, axis=-1))
    out = jnp.stack(phis, axis=-1)
    return jnp.where(mask[..., None], out, 1e-6)


def bilateral_denoise(
    color: jnp.ndarray,   # [H,W,3]
    normal: jnp.ndarray,  # [H,W,3]
    zdz: jnp.ndarray,     # [H,W,2] depth + depth gradient scale
    sigma: float = 2.0,
) -> jnp.ndarray:
    """nvdiffrecmc bilateral filter (denoising.cu:14-76): gaussian distance x
    clamped-dot(normal)^128 x exp(-|dz|/(dz_scale*dist)); returns the
    normalized filtered color (the reference divides col/w outside)."""
    H, W = color.shape[0], color.shape[1]
    variance = sigma * sigma
    rad = int(2 * np.ceil(sigma * 2.5) + 1)

    c_nrm = normal
    c_z = zdz[..., 0]
    c_dz = zdz[..., 1]

    num = jnp.zeros_like(color)
    den = jnp.zeros((H, W))
    for fy in range(-rad, rad + 1):
        for fx in range(-rad, rad + 1):
            dist_sqr = fx * fx + fy * fy
            dist = np.sqrt(dist_sqr)
            w_xy = float(np.exp(-dist_sqr / (2.0 * variance)))
            t_col = _shift2d(color, fy, fx)
            t_nrm = _shift2d(normal, fy, fx)
            t_z = _shift2d(zdz, fy, fx)
            ok = _valid2d(H, W, fy, fx)

            w_normal = jnp.clip(jnp.sum(t_nrm * c_nrm, -1), 1e-8, 1.0) ** 128
            w_depth = jnp.exp(
                -jnp.abs(t_z[..., 0] - c_z) / jnp.maximum(c_dz * dist, 1e-8)
            )
            w = jnp.where(ok, w_xy * w_normal * jax.lax.stop_gradient(w_depth), 0.0)
            num = num + t_col * w[..., None]
            den = den + w

    return num / jnp.maximum(den, 1e-4)[..., None]
