"""Microbench: initial-RIS candidate target math, AoS vs SoA component form.

The RIS candidate lattice evaluates target_function + mixed source pdf on
[P, n] candidates whose direction/Le are last-dim-3 vectors.  CLAUDE.md's
cost model says last-dim-3 vector math wastes VPU lanes (~5x measured on the
cluster-BVH MT kernel in SoA form); this measures whether the same rewrite
pays on the RIS math before committing to it.

Timing per CLAUDE.md: in-graph fori_loop over the op, ONE scalar fetch,
subtract ~29 ms tunnel cost implicitly by comparing variants at equal reps.
"""

from __future__ import annotations

import time

import numpy as np


def main() -> None:
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import jax
    import jax.numpy as jnp

    from mirres_restir_nerf_mesh_tpu.render import brdf
    from mirres_restir_nerf_mesh_tpu.render.restir import PixelCtx, target_function
    from mirres_restir_nerf_mesh_tpu.utils.math import luminance

    P, n = 16384, 32  # ~live-lane count at the bench coverage, 32 candidates
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    nrm = jax.random.normal(ks[0], (P, 3))
    nrm /= jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    view = jax.random.normal(ks[1], (P, 3))
    view /= jnp.linalg.norm(view, axis=-1, keepdims=True)
    ctx = PixelCtx(
        position=jax.random.normal(ks[2], (P, 3)),
        normal=nrm, view_dir=view,
        kd=jax.random.uniform(ks[3], (P, 3)),
        roughness=jax.random.uniform(ks[4], (P,), minval=0.1, maxval=0.9),
        metallic=jnp.zeros((P,)),
        mask=jnp.ones((P,), bool),
        depth=jnp.ones((P,)),
    )
    ld = jax.random.normal(ks[5], (P, n, 3))
    ld /= jnp.linalg.norm(ld, axis=-1, keepdims=True)
    le = jax.random.uniform(ks[6], (P, n, 3))
    lpdf = jax.random.uniform(ks[7], (P, n), minval=0.05, maxval=2.0)

    alpha = brdf.alpha_from_roughness(ctx.roughness)
    w_view = brdf.to_local(-ctx.view_dir, ctx.normal)
    p_diff, p_spec = brdf.lobe_probabilities(
        ctx.kd, ctx.metallic, jnp.sum(-ctx.view_dir * ctx.normal, axis=-1)
    )

    def aos(ld, le, lpdf):
        p_hat = jax.vmap(
            lambda d, e: target_function(ctx, d, e), in_axes=(1, 1), out_axes=1
        )(ld, le)
        bpdf = jax.vmap(
            lambda d: brdf.brdf_pdf(
                w_view, brdf.to_local(d, ctx.normal), alpha, p_diff, p_spec
            ),
            in_axes=1, out_axes=1,
        )(ld)
        src = (31 / 33) * lpdf + (2 / 33) * bpdf
        return jnp.where(src > 1e-12, p_hat / jnp.maximum(src, 1e-12), 0.0)

    # --- SoA: identical math on [P, n] component planes ---
    from mirres_restir_nerf_mesh_tpu.utils.math import onb_frame

    t_, b_, n_ = onb_frame(ctx.normal)

    def soa(ld, le, lpdf):
        ldx, ldy, ldz = ld[..., 0], ld[..., 1], ld[..., 2]
        lex, ley, lez = le[..., 0], le[..., 1], le[..., 2]
        # local frame components ([P,1] broadcast onto [P,n])
        tx, ty, tz = (t_[:, 0:1], t_[:, 1:2], t_[:, 2:3])
        bx, by, bz = (b_[:, 0:1], b_[:, 1:2], b_[:, 2:3])
        nx, ny, nz = (n_[:, 0:1], n_[:, 1:2], n_[:, 2:3])
        wlx = ldx * tx + ldy * ty + ldz * tz
        wly = ldx * bx + ldy * by + ldz * bz
        wlz = ldx * nx + ldy * ny + ldz * nz
        wvx, wvy, wvz = w_view[:, 0:1], w_view[:, 1:2], w_view[:, 2:3]
        a = alpha[:, None]
        ok = jnp.minimum(wvz, wlz) >= 1e-6
        # diffuse: kd*(1-metal)*NdotL/pi per channel
        difw = (1.0 - ctx.metallic)[:, None]
        ndl = jnp.where(ok, jnp.maximum(wlz * (1.0 / np.pi), 0.0), 0.0)
        kdr, kdg, kdb = ctx.kd[:, 0:1], ctx.kd[:, 1:2], ctx.kd[:, 2:3]
        gate_d = (p_diff > 0)[:, None]
        fr_d = jnp.where(gate_d, kdr * difw * ndl, 0.0)
        fg_d = jnp.where(gate_d, kdg * difw * ndl, 0.0)
        fb_d = jnp.where(gate_d, kdb * difw * ndl, 0.0)
        # specular
        hx, hy, hz = wvx + wlx, wvy + wly, wvz + wlz
        rin = jax.lax.rsqrt(jnp.maximum(hx * hx + hy * hy + hz * hz, 1e-24))
        hx, hy, hz = hx * rin, hy * rin, hz * rin
        vdoth = wvx * hx + wvy * hy + wvz * hz
        a2 = a * a
        d_ = (hz * a2 - hz) * hz + 1.0
        D = a2 / jnp.maximum(d_ * d_ * np.pi, 1e-12)

        def lam(c):
            c2 = jnp.clip(c, 1e-6, 1.0) ** 2
            tan2 = jnp.maximum(1.0 - c2, 0.0) / c2
            return jnp.where(c <= 0, 0.0, 0.5 * (-1.0 + jnp.sqrt(1.0 + a2 * tan2)))

        G = 1.0 / jnp.maximum(1.0 + lam(wvz) + lam(wlz), 1e-12)
        f5 = jnp.maximum(1.0 - vdoth, 0.0) ** 5
        met = ctx.metallic[:, None]
        sar = 0.04 * (1.0 - met) + kdr * met
        sag = 0.04 * (1.0 - met) + kdg * met
        sab = 0.04 * (1.0 - met) + kdb * met
        dg = D * G * 0.25 / jnp.maximum(wvz, 1e-6)
        dg = jnp.where((a > 0) & ok, dg, 0.0)
        gate_s = (p_spec > 0)[:, None]
        fr = fr_d + jnp.where(gate_s, (sar + (1.0 - sar) * f5) * dg, 0.0)
        fg = fg_d + jnp.where(gate_s, (sag + (1.0 - sag) * f5) * dg, 0.0)
        fb = fb_d + jnp.where(gate_s, (sab + (1.0 - sab) * f5) * dg, 0.0)
        p_hat = jnp.maximum(
            0.2126 * lex * fr + 0.7152 * ley * fg + 0.0722 * lez * fb, 0.0
        )
        # mixed source pdf: diffuse + specular lobes
        dpdf = jnp.maximum(wlz, 0.0) * (1.0 / np.pi)
        spdf = D * hz / jnp.maximum(4.0 * vdoth, 1e-12)
        spdf = jnp.where(ok & (a > 0) & (vdoth > 0), spdf, 0.0)
        bpdf = p_diff[:, None] * dpdf + p_spec[:, None] * spdf
        src = (31 / 33) * lpdf + (2 / 33) * bpdf
        return jnp.where(src > 1e-12, p_hat / jnp.maximum(src, 1e-12), 0.0)

    # parity first
    wa = np.asarray(aos(ld, le, lpdf))
    ws = np.asarray(soa(ld, le, lpdf))
    err = np.max(np.abs(wa - ws) / np.maximum(np.abs(wa), 1e-6))
    print(f"parity max rel err: {err:.2e}", flush=True)

    REPS = 200

    def timeit(name, fn):
        @jax.jit
        def loop(ld, le, lpdf):
            def body(i, acc):
                w = fn(ld + 1e-6 * i, le, lpdf)
                return acc + jnp.sum(w)

            return jax.lax.fori_loop(0, REPS, body, jnp.zeros(()))

        float(loop(ld, le, lpdf))  # compile
        t0 = time.perf_counter()
        float(loop(ld, le, lpdf))
        dt = (time.perf_counter() - t0 - 0.029) / REPS
        print(f"{name:8s} {dt * 1e6:9.1f} us / call  ({P}x{n} lattice)", flush=True)

    timeit("AoS", aos)
    timeit("SoA", soa)


if __name__ == "__main__":
    main()
