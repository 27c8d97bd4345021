"""End-to-end TPU drive: render one stage-1 ReSTIR frame and save a PNG.

The /verify recipe for this repo: run the public API on the real chip and
LOOK at the image.  Uses the bench scene (blob mesh + sky/sun HDR) at a
small resolution so the compile is quick, prints simple sanity stats
(coverage, mean radiance, NaN check) and writes /tmp/drive_stage1.png.
"""

from __future__ import annotations

import os
import sys

import numpy as np
from PIL import Image

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.makedirs(os.path.join(_REPO, ".jax_cache"), exist_ok=True)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, _REPO)

from mirres_restir_nerf_mesh_tpu.data.provider import RayDataset  # noqa: E402
from mirres_restir_nerf_mesh_tpu.data.synthetic import make_synthetic_dataset  # noqa: E402
from mirres_restir_nerf_mesh_tpu.export.meshops import decimate, marching_tets  # noqa: E402
from mirres_restir_nerf_mesh_tpu.models.material import MaterialSpec, init_material  # noqa: E402
from mirres_restir_nerf_mesh_tpu.models.nerf import NeRFSpec, init_nerf  # noqa: E402
from mirres_restir_nerf_mesh_tpu.render.stage1 import (  # noqa: E402
    Stage1Params,
    Stage1Static,
    render_stage1,
)


def main() -> None:
    print("devices:", jax.devices(), flush=True)
    n = 64
    ax = np.linspace(-1, 1, n, dtype=np.float32)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    r = np.sqrt(X ** 2 + Y ** 2 + Z ** 2)
    field = 0.55 + 0.06 * np.sin(9 * X) * np.sin(7 * Y) * np.cos(5 * Z) - r
    verts, tris = marching_tets(field, 0.0, origin=(-1, -1, -1),
                                spacing=(2 / (n - 1),) * 3)
    verts, tris = decimate(verts, tris, 30_000)

    H = W = 128
    data = make_synthetic_dataset(n_frames=1, H=H, W=W, bound=1.0)
    f = RayDataset(data, bound=1.0).frame_rays(0)

    nerf_spec = NeRFSpec(bound=1.0, compute_dtype=jnp.bfloat16)
    mat_spec = MaterialSpec(bound=1.0, compute_dtype=jnp.bfloat16)
    static = Stage1Static(
        tris=jnp.asarray(tris), nerf_spec=nerf_spec, mat_spec=mat_spec,
        spp=2, bounces=2, use_restir=True, H=H, W=W,
        restir_tiles=32, restir_tile_size=256,
        restir_light_samples=32, restir_brdf_samples=1,
        restir_neighbors=5, restir_radius=10.0, restir_offsets=2048,
        denoise_iters=3,
    )
    key = jax.random.PRNGKey(0)
    eh, ew = 32, 64
    theta = (np.arange(eh) + 0.5) / eh * np.pi
    sky = np.clip(np.cos(theta), 0, None)[:, None] ** 1.5
    env_np = np.tile((0.08 + 0.5 * sky)[:, :, None], (1, ew, 3)).astype(np.float32)
    env_np[3:5, 15:17] = [60.0, 55.0, 45.0]
    params = Stage1Params(
        nerf=init_nerf(key, nerf_spec),
        offsets=jnp.zeros((verts.shape[0], 3)),
        mat=init_material(key, mat_spec),
        env=jnp.asarray(env_np),
    )

    @jax.jit
    def frame(p, ro, rd, k):
        out = render_stage1(p, static, jnp.asarray(verts), ro, rd, k)
        return out["image_brdf"], out["mask"], out["uncertain_count"]

    img, mask, unc = frame(params, f["rays_o"], f["rays_d"], key)
    img = np.asarray(img).reshape(H, W, 3)
    mask = np.asarray(mask).reshape(H, W)
    cov = float(mask.mean())
    mean_on = float(img[mask].mean()) if mask.any() else 0.0
    print(f"coverage {cov:.3f}  mean radiance (covered) {mean_on:.4f}  "
          f"uncertain {float(unc):.0f}  finite {np.isfinite(img).all()}",
          flush=True)
    assert np.isfinite(img).all(), "NaN/inf in rendered frame"
    assert 0.02 < cov < 0.9, f"implausible coverage {cov}"
    assert mean_on > 1e-3, "covered pixels are black"

    ldr = np.clip(img / (1.0 + img), 0.0, 1.0) ** (1 / 2.2)
    Image.fromarray((ldr * 255).astype(np.uint8)).save("/tmp/drive_stage1.png")
    print("wrote /tmp/drive_stage1.png", flush=True)


if __name__ == "__main__":
    main()
