"""Depth-extraction hook (depth_tools/extract_depth.py): the TorchScript
depth-model path must run end-to-end on a fixture image and write .npy maps
with the reference protocol (384^2 resize, 0.5/0.5 normalize, bicubic back —
reference depth_tools/extract_depth.py:52-79)."""

import os
import subprocess
import sys

import numpy as np
import pytest


def test_extract_depth_end_to_end(tmp_path):
    torch = pytest.importorskip("torch")
    from PIL import Image

    # fixture images: a vertical luminance ramp (depth-net stand-in target)
    img_dir = tmp_path / "images"
    os.makedirs(img_dir)
    H, W = 97, 123  # non-square, non-384: exercises both resizes
    ramp = np.linspace(0, 1, H)[:, None, None].repeat(W, 1).repeat(3, 2)
    for name in ("a", "b"):
        Image.fromarray((ramp * 255).astype(np.uint8)).save(img_dir / f"{name}.png")

    # tiny TorchScript "depth net": mean over channels (shape contract only)
    class Tiny(torch.nn.Module):
        def forward(self, x):  # [1,3,384,384] normalized -> [1,384,384]
            return x.mean(dim=1)

    model_path = str(tmp_path / "tiny.pt")
    torch.jit.trace(Tiny().eval(), torch.zeros(1, 3, 384, 384)).save(model_path)

    r = subprocess.run(
        [sys.executable, "depth_tools/extract_depth.py", str(img_dir),
         "--model_path", model_path, "--out", str(tmp_path / "depths")],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    assert r.returncode == 0, r.stderr

    for name in ("a", "b"):
        d = np.load(tmp_path / "depths" / f"{name}.npy")
        assert d.shape == (H, W)
        # mean-channel of the normalized ramp: monotone top->bottom
        assert d[-1].mean() > d[0].mean()
        # endpoints: (0-0.5)/0.5=-1 at top, (1-0.5)/0.5=+1 at bottom
        assert abs(d[0].mean() + 1.0) < 0.1 and abs(d[-1].mean() - 1.0) < 0.1


def test_extract_depth_jax_dpt_ckpt(tmp_path):
    """--ckpt path: a saved omnidata-layout checkpoint runs through the
    pure-JAX DPT (depth_tools/dpt_jax.py) and writes depth maps at source
    resolution (reference extract_depth.py protocol)."""
    torch = pytest.importorskip("torch")
    from PIL import Image

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "depth_tools"))
    import dpt_jax
    from extract_depth import JaxDPT, run_model

    _, sd = dpt_jax.random_params()
    # lightning-style wrapping, like the real omnidata ckpt
    ckpt = {"state_dict": {f"model.{k}": torch.from_numpy(np.asarray(v))
                           for k, v in sd.items()}}
    ckpt_path = str(tmp_path / "dpt.ckpt")
    torch.save(ckpt, ckpt_path)

    H, W = 97, 123
    rng = np.random.RandomState(0)
    img = rng.rand(H, W, 3).astype(np.float32)
    model = JaxDPT(ckpt_path)
    d = run_model(model, img)
    assert d.shape == (H, W)
    assert np.isfinite(d).all()
    assert (d >= -1e-3).sum() > 0  # non_negative head
