"""JAX DPT-hybrid depth net (depth_tools/dpt_jax.py) vs an independent
torch-functional mirror of the reference architecture
(reference depth_tools/dpt.py DPTDepthModel backbone='vitb_rn50_384').

The mirror builds every op from torch.nn.functional directly off the
torch-layout state_dict, so a parity match validates conv padding (timm
dynamic-SAME vs torch symmetric), weight standardization, GroupNorm/
LayerNorm epsilons, attention reshapes, readout projection and the
align_corners=True bilinear ladders — i.e. that loading the real omnidata
checkpoint into dpt_jax reproduces the reference net."""

import math
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "depth_tools"))

import dpt_jax  # noqa: E402


def _pad_same(x, k, s):
    import torch.nn.functional as F

    ih = x.shape[-2]
    pad = max((math.ceil(ih / s) - 1) * s + k - ih, 0)
    return F.pad(x, [pad // 2, pad - pad // 2, pad // 2, pad - pad // 2])


def _torch_dpt(sd, x_np):
    import torch
    import torch.nn.functional as F

    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    x = torch.from_numpy(x_np).permute(0, 3, 1, 2)

    def std_conv(x, name, stride=1):
        w = sd[f"{name}.weight"]
        v, m = torch.var_mean(w, dim=[1, 2, 3], keepdim=True, unbiased=False)
        w = (w - m) / torch.sqrt(v + 1e-6)
        return F.conv2d(_pad_same(x, w.shape[-1], stride), w, stride=stride)

    def gn(x, name):
        return F.group_norm(x, 32, sd[f"{name}.weight"], sd[f"{name}.bias"], eps=1e-5)

    def conv(x, name, stride=1, padding=0, bias=True):
        return F.conv2d(x, sd[f"{name}.weight"],
                        sd[f"{name}.bias"] if bias else None,
                        stride=stride, padding=padding)

    bb = "pretrained.model.patch_embed.backbone"
    h = F.relu(gn(std_conv(x, f"{bb}.stem.conv", 2), f"{bb}.stem.norm"))
    h = F.max_pool2d(_pad_same(h, 3, 2), 3, 2)
    feats = []
    for s, nblk in enumerate(dpt_jax.STAGE_BLOCKS):
        for m in range(nblk):
            pre = f"{bb}.stages.{s}.blocks.{m}"
            stride = 2 if (m == 0 and s > 0) else 1
            sc = h
            if f"{pre}.downsample.conv.weight" in sd:
                sc = gn(std_conv(h, f"{pre}.downsample.conv", stride),
                        f"{pre}.downsample.norm")
            o = F.relu(gn(std_conv(h, f"{pre}.conv1"), f"{pre}.norm1"))
            o = F.relu(gn(std_conv(o, f"{pre}.conv2", stride), f"{pre}.norm2"))
            o = gn(std_conv(o, f"{pre}.conv3"), f"{pre}.norm3")
            h = F.relu(o + sc)
        feats.append(h)
    l1, l2, h = feats

    pm = "pretrained.model"
    h = conv(h, f"{pm}.patch_embed.proj")
    B, C, gh, gw = h.shape
    tok = h.flatten(2).transpose(1, 2)
    tok = torch.cat([sd[f"{pm}.cls_token"].expand(B, -1, -1), tok], 1)
    tok = tok + sd[f"{pm}.pos_embed"]
    l3 = l4 = None
    for i in range(12):
        pre = f"{pm}.blocks.{i}"
        hh = F.layer_norm(tok, (768,), sd[f"{pre}.norm1.weight"],
                          sd[f"{pre}.norm1.bias"], eps=1e-6)
        qkv = F.linear(hh, sd[f"{pre}.attn.qkv.weight"], sd[f"{pre}.attn.qkv.bias"])
        N = qkv.shape[1]
        qkv = qkv.reshape(B, N, 3, 12, 64).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = torch.softmax(q @ k.transpose(-2, -1) * 64 ** -0.5, dim=-1)
        hh = (a @ v).transpose(1, 2).reshape(B, N, 768)
        tok = tok + F.linear(hh, sd[f"{pre}.attn.proj.weight"], sd[f"{pre}.attn.proj.bias"])
        hh = F.layer_norm(tok, (768,), sd[f"{pre}.norm2.weight"],
                          sd[f"{pre}.norm2.bias"], eps=1e-6)
        hh = F.gelu(F.linear(hh, sd[f"{pre}.mlp.fc1.weight"], sd[f"{pre}.mlp.fc1.bias"]))
        tok = tok + F.linear(hh, sd[f"{pre}.mlp.fc2.weight"], sd[f"{pre}.mlp.fc2.bias"])
        if i == 8:
            l3 = tok
        if i == 11:
            l4 = tok

    def reassemble(t, pre):
        ro = t[:, 0:1].expand_as(t[:, 1:])
        t = torch.cat([t[:, 1:], ro], -1)
        t = F.gelu(F.linear(t, sd[f"{pre}.0.project.0.weight"],
                            sd[f"{pre}.0.project.0.bias"]))
        t = t.transpose(1, 2).reshape(B, 768, gh, gw)
        return conv(t, f"{pre}.3")

    l3 = reassemble(l3, "pretrained.act_postprocess3")
    l4 = reassemble(l4, "pretrained.act_postprocess4")
    l4 = conv(l4, "pretrained.act_postprocess4.4", stride=2, padding=1)

    rn = [F.conv2d(l, sd[f"scratch.layer{i}_rn.weight"], padding=1)
          for i, l in ((1, l1), (2, l2), (3, l3), (4, l4))]

    def rcu(pre, h):
        o = F.relu(h)
        o = conv(o, f"{pre}.conv1", padding=1)
        o = F.relu(o)
        o = conv(o, f"{pre}.conv2", padding=1)
        return o + h

    def fusion(pre, x, skip=None):
        if skip is not None:
            x = x + rcu(f"{pre}.resConfUnit1", skip)
        x = rcu(f"{pre}.resConfUnit2", x)
        x = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=True)
        return conv(x, f"{pre}.out_conv")

    path = fusion("scratch.refinenet4", rn[3])
    path = fusion("scratch.refinenet3", path, rn[2])
    path = fusion("scratch.refinenet2", path, rn[1])
    path = fusion("scratch.refinenet1", path, rn[0])
    h = conv(path, "scratch.output_conv.0", padding=1)
    h = F.interpolate(h, scale_factor=2, mode="bilinear", align_corners=True)
    h = F.relu(conv(h, "scratch.output_conv.2", padding=1))
    h = F.relu(conv(h, "scratch.output_conv.4"))
    return h[:, 0].numpy()


def test_dpt_jax_matches_torch_mirror():
    import jax
    import jax.numpy as jnp

    torch = pytest.importorskip("torch")  # noqa: F841
    params, sd = dpt_jax.random_params()
    x = np.random.RandomState(7).rand(1, 384, 384, 3).astype(np.float32)
    x = (x - 0.5) / 0.5

    d_jax = np.asarray(jax.jit(dpt_jax.dpt_depth)(params, jnp.asarray(x)))
    import torch as _t
    with _t.no_grad():
        d_ref = _torch_dpt(sd, x)

    assert d_jax.shape == d_ref.shape == (1, 384, 384)
    assert np.isfinite(d_jax).all()
    scale = max(float(np.abs(d_ref).max()), 1e-3)
    np.testing.assert_allclose(d_jax / scale, d_ref / scale, atol=2e-4)


def test_dpt_loads_real_checkpoint_manifest():
    """convert_state_dict + dpt_depth against the omnidata DPT-hybrid
    checkpoint layout (names + shapes distilled into
    tests/fixtures/dpt_hybrid_manifest.json; reference depth_tools/dpt.py:355-493
    hybrid backbone).  Builds a synthetic lightning-wrapped torch-layout
    ckpt from the manifest — including real-ckpt extra keys the forward
    must tolerate — and validates the whole load path with eval_shape
    (every param lookup + shape compat, no 600 MB file needed)."""
    import json
    import os

    import jax
    import jax.numpy as jnp

    with open(os.path.join(os.path.dirname(__file__), "fixtures",
                           "dpt_hybrid_manifest.json")) as f:
        man = json.load(f)
    fake = {f"model.{k}": np.zeros(shape, np.float32)
            for k, shape in {**man["required"], **man["optional_extras"]}.items()}
    params = dpt_jax.convert_state_dict({"state_dict": fake,
                                         "epoch": 0, "global_step": 0})
    # required keys all present, OIHW convs transposed to HWIO
    for k, shape in man["required"].items():
        assert k in params, f"loader dropped required key {k}"
        exp = tuple(shape)
        if len(shape) == 4 and k.endswith("weight"):
            exp = (shape[2], shape[3], shape[1], shape[0])
        assert params[k].shape == exp, k
    # the forward consumes the loaded dict without missing-key/shape errors
    out = jax.eval_shape(dpt_jax.dpt_depth, params,
                         jnp.zeros((1, 384, 384, 3), jnp.float32))
    assert out.shape == (1, 384, 384)


def test_dpt_manifest_matches_random_params():
    """random_params stays in lockstep with the checkpoint manifest — a
    rename in either is a load-path break, not a cosmetic change."""
    import json
    import os

    with open(os.path.join(os.path.dirname(__file__), "fixtures",
                           "dpt_hybrid_manifest.json")) as f:
        man = json.load(f)
    _, sd = dpt_jax.random_params()
    assert {k: list(v.shape) for k, v in sd.items()} == man["required"]


def test_dpt_convert_state_dict_prefix_strip():
    """Lightning-style checkpoints ({'state_dict': {'model.xxx': ...}}) are
    unwrapped exactly like the reference loader (extract_depth.py:40-46)."""
    _, sd = dpt_jax.random_params()
    wrapped = {"state_dict": {f"model.{k}": v for k, v in sd.items()}}
    p = dpt_jax.convert_state_dict(wrapped)
    assert set(p.keys()) == set(sd.keys())
    w = np.asarray(p["pretrained.model.patch_embed.backbone.stem.conv.weight"])
    assert w.shape == (7, 7, 3, 64)  # HWIO
