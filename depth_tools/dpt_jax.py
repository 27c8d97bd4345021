"""Pure-JAX DPT-Hybrid monocular depth net (omnidata checkpoint layout).

Re-implements the reference `depth_tools/dpt.py` (DPTDepthModel,
backbone='vitb_rn50_384', readout='project', hooks [0,1,8,11], lines
76-174 forward_vit/forward_flex, 355-493 hybrid backbone, 619-841
fusion blocks, 842-923 DPT head) as a single functional forward over a
flat parameter dict keyed by the torch checkpoint names — loading
`omnidata_dpt_depth_v2.ckpt` (or any DPT-hybrid depth state_dict) needs
no timm/torch module graph, only `torch.load` for deserialization.

Architecture (input [B,384,384,3], normalized (x-0.5)/0.5):
  ResNetV2-50 stem (weight-standardized convs, GroupNorm32, SAME pad)
    stage0 (3 blocks, 256ch, /4)  -> hook layer_1
    stage1 (4 blocks, 512ch, /8)  -> hook layer_2
    stage2 (9 blocks, 1024ch, /16)
  ViT-B: 1x1 conv proj -> 576 tokens + cls + pos_embed, 12 blocks
    block 8 output  -> layer_3 (project-readout, unflatten 24x24, 1x1 conv)
    block 11 output -> layer_4 (same + 3x3/2 conv -> 12x12)
  scratch 3x3 convs -> 256ch each; RefineNet fusion cascade (x2 bilinear,
  align_corners=True); head conv->up->conv->relu->1x1->relu -> [B,384,384].

All convs run NHWC/HWIO (TPU layout); torch OIHW weights are transposed
once at load time.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

VIT_DIM = 768
N_HEADS = 12
GRID = 24  # 384 / 16
STAGE_BLOCKS = (3, 4, 9)


# ---------------------------------------------------------------------------
# parameter loading


def convert_state_dict(sd) -> Dict[str, jnp.ndarray]:
    """Torch state_dict (omnidata layout) -> flat jnp dict, convs in HWIO.

    Accepts the raw checkpoint dict: unwraps 'state_dict' and strips the
    lightning 'model.' prefix exactly like the reference loader
    (extract_depth.py:40-46)."""
    if "state_dict" in sd:
        sd = {k[6:]: v for k, v in sd["state_dict"].items()}
    out = {}
    for k, v in sd.items():
        a = np.asarray(getattr(v, "numpy", lambda: v)() if hasattr(v, "numpy") else v,
                       dtype=np.float32)
        if a.ndim == 4 and k.endswith("weight"):
            a = a.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        out[k] = jnp.asarray(a)
    return out


def load_dpt(path: str) -> Dict[str, jnp.ndarray]:
    """Load an omnidata DPT-hybrid depth checkpoint (.ckpt/.pth)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return convert_state_dict(ckpt)


# ---------------------------------------------------------------------------
# primitive ops (torch-parity semantics)


def _conv(x, w, b=None, stride=1, padding="SAME"):
    """NHWC conv; padding either 'SAME' (timm dynamic-same: XLA splits the
    pad low=total//2 exactly like timm pad_same) or an int p for torch
    Conv2d(padding=p) symmetric padding."""
    if isinstance(padding, int):
        padding = [(padding, padding)] * 2
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y if b is None else y + b


def _std_conv(x, w, stride=1):
    """timm StdConv2dSame: weight standardization (unbiased=False,
    eps=1e-6) + dynamic SAME padding. No bias in ResNetV2."""
    m = jnp.mean(w, axis=(0, 1, 2), keepdims=True)
    v = jnp.var(w, axis=(0, 1, 2), keepdims=True)
    return _conv(x, (w - m) / jnp.sqrt(v + 1e-6), stride=stride, padding="SAME")


def _group_norm(x, w, b, groups=32, eps=1e-5):
    B, H, W, C = x.shape
    xg = x.reshape(B, H, W, groups, C // groups)
    m = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    v = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
    xg = (xg - m) / jnp.sqrt(v + eps)
    return xg.reshape(B, H, W, C) * w + b


def _layer_norm(x, w, b, eps=1e-6):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.var(x, axis=-1, keepdims=True)
    return (x - m) / jnp.sqrt(v + eps) * w + b


def _max_pool_same(x, k=3, stride=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, stride, stride, 1), "SAME"
    )


def _resize_bilinear(x, out_hw, align_corners=True):
    """F.interpolate(mode='bilinear') parity for NHWC inputs."""
    B, H, W, C = x.shape
    OH, OW = out_hw

    def coords(out_n, in_n):
        i = jnp.arange(out_n, dtype=jnp.float32)
        if align_corners:
            return i * (in_n - 1) / max(out_n - 1, 1)
        return jnp.clip((i + 0.5) * in_n / out_n - 0.5, 0.0, in_n - 1)

    ys, xs = coords(OH, H), coords(OW, W)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    fy = (ys - y0)[None, :, None, None]
    fx = (xs - x0)[None, None, :, None]
    g = lambda yy, xx: x[:, yy][:, :, xx]  # noqa: E731
    top = g(y0, x0) * (1 - fx) + g(y0, x1) * fx
    bot = g(y1, x0) * (1 - fx) + g(y1, x1) * fx
    return top * (1 - fy) + bot * fy


# ---------------------------------------------------------------------------
# backbone


def _bottleneck(p, pre, x, stride):
    """timm resnetv2.Bottleneck (preact=False): 1-3-1 StdConvs with
    GroupNorm+ReLU, post-add ReLU; downsample = 1x1 StdConv + GN."""
    relu = jax.nn.relu
    sc = x
    if f"{pre}.downsample.conv.weight" in p:
        sc = _std_conv(x, p[f"{pre}.downsample.conv.weight"], stride=stride)
        sc = _group_norm(sc, p[f"{pre}.downsample.norm.weight"],
                         p[f"{pre}.downsample.norm.bias"])
    h = relu(_group_norm(_std_conv(x, p[f"{pre}.conv1.weight"]),
                         p[f"{pre}.norm1.weight"], p[f"{pre}.norm1.bias"]))
    h = relu(_group_norm(_std_conv(h, p[f"{pre}.conv2.weight"], stride=stride),
                         p[f"{pre}.norm2.weight"], p[f"{pre}.norm2.bias"]))
    h = _group_norm(_std_conv(h, p[f"{pre}.conv3.weight"]),
                    p[f"{pre}.norm3.weight"], p[f"{pre}.norm3.bias"])
    return relu(h + sc)


def _resnet_stages(p, x):
    """Stem + 3 stages; returns (stage0_out, stage1_out, stage2_out)."""
    bb = "pretrained.model.patch_embed.backbone"
    h = _std_conv(x, p[f"{bb}.stem.conv.weight"], stride=2)
    h = jax.nn.relu(_group_norm(h, p[f"{bb}.stem.norm.weight"],
                                p[f"{bb}.stem.norm.bias"]))
    h = _max_pool_same(h)
    feats = []
    for s, nblk in enumerate(STAGE_BLOCKS):
        for m in range(nblk):
            stride = 2 if (m == 0 and s > 0) else 1
            h = _bottleneck(p, f"{bb}.stages.{s}.blocks.{m}", h, stride)
        feats.append(h)
    return feats


def _vit_block(p, pre, x):
    """timm ViT block: x += attn(LN(x)); x += mlp(LN(x))."""
    B, N, C = x.shape
    h = _layer_norm(x, p[f"{pre}.norm1.weight"], p[f"{pre}.norm1.bias"])
    qkv = h @ p[f"{pre}.attn.qkv.weight"].T + p[f"{pre}.attn.qkv.bias"]
    qkv = qkv.reshape(B, N, 3, N_HEADS, C // N_HEADS).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = jax.nn.softmax((q @ k.transpose(0, 1, 3, 2)) * (C // N_HEADS) ** -0.5, axis=-1)
    h = (attn @ v).transpose(0, 2, 1, 3).reshape(B, N, C)
    h = h @ p[f"{pre}.attn.proj.weight"].T + p[f"{pre}.attn.proj.bias"]
    x = x + h
    h = _layer_norm(x, p[f"{pre}.norm2.weight"], p[f"{pre}.norm2.bias"])
    h = jax.nn.gelu(h @ p[f"{pre}.mlp.fc1.weight"].T + p[f"{pre}.mlp.fc1.bias"],
                    approximate=False)
    h = h @ p[f"{pre}.mlp.fc2.weight"].T + p[f"{pre}.mlp.fc2.bias"]
    return x + h


def _project_readout(p, pre, tokens):
    """ProjectReadout (dpt.py:51-62): concat cls token, Linear+GELU."""
    cls = jnp.broadcast_to(tokens[:, 0:1], tokens[:, 1:].shape)
    h = jnp.concatenate([tokens[:, 1:], cls], axis=-1)
    h = h @ p[f"{pre}.0.project.0.weight"].T + p[f"{pre}.0.project.0.bias"]
    return jax.nn.gelu(h, approximate=False)


def _fusion(p, pre, x, skip=None):
    """FeatureFusionBlock_custom (dpt.py:779-841): optional RCU(skip) add,
    RCU, x2 bilinear (align_corners=True), 1x1 out_conv."""
    relu = jax.nn.relu

    def rcu(u, h):
        o = relu(h)
        o = _conv(o, p[f"{pre}.{u}.conv1.weight"], p[f"{pre}.{u}.conv1.bias"], padding=1)
        o = relu(o)
        o = _conv(o, p[f"{pre}.{u}.conv2.weight"], p[f"{pre}.{u}.conv2.bias"], padding=1)
        return o + h

    if skip is not None:
        x = x + rcu("resConfUnit1", skip)
    x = rcu("resConfUnit2", x)
    x = _resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2), align_corners=True)
    return _conv(x, p[f"{pre}.out_conv.weight"], p[f"{pre}.out_conv.bias"], padding=0)


# ---------------------------------------------------------------------------
# full model


def dpt_depth(p: Dict[str, jnp.ndarray], x: jnp.ndarray) -> jnp.ndarray:
    """DPT-hybrid depth forward: x [B,384,384,3] normalized -> [B,384,384].

    Mirrors DPT.forward (dpt.py:883-901) + DPTDepthModel head (:903-923);
    ReLU head output (non_negative=True)."""
    assert x.shape[1] == x.shape[2] == GRID * 16, "DPT-hybrid runs at 384x384"
    l1, l2, h = _resnet_stages(p, x)  # 96x96x256, 48x48x512, 24x24x1024

    # ViT over the stage-2 features (forward_flex, dpt.py:134-172)
    pm = "pretrained.model"
    h = _conv(h, p[f"{pm}.patch_embed.proj.weight"],
              p[f"{pm}.patch_embed.proj.bias"], padding=0)
    B = h.shape[0]
    tokens = h.reshape(B, GRID * GRID, VIT_DIM)
    cls = jnp.broadcast_to(p[f"{pm}.cls_token"], (B, 1, VIT_DIM))
    tokens = jnp.concatenate([cls, tokens], axis=1) + p[f"{pm}.pos_embed"]
    l3 = l4 = None
    for i in range(12):
        tokens = _vit_block(p, f"{pm}.blocks.{i}", tokens)
        if i == 8:
            l3 = tokens
        if i == 11:
            l4 = tokens

    # readout + reassemble (forward_vit + act_postprocess, dpt.py:76-114)
    def reassemble(tok, pre):
        t = _project_readout(p, pre, tok).reshape(B, GRID, GRID, VIT_DIM)
        return _conv(t, p[f"{pre}.3.weight"], p[f"{pre}.3.bias"], padding=0)

    l3 = reassemble(l3, "pretrained.act_postprocess3")
    l4 = reassemble(l4, "pretrained.act_postprocess4")
    l4 = _conv(l4, p["pretrained.act_postprocess4.4.weight"],
               p["pretrained.act_postprocess4.4.bias"], stride=2, padding=1)

    # scratch 3x3 (bias-free) + RefineNet cascade (dpt.py:883-898)
    rn = [
        _conv(l, p[f"scratch.layer{i}_rn.weight"], padding=1)
        for i, l in ((1, l1), (2, l2), (3, l3), (4, l4))
    ]
    path = _fusion(p, "scratch.refinenet4", rn[3])
    path = _fusion(p, "scratch.refinenet3", path, rn[2])
    path = _fusion(p, "scratch.refinenet2", path, rn[1])
    path = _fusion(p, "scratch.refinenet1", path, rn[0])

    # head (DPTDepthModel, dpt.py:907-915)
    h = _conv(path, p["scratch.output_conv.0.weight"],
              p["scratch.output_conv.0.bias"], padding=1)
    h = _resize_bilinear(h, (h.shape[1] * 2, h.shape[2] * 2), align_corners=True)
    h = jax.nn.relu(_conv(h, p["scratch.output_conv.2.weight"],
                          p["scratch.output_conv.2.bias"], padding=1))
    h = jax.nn.relu(_conv(h, p["scratch.output_conv.4.weight"],
                          p["scratch.output_conv.4.bias"], padding=0))
    return h[..., 0]


def random_params(key=None, dtype=np.float32) -> Dict[str, jnp.ndarray]:
    """Random parameters in the exact omnidata checkpoint layout (torch
    OIHW naming/shapes).  Returns (converted jnp params, raw torch-layout
    state_dict) — for tests and shape validation without the checkpoint."""
    rng = np.random.RandomState(0 if key is None else key)
    sd = {}

    def t(name, *shape, scale=0.05):
        sd[name] = (rng.randn(*shape) * scale).astype(dtype)

    bb = "pretrained.model.patch_embed.backbone"
    t(f"{bb}.stem.conv.weight", 64, 3, 7, 7)
    t(f"{bb}.stem.norm.weight", 64)
    t(f"{bb}.stem.norm.bias", 64)
    chans = [(64, 64, 256), (256, 128, 512), (512, 256, 1024)]
    for s, nblk in enumerate(STAGE_BLOCKS):
        cin, mid, cout = chans[s]
        for m in range(nblk):
            pre = f"{bb}.stages.{s}.blocks.{m}"
            ci = cin if m == 0 else cout
            if m == 0:
                t(f"{pre}.downsample.conv.weight", cout, ci, 1, 1)
                t(f"{pre}.downsample.norm.weight", cout)
                t(f"{pre}.downsample.norm.bias", cout)
            t(f"{pre}.conv1.weight", mid, ci, 1, 1)
            t(f"{pre}.norm1.weight", mid)
            t(f"{pre}.norm1.bias", mid)
            t(f"{pre}.conv2.weight", mid, mid, 3, 3)
            t(f"{pre}.norm2.weight", mid)
            t(f"{pre}.norm2.bias", mid)
            t(f"{pre}.conv3.weight", cout, mid, 1, 1)
            t(f"{pre}.norm3.weight", cout)
            t(f"{pre}.norm3.bias", cout)
    pm = "pretrained.model"
    t(f"{pm}.cls_token", 1, 1, VIT_DIM)
    t(f"{pm}.pos_embed", 1, GRID * GRID + 1, VIT_DIM)
    t(f"{pm}.patch_embed.proj.weight", VIT_DIM, 1024, 1, 1)
    t(f"{pm}.patch_embed.proj.bias", VIT_DIM)
    for i in range(12):
        pre = f"{pm}.blocks.{i}"
        for n in ("norm1", "norm2"):
            t(f"{pre}.{n}.weight", VIT_DIM)
            t(f"{pre}.{n}.bias", VIT_DIM)
        t(f"{pre}.attn.qkv.weight", 3 * VIT_DIM, VIT_DIM)
        t(f"{pre}.attn.qkv.bias", 3 * VIT_DIM)
        t(f"{pre}.attn.proj.weight", VIT_DIM, VIT_DIM)
        t(f"{pre}.attn.proj.bias", VIT_DIM)
        t(f"{pre}.mlp.fc1.weight", 4 * VIT_DIM, VIT_DIM)
        t(f"{pre}.mlp.fc1.bias", 4 * VIT_DIM)
        t(f"{pre}.mlp.fc2.weight", VIT_DIM, 4 * VIT_DIM)
        t(f"{pre}.mlp.fc2.bias", VIT_DIM)
    t(f"{pm}.norm.weight", VIT_DIM)
    t(f"{pm}.norm.bias", VIT_DIM)
    for idx in (3, 4):
        pre = f"pretrained.act_postprocess{idx}"
        t(f"{pre}.0.project.0.weight", VIT_DIM, 2 * VIT_DIM)
        t(f"{pre}.0.project.0.bias", VIT_DIM)
        t(f"{pre}.3.weight", VIT_DIM, VIT_DIM, 1, 1)
        t(f"{pre}.3.bias", VIT_DIM)
    t("pretrained.act_postprocess4.4.weight", VIT_DIM, VIT_DIM, 3, 3)
    t("pretrained.act_postprocess4.4.bias", VIT_DIM)
    for i, cin in ((1, 256), (2, 512), (3, VIT_DIM), (4, VIT_DIM)):
        t(f"scratch.layer{i}_rn.weight", 256, cin, 3, 3)
    for i in (1, 2, 3, 4):
        pre = f"scratch.refinenet{i}"
        for u in ("resConfUnit1", "resConfUnit2"):
            t(f"{pre}.{u}.conv1.weight", 256, 256, 3, 3)
            t(f"{pre}.{u}.conv1.bias", 256)
            t(f"{pre}.{u}.conv2.weight", 256, 256, 3, 3)
            t(f"{pre}.{u}.conv2.bias", 256)
        t(f"{pre}.out_conv.weight", 256, 256, 1, 1)
        t(f"{pre}.out_conv.bias", 256)
    t("scratch.output_conv.0.weight", 128, 256, 3, 3)
    t("scratch.output_conv.0.bias", 128)
    t("scratch.output_conv.2.weight", 32, 128, 3, 3)
    t("scratch.output_conv.2.bias", 32)
    t("scratch.output_conv.4.weight", 1, 32, 1, 1)
    t("scratch.output_conv.4.bias", 1)
    return convert_state_dict(sd), sd
