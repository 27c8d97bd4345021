"""Image I/O helpers: HDR envmap loading (relighting), float image dumps.

Reference: `nerf/network.py:135-139` loads relighting envmaps with
cv2.IMREAD_ANYDEPTH; eval dumps kd/ks/normal/env as EXR (`nerf/utils.py:
1368-1377`) — here float dumps use Radiance .hdr / .npy (pyexr-free).
"""

from __future__ import annotations

import numpy as np


def load_hdr(path: str) -> np.ndarray:
    """Load an HDR/EXR envmap as float32 RGB [H,W,3]."""
    import cv2

    img = cv2.imread(path, flags=cv2.IMREAD_ANYDEPTH | cv2.IMREAD_ANYCOLOR)
    if img is None:
        if path.endswith(".exr"):
            # this build of cv2 has no EXR codec; use the bundled pure-numpy one
            from .exr import read_exr

            img = read_exr(path)[..., :3]
            if img.shape[-1] == 1:
                img = np.repeat(img, 3, axis=-1)
            return np.asarray(img, np.float32)
        raise FileNotFoundError(path)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return np.asarray(img, np.float32)


def save_hdr(path: str, img: np.ndarray) -> None:
    import cv2

    bgr = cv2.cvtColor(np.asarray(img, np.float32), cv2.COLOR_RGB2BGR)
    cv2.imwrite(path, bgr)


def save_exr(path: str, img: np.ndarray) -> None:
    """Write a float EXR (pure-numpy codec; cv2 here lacks EXR support)."""
    from .exr import write_exr

    write_exr(path, np.asarray(img, np.float32))


def save_png(path: str, img: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(path)


def save_float(path: str, img: np.ndarray) -> None:
    """Float dump: .exr / .hdr by extension, .npy otherwise."""
    img = np.asarray(img, np.float32)
    if path.endswith(".exr"):
        save_exr(path, img)
    elif path.endswith(".hdr") and img.ndim == 3 and img.shape[-1] == 3:
        save_hdr(path, img)
    else:
        np.save(path if path.endswith(".npy") else path + ".npy", img)
