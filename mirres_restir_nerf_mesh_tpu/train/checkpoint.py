"""Checkpoint save/load (reference Trainer.save_checkpoint/load_checkpoint,
nerf/utils.py:1838-2022): rolling `latest` window, metric-keyed `best`,
stage-tagged filenames, tolerant partial restore."""

from __future__ import annotations

import glob
import os
import pickle
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    workspace: str,
    name: str,
    stage: int,
    step: int,
    state: Any,
    extra: Optional[dict] = None,
    max_keep: int = 2,
    best: bool = False,
) -> str:
    ckpt_dir = os.path.join(workspace, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    payload = {"state": _to_host(state), "step": step, "stage": stage, "extra": extra or {}}
    if best:
        path = os.path.join(ckpt_dir, f"{name}_stage{stage}_best.pkl")
    else:
        path = os.path.join(ckpt_dir, f"{name}_stage{stage}_{step:07d}.pkl")
    with open(path, "wb") as f:
        pickle.dump(payload, f)

    if not best:
        olds = sorted(glob.glob(os.path.join(ckpt_dir, f"{name}_stage{stage}_[0-9]*.pkl")))
        for p in olds[:-max_keep]:
            os.remove(p)
    return path


def find_checkpoint(workspace: str, name: str, stage: int, which: str = "latest") -> Optional[str]:
    ckpt_dir = os.path.join(workspace, "checkpoints")
    if which == "best":
        p = os.path.join(ckpt_dir, f"{name}_stage{stage}_best.pkl")
        return p if os.path.exists(p) else None
    cands = sorted(glob.glob(os.path.join(ckpt_dir, f"{name}_stage{stage}_[0-9]*.pkl")))
    return cands[-1] if cands else None


def load_checkpoint(path: str, template: Any = None) -> Tuple[Any, int, dict]:
    """Tolerant restore matching the reference's non-strict load_checkpoint
    (nerf/utils.py:1938-2022): leaves are matched BY TREE PATH, and a saved
    leaf is only taken when its shape and dtype agree with the template's —
    mismatches (e.g. resuming a post-refine run whose V/F changed) keep the
    template leaf and are reported, never silently restored wrong-shaped."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    state = payload["state"]
    if template is not None:
        saved = {
            jax.tree_util.keystr(kp): leaf
            for kp, leaf in jax.tree_util.tree_flatten_with_path(state)[0]
        }
        flat_t, treedef = jax.tree_util.tree_flatten_with_path(template)
        out, skipped, missing = [], [], []
        for kp, tleaf in flat_t:
            ks = jax.tree_util.keystr(kp)
            sleaf = saved.get(ks)
            if sleaf is None:
                missing.append(ks)
                out.append(tleaf)
                continue
            sarr = np.asarray(sleaf)
            tarr = np.asarray(tleaf)
            if sarr.shape != tarr.shape or sarr.dtype != tarr.dtype:
                skipped.append(f"{ks} {sarr.shape}/{sarr.dtype} != {tarr.shape}/{tarr.dtype}")
                out.append(tleaf)
            else:
                out.append(sarr)
        if skipped or missing:
            print(
                f"[checkpoint] tolerant restore of {path}: "
                f"{len(skipped)} shape/dtype mismatches kept from template "
                f"{skipped[:4]}, {len(missing)} leaves missing {missing[:4]}"
            )
        state = jax.tree_util.tree_unflatten(treedef, out)
    return state, payload["step"], payload.get("extra", {})
