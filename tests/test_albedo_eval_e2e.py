"""Albedo-eval workflow end-to-end (VERDICT r1 item 4b): a short stage-1
training run, Trainer.test() artifact dumps (kd/ks/normal/diffuse/specular
EXRs + rgb/brdf/depth pngs, reference nerf/utils.py:1368-1377), then
albedo_eval.py consumes the dumps against GT albedo."""

import glob
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from mirres_restir_nerf_mesh_tpu.config import Config, finalize
from mirres_restir_nerf_mesh_tpu.data.synthetic import make_synthetic_dataset
from mirres_restir_nerf_mesh_tpu.models.nerf import NeRFSpec
from mirres_restir_nerf_mesh_tpu.train.trainer import Trainer

SPEC = NeRFSpec(
    bound=1.0, hidden_dim=16, hidden_dim_color=16, geo_feat_dim=7,
    grid_levels=4, grid_log2_hashmap_size=12, grid_desired_resolution=64,
)


def test_stage1_test_dumps_feed_albedo_eval(tmp_path):
    ws = tmp_path / "ws"
    os.makedirs(ws)
    sys.path.insert(0, os.path.dirname(__file__))
    from test_antialias import make_sphere
    from mirres_restir_nerf_mesh_tpu.export.meshio import write_ply

    v, t = make_sphere()
    write_ply(str(ws / "mesh_0.ply"), v, t)

    data = make_synthetic_dataset(n_frames=2, H=24, W=24, bound=1.0)
    cfg = finalize(Config(
        workspace=str(ws), stage=1, iters=5, spp=1, pt_bounces=1,
        use_brdf=True, use_restir=False, ssaa=1,
        lambda_lap=0.0, lambda_normal=0.0, lambda_edgelen=0.0,
        data_parallel=False, ckpt="scratch", n_ckpt=1, n_eval=1,
    ))
    tr = Trainer("ngp", cfg, data, nerf_spec=SPEC)
    tr.train(max_steps=5)
    tr.test(out_dir=str(ws / "results"))

    # the reference's per-frame artifact set exists
    res = str(ws / "results")
    for suffix in ("_rgb.png", "_brdf.png", "_depth.png", "_kd.exr", "_ks.exr",
                   "_normal.exr", "_diffuse.exr", "_specular.exr"):
        files = glob.glob(os.path.join(res, f"*0000{suffix}"))
        assert files, f"missing dump {suffix}"
    assert glob.glob(os.path.join(res, "*env_map.exr"))

    # GT albedo EXRs (use the dumped kd itself scaled by 0.5: albedo_eval's
    # median-scale correction must recover PSNR = inf-ish on a scaled copy)
    from mirres_restir_nerf_mesh_tpu.utils.image_io import load_hdr, save_exr

    gt_dir = tmp_path / "gt"
    os.makedirs(gt_dir)
    for i, f in enumerate(sorted(glob.glob(os.path.join(res, "*_kd.exr")))):
        kd = load_hdr(f)
        save_exr(str(gt_dir / f"albedo_{i:04d}.exr"), np.clip(kd * 0.5, 0, 1))

    # in-process (a subprocess would re-import jax through the axon
    # sitecustomize and compile via the TPU tunnel — minutes of latency)
    out_json = str(tmp_path / "albedo_metrics.json")
    import albedo_eval as ae

    argv = sys.argv
    sys.argv = ["albedo_eval.py", "--pred_dir", res, "--gt_dir", str(gt_dir),
                "--out", out_json]
    try:
        ae.main()
    finally:
        sys.argv = argv
    with open(out_json) as f:
        metrics = json.load(f)
    # scale correction makes the scaled copy near-perfect
    assert metrics["psnr"] > 35, metrics


def test_test_mode_eval_spp_override_nvs_and_relight(tmp_path):
    """The --test NVS/relight eval protocol through the REAL Trainer path
    (VERDICT r4 item 3): test-mode renders override spp with eval_spp (the
    reference's 512-spp converged NVS, readme.md:93) and, with an envmap,
    relight_spp + albedo scale (readme.md:111) — asserted via the jit cache
    key the Trainer actually rendered with, and via Trainer.evaluate metrics
    computed from those renders (utils.py:477-708 twin meters)."""
    ws = tmp_path / "ws"
    os.makedirs(ws)
    sys.path.insert(0, os.path.dirname(__file__))
    from test_antialias import make_sphere
    from mirres_restir_nerf_mesh_tpu.export.meshio import write_ply
    from mirres_restir_nerf_mesh_tpu.utils.image_io import save_hdr

    v, t = make_sphere()
    write_ply(str(ws / "mesh_0.ply"), v, t)

    data = make_synthetic_dataset(n_frames=2, H=24, W=24, bound=1.0)
    cfg = finalize(Config(
        workspace=str(ws), stage=1, iters=2, spp=1, pt_bounces=1,
        use_brdf=True, use_restir=False, ssaa=1,
        lambda_lap=0.0, lambda_normal=0.0, lambda_edgelen=0.0,
        data_parallel=False, ckpt="scratch", n_ckpt=1, n_eval=1,
        test=True, eval_spp=4, relight_spp=2,
    ))
    tr = Trainer("ngp", cfg, data, nerf_spec=SPEC)

    # --- NVS branch: eval through Trainer.evaluate at the eval_spp override
    res = tr.evaluate(max_frames=1)
    assert np.isfinite(res["psnr"]) and np.isfinite(res["psnr_brdf"]), res
    assert "ssim_brdf" in res and "lpips_brdf" in res, res
    # the jitted render the Trainer used really ran at spp=eval_spp
    assert tr._eval_render_key[2] == 4, tr._eval_render_key
    assert tr._eval_render_key[3] is False  # no relight env

    # --- relight branch: envmap_path set -> relight_spp + albedo scale
    env = np.full((8, 16, 3), 0.3, np.float32)
    env[2, 4] = (4.0, 3.0, 2.0)
    env_path = str(tmp_path / "probe.hdr")
    save_hdr(env_path, env)
    cfg2 = finalize(Config(
        workspace=str(ws), stage=1, iters=2, spp=1, pt_bounces=1,
        use_brdf=True, use_restir=False, ssaa=1,
        lambda_lap=0.0, lambda_normal=0.0, lambda_edgelen=0.0,
        data_parallel=False, ckpt="scratch", n_ckpt=1, n_eval=1,
        test=True, eval_spp=4, relight_spp=2, envmap_path=env_path,
        albedo_scale_x=1.1, albedo_scale_y=0.9, albedo_scale_z=1.0,
    ))
    tr2 = Trainer("ngp", cfg2, data, nerf_spec=SPEC)
    res2 = tr2.evaluate(max_frames=1)
    assert np.isfinite(res2["psnr_brdf"]), res2
    assert tr2._eval_render_key[2] == 2, tr2._eval_render_key  # relight_spp
    assert tr2._eval_render_key[3] is True   # relight env engaged
    assert tr2._eval_render_key[4] is True   # albedo scale engaged
