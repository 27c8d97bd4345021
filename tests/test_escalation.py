"""Tracer-budget auto-escalation (VERDICT r3 item 5).

Persistent `uncertain_count > 0` must not stay warn-only: the trainer
escalates k_cap / k_cap_incoherent to the next bucket and rebuilds the
train step (the reference's 64-deep traversal stack never truncates,
nerf/bvhworkers/intersect_test.slang:24).  The convergence half — a larger
budget drives uncertain to 0 on decoy-heavy geometry — is covered by
tests/test_tile_tracer.py::test_uncertain_telemetry_surfaces_through_tracer;
here the LOOP WIRING is driven through the real Trainer.train()."""

import os

import numpy as np
import pytest

from mirres_restir_nerf_mesh_tpu.config import Config, finalize
from mirres_restir_nerf_mesh_tpu.data.synthetic import make_synthetic_dataset
from mirres_restir_nerf_mesh_tpu.export.meshio import write_ply
from mirres_restir_nerf_mesh_tpu.export.meshops import decimate, marching_tets
from mirres_restir_nerf_mesh_tpu.models.nerf import NeRFSpec
from mirres_restir_nerf_mesh_tpu.train.trainer import Trainer

SPEC = NeRFSpec(
    bound=1.0, hidden_dim=16, hidden_dim_color=16, geo_feat_dim=7,
    grid_levels=4, grid_log2_hashmap_size=12, grid_desired_resolution=64,
)


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    n = 24
    ax = np.linspace(-1, 1, n, dtype=np.float32)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    field = 0.5 - np.sqrt(X ** 2 + Y ** 2 + Z ** 2)
    v, t = marching_tets(field, 0.0, origin=(-1, -1, -1), spacing=(2 / (n - 1),) * 3)
    v, t = decimate(v, t, 200)
    mesh_path = str(tmp_path_factory.mktemp("mesh") / "sphere.ply")
    write_ply(mesh_path, v, t)
    data = make_synthetic_dataset(n_frames=2, H=16, W=16, bound=1.0)
    return mesh_path, data


def test_trainer_escalates_tracer_budget_on_persistent_uncertainty(scene, tmp_path):
    mesh_path, data = scene
    cfg = finalize(Config(
        workspace=str(tmp_path / "esc"), stage=1, mesh=mesh_path,
        iters=200, bound=1.0, use_brdf=True, use_restir=True, spp=1,
        pt_bounces=1, env_h=16, env_w=32,
        restir_light_tile_count=4, restir_light_tile_size=64,
        restir_initial_light_samples=8, restir_spatial_neighbors=2,
        restir_spatial_radius=4.0, restir_neighbor_offset_count=128,
        data_parallel=False, refine=False, n_ckpt=1, n_eval=1,
    ))
    tr = Trainer("ngp", cfg, data, nerf_spec=SPEC)
    k0, ki0 = tr.static.k_cap, tr.static.k_cap_incoherent

    # fake step: the tracer persistently reports budget truncation (the loop
    # checks every 100 steps; two consecutive strikes trigger escalation).
    # No real stage-1 graph compiles — the rebuilt jitted step is lazy.
    def fake_step(state, batch, key):
        return state, {"uncertain_count": np.float32(7.0),
                       "loss": np.float32(0.0)}

    tr.train_step = fake_step
    tr.train()

    # staged escalation (ADVICE r4): the INCOHERENT budgets grow first —
    # they truncate first and oversized coherent queues are pure waste
    assert tr.static.k_cap == k0
    assert tr.static.k_cap_incoherent == 2 * ki0
    assert tr._uncertain_strikes == 0  # reset after the rebuild
    log = open(tr.log_path).read()
    assert "escalating candidate budgets" in log

    # a SECOND escalation (incoherent now a bucket ahead) grows both pairs
    assert tr._escalate_tracer_budget() is True
    assert tr.static.k_cap == 2 * k0
    assert tr.static.k_cap_incoherent == 4 * ki0

    # escalated budgets persist across checkpoint save/resume (VERDICT r4
    # item 8): a crash-resume must not restart at config defaults
    tr.save_checkpoint()
    tr2 = Trainer("ngp", cfg, data, nerf_spec=SPEC)
    assert tr2.static.k_cap == 2 * k0
    assert tr2.static.k_cap_incoherent == 4 * ki0
    log2 = open(tr2.log_path).read()
    assert "restored escalated tracer budgets" in log2


def test_escalation_caps_out(scene, tmp_path):
    mesh_path, data = scene
    cfg = finalize(Config(
        workspace=str(tmp_path / "cap"), stage=1, mesh=mesh_path,
        iters=1, bound=1.0, use_brdf=True, use_restir=True, spp=1,
        pt_bounces=1, env_h=16, env_w=32, data_parallel=False,
        refine=False, n_ckpt=1, n_eval=1,
    ))
    tr = Trainer("ngp", cfg, data, nerf_spec=SPEC)
    # escalate until the cap: grow-only, bounded, never infinite recompiles
    for _ in range(12):
        if not tr._escalate_tracer_budget(cap=512):
            break
    assert tr.static.k_cap == 512
    assert tr.static.k_cap_incoherent == 512
    assert tr._escalate_tracer_budget(cap=512) is False
