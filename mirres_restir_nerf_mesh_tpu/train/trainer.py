"""Top-level Trainer: the reference `nerf/utils.py:709-2022` orchestration
rebuilt around jitted functional steps.

Public surface (parity with the reference Trainer):
  train / evaluate / test / save_mesh / export_stage1 /
  save_checkpoint / load_checkpoint
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.provider import FrameData, RayDataset
from ..models import nerf as nerf_model
from ..models.material import MaterialSpec, sample_material
from ..models.nerf import NeRFSpec
from ..render.stage1 import Stage1Static, act_voffsets
from . import checkpoint as ckpt
from . import stage0, stage1
from .losses import build_topology
from .metrics import psnr as psnr_fn
from .metrics import ssim as ssim_fn


class Trainer:
    def __init__(self, name: str, cfg: Config, train_data: FrameData,
                 workspace: Optional[str] = None,
                 nerf_spec: Optional[NeRFSpec] = None):
        self.name = name
        self.cfg = cfg
        self.workspace = workspace or cfg.workspace
        os.makedirs(self.workspace, exist_ok=True)
        self.log_path = os.path.join(self.workspace, f"log_{name}.txt")
        from ..utils.profiling import MetricsWriter

        self.metrics_writer = MetricsWriter(os.path.join(self.workspace, f"metrics_{name}.jsonl"))

        compute_dtype = jnp.bfloat16 if cfg.fp16 else jnp.float32
        self.nerf_spec = nerf_spec or NeRFSpec(
            bound=cfg.bound, sdf=cfg.sdf, compute_dtype=compute_dtype,
            grid_levels=cfg.hash_levels,
            grid_log2_hashmap_size=cfg.hash_log2_size,
            grid_desired_resolution=cfg.hash_max_res,
        )
        self.sampler = RayDataset(train_data, bound=cfg.bound, background=cfg.background)
        self.train_data = train_data
        self.key = jax.random.PRNGKey(cfg.seed)
        self.global_step = 0
        self.best_metric = -1e9
        # consecutive logged checks with uncertain_count > 0 (tracer-budget
        # auto-escalation, _escalate_tracer_budget)
        self._uncertain_strikes = 0

        # TPU-native data parallelism (reference DDP surface,
        # nerf/utils.py:761-764): on automatically when >1 device is visible
        self.mesh = None
        if cfg.data_parallel and len(jax.devices()) > 1:
            from ..parallel.mesh import make_mesh

            n_dev = len(jax.devices())
            if cfg.stage == 0 and cfg.num_rays % n_dev != 0:
                cfg.num_rays = ((cfg.num_rays + n_dev - 1) // n_dev) * n_dev
            self.mesh = make_mesh((n_dev,), ("data",))
            self.log(f"[dp] data-parallel over {n_dev} devices")

        # colmap sparse points give a tighter scene AABB (main.py:279-280)
        pts = getattr(train_data, "pts3d", None)
        if cfg.stage == 0 and pts is not None and len(pts) > 0 and cfg.scene_aabb is None:
            lo = np.clip(np.percentile(pts, 0.5, axis=0), -cfg.bound, cfg.bound)
            hi = np.clip(np.percentile(pts, 99.5, axis=0), -cfg.bound, cfg.bound)
            cfg.scene_aabb = tuple(np.concatenate([lo, hi]).tolist())
            self.log(f"[aabb] from sparse points: {cfg.scene_aabb}")

        if cfg.stage == 0:
            self.state = stage0.init_state(self._next_key(), cfg, self.nerf_spec)
            self.train_step = stage0.make_train_step(
                cfg, self.nerf_spec, self.sampler, mesh=self.mesh
            )
            self.occ_update = stage0.make_occ_update(cfg, self.nerf_spec)
            self.render_fn = stage0.make_render_fn(cfg, self.nerf_spec)
            if cfg.mark_untrained:
                # frustum-cull never-seen grid cells (-O preset;
                # reference utils.py:1290-1291 -> renderer.py:1438)
                from ..ops.occupancy import mark_untrained_grid

                occ = mark_untrained_grid(
                    self.state.occ, jnp.asarray(train_data.poses),
                    jnp.asarray(train_data.intrinsics),
                    train_data.W, train_data.H, cfg.bound,
                )
                self.state = self.state._replace(occ=occ)
                n_marked = float(jnp.sum(occ.density_grid < 0))
                self.log(f"[mark_untrained] {int(n_marked)} cells outside all frustums")
            if cfg.ckpt != "scratch":
                self._try_resume(stage=0)
            self._maybe_replicate()
        else:
            self._init_stage1()
            self._maybe_replicate()

    # ------------------------------------------------------------------ utils
    def _maybe_replicate(self) -> None:
        if self.mesh is not None:
            from ..parallel.mesh import replicate

            self.state = replicate(self.state, self.mesh)

    def _next_key(self) -> jax.Array:
        self.key, sub = jax.random.split(self.key)
        return sub

    def log(self, msg: str) -> None:
        print(msg)
        with open(self.log_path, "a") as f:
            f.write(msg + "\n")

    # ------------------------------------------------------------- stage 1 init
    def _init_stage1(self) -> None:
        cfg = self.cfg
        from ..export.meshio import read_ply

        mesh_path = cfg.mesh or os.path.join(self.workspace, "mesh_0.ply")
        upd = os.path.join(self.workspace, "mesh_0_updated.ply")
        if os.path.exists(upd):
            mesh_path = upd  # refined meshes reload preferentially (renderer.py:152-156)
        verts, tris = read_ply(mesh_path)
        self.base_verts = verts
        self.tris = tris
        self.topo = build_topology(tris, verts.shape[0])

        mat_spec = MaterialSpec(
            bound=cfg.bound,
            min_vals=tuple(cfg.kd_min[:3]) + tuple(cfg.ks_min),
            max_vals=tuple(cfg.kd_max[:3]) + tuple(cfg.ks_max),
            compute_dtype=jnp.bfloat16 if cfg.fp16 else jnp.float32,
        )
        ssaa = max(int(cfg.ssaa), 1)
        H, W = self.train_data.H * ssaa, self.train_data.W * ssaa
        # pixel-chunked fallback: the train step renders a row band
        self.stage1_rows = int(cfg.stage1_rows)
        if self.stage1_rows > 0:
            assert self.train_data.H % self.stage1_rows == 0, (
                "stage1_rows must divide the image height"
            )
            H = self.stage1_rows * ssaa
        de = 4 if cfg.use_restir else 0
        self.static = Stage1Static(
            tris=jnp.asarray(tris), nerf_spec=self.nerf_spec, mat_spec=mat_spec,
            spp=cfg.spp, bounces=cfg.pt_bounces, use_restir=cfg.use_restir,
            H=H, W=W,
            restir_tiles=cfg.restir_light_tile_count,
            restir_tile_size=cfg.restir_light_tile_size,
            restir_light_samples=cfg.restir_initial_light_samples,
            restir_brdf_samples=cfg.restir_initial_brdf_samples,
            restir_neighbors=cfg.restir_spatial_neighbors,
            restir_radius=cfg.restir_spatial_radius,
            restir_offsets=cfg.restir_neighbor_offset_count,
            restir_history=float(cfg.restir_max_history_length),
            denoise_iters=de, denoise_bilateral=cfg.use_bi_de,
            enable_offset_nerf_grad=cfg.enable_offset_nerf_grad,
            compute_normal_ao=cfg.use_brdf and cfg.lambda_extra_kd > 0,
            ssaa=ssaa,
            shard_mesh=self.mesh,
            compact_chunks=cfg.compact_chunks,
        )

        # stage-1 bootstraps from stage-0 best (utils.py:871-873)
        nerf_params = nerf_model.init_nerf(self._next_key(), self.nerf_spec)
        p = ckpt.find_checkpoint(self.workspace, self.name, 0, "best") or ckpt.find_checkpoint(
            self.workspace, self.name, 0, "latest"
        )
        if p:
            st0, _, _ = ckpt.load_checkpoint(p)
            ema = st0.ema_params if hasattr(st0, "ema_params") else st0[2]
            nerf_params = jax.tree_util.tree_map(jnp.asarray, ema)
            self.log(f"[stage1] loaded stage-0 field from {p}")

        self.state = stage1.init_state(self._next_key(), self.cfg, self.static, nerf_params, verts.shape[0])
        self.train_step = stage1.make_train_step(
            self.cfg, self.static, self.base_verts, self.topo, mesh=self.mesh
        )
        self._face_err_acc = np.zeros(tris.shape[0], np.float64)
        self._face_cnt_acc = np.zeros(tris.shape[0], np.float64)
        if cfg.ckpt != "scratch":
            self._try_resume(stage=1)

    def _refine_mesh(self) -> None:
        """Error-driven subdivide/decimate + state rebuild
        (reference utils.py:1622-1642 -> renderer.py:230-316)."""
        import dataclasses

        from ..export.meshio import write_ply
        from ..export.refine import refine_and_decimate

        cfg = self.cfg
        errs = np.where(self._face_cnt_acc > 0, self._face_err_acc / np.maximum(self._face_cnt_acc, 1), 0.0)
        verts_cur = np.asarray(jnp.asarray(self.base_verts) + act_voffsets(self.state.params.offsets))
        v2, t2 = refine_and_decimate(
            verts_cur, self.tris, errs,
            decimate_ratio=cfg.refine_decimate_ratio,
            min_edge_len=cfg.refine_size,
        )
        self.log(f"[refine] mesh {self.tris.shape[0]} -> {t2.shape[0]} faces")
        write_ply(os.path.join(self.workspace, "mesh_0_updated.ply"), v2, t2)

        self.base_verts = v2
        self.tris = t2
        self.topo = build_topology(t2, v2.shape[0])
        self.static = dataclasses.replace(self.static, tris=jnp.asarray(t2))
        params = self.state.params._replace(offsets=jnp.zeros((v2.shape[0], 3), jnp.float32))
        opt = stage1.make_optimizer(cfg)
        self.state = stage1.Stage1State(params=params, opt_state=opt.init(params), step=self.state.step)
        self.train_step = stage1.make_train_step(
            cfg, self.static, self.base_verts, self.topo, mesh=self.mesh
        )
        self._face_err_acc = np.zeros(t2.shape[0], np.float64)
        self._face_cnt_acc = np.zeros(t2.shape[0], np.float64)
        self._maybe_replicate()

    def _try_resume(self, stage: int) -> None:
        which = "best" if self.cfg.ckpt == "best" else "latest"
        p = self.cfg.ckpt if os.path.exists(str(self.cfg.ckpt)) else ckpt.find_checkpoint(
            self.workspace, self.name, stage, which
        )
        if p:
            st, step, extra = ckpt.load_checkpoint(p, self.state)
            self.state = jax.tree_util.tree_map(jnp.asarray, st)
            self.global_step = step
            self.log(f"[ckpt] resumed from {p} at step {step}")
            # escalated tracer budgets survive resume (otherwise a crash
            # restarts at config defaults and re-pays N strike-steps of
            # uncertain frames before re-escalating)
            budgets = extra.get("tracer_budgets")
            if stage == 1 and budgets and budgets != self._tracer_budgets():
                import dataclasses

                grown = {
                    k: max(int(v), getattr(self.static, k))
                    for k, v in budgets.items()
                }
                self.static = dataclasses.replace(self.static, **grown)
                self.train_step = stage1.make_train_step(
                    self.cfg, self.static, self.base_verts, self.topo,
                    mesh=self.mesh,
                )
                self.log(f"[ckpt] restored escalated tracer budgets {grown}")

    # ------------------------------------------------------------------ train
    def train(
        self,
        max_steps: Optional[int] = None,
        valid_data: Optional[FrameData] = None,
        eval_max_frames: int = 8,
    ) -> None:
        """Training loop; when `valid_data` is given, runs evaluate() on the
        val split every eval interval and keys the best checkpoint on the val
        metric (reference nerf/utils.py:1885-1922) instead of the train-batch
        PSNR fallback."""
        cfg = self.cfg
        steps = max_steps or cfg.iters
        eval_every = max(steps // max(cfg.n_eval, 1), 1)
        save_every = max(steps // max(cfg.n_ckpt, 1), 1)
        t0 = time.time()
        last = {}

        start = self.global_step
        for i in range(start, steps):
            sub = self._next_key()
            if cfg.stage == 0 and i % cfg.update_extra_interval == 0:
                self.state = self.occ_update(self.state, self._next_key())
            if cfg.stage == 0:
                self.state, aux = self.train_step(self.state, sub)
            else:
                batch = self._stage1_batch(i)
                self.state, aux = self.train_step(self.state, batch, sub)
                if cfg.refine:
                    self._face_err_acc += np.asarray(aux["face_err"])
                    self._face_cnt_acc += np.asarray(aux["face_cnt"])
                    if (i + 1) in cfg.refine_steps:
                        self._refine_mesh()
            self.global_step = i + 1

            if (i + 1) % 100 == 0 or i == steps - 1:
                last = {
                    k: float(v) for k, v in aux.items() if getattr(v, "ndim", 0) == 0
                }
                if cfg.stage == 0 and cfg.adaptive_num_rays:
                    self._adapt_num_rays(last.get("num_points", 0.0))
                if last.get("uncertain_count", 0.0) > 0:
                    # tile-tracer budget truncation: results may silently miss
                    # hits.  Persisting across checks, the budgets escalate
                    # automatically to the next bucket (one recompile,
                    # grow-only — the _adapt_num_rays pattern; the reference's
                    # 64-deep traversal stack never truncates,
                    # intersect_test.slang:24)
                    self._uncertain_strikes += 1
                    self.log(
                        f"[tracer] WARNING: {last['uncertain_count']:.0f} rays "
                        "exceeded the candidate budget this step "
                        f"(strike {self._uncertain_strikes})"
                    )
                    if (self._uncertain_strikes >= 2 and cfg.stage == 1
                            and not self._escalate_tracer_budget()):
                        self.log(
                            "[tracer] budgets at cap — results may remain "
                            "approximate on this geometry"
                        )
                else:
                    self._uncertain_strikes = 0
                rate = (i + 1 - start) / max(time.time() - t0, 1e-9)
                self.log(
                    f"[train] step {i+1}/{steps} loss={last.get('loss', 0):.5f} "
                    f"psnr={last.get('psnr', 0):.2f} it/s={rate:.2f}"
                )
                self.metrics_writer.write(i + 1, it_per_s=rate, **last)
            if (i + 1) % save_every == 0 or i == steps - 1:
                self.save_checkpoint()
            if (i + 1) % eval_every == 0:
                if valid_data is not None:
                    ev = self.evaluate(valid_data, max_frames=eval_max_frames)
                    metric = ev.get("psnr_brdf", ev.get("psnr", 0.0))
                    self.metrics_writer.write(i + 1, **{f"val_{k}": v for k, v in ev.items()})
                else:
                    metric = last.get("psnr_brdf", last.get("psnr", 0.0))
                if metric > self.best_metric:
                    self.best_metric = metric
                    self.save_checkpoint(best=True)

    def _escalate_tracer_budget(self, cap: int = 4096) -> bool:
        """Grow candidate budgets to the next power-of-two bucket and rebuild
        the stage-1 train step (one recompile, cached thereafter).  Returns
        False when already at cap.  Exactness auto-repair for thin /
        foliage-heavy geometry where the static candidate budget truncates
        (the reference's stack traversal never does, intersect_test.slang:24).

        Staged: the INCOHERENT budgets escalate first — they truncate first
        (CLAUDE.md r4: the work-queue budget bites on incoherent launches
        before k_cap does) and oversized coherent queues are pure wasted
        frame time.  Only when the incoherent pair is already a bucket ahead
        does a strike also grow the coherent pair."""
        import dataclasses

        st = self.static
        if (st.k_cap >= cap and st.k_cap_incoherent >= cap
                and st.queue_avg >= cap and st.queue_avg_incoherent >= cap):
            return False
        n_prior = getattr(self, "_n_escalations", 0)
        self._n_escalations = n_prior + 1
        grow_coherent = (n_prior % 2 == 1) or (
            st.k_cap_incoherent >= cap and st.queue_avg_incoherent >= cap
        )
        self.static = dataclasses.replace(
            st,
            k_cap=min(st.k_cap * 2, cap) if grow_coherent else st.k_cap,
            k_cap_incoherent=min(st.k_cap_incoherent * 2, cap),
            # the work-queue budget truncates before k_cap does (W_cap =
            # tiles * queue_avg, ops/tile_tracer.py _run_queue) — grow it in
            # lockstep or the k_cap bump alone cannot clear the uncertainty
            queue_avg=min(st.queue_avg * 2, cap) if grow_coherent else st.queue_avg,
            queue_avg_incoherent=min(st.queue_avg_incoherent * 2, cap),
        )
        self.log(
            f"[tracer] escalating candidate budgets: k_cap {st.k_cap} -> "
            f"{self.static.k_cap}, k_cap_incoherent {st.k_cap_incoherent} -> "
            f"{self.static.k_cap_incoherent}, queue_avg "
            f"{st.queue_avg}/{st.queue_avg_incoherent} -> "
            f"{self.static.queue_avg}/{self.static.queue_avg_incoherent} "
            "(rebuilding train step)"
        )
        self.train_step = stage1.make_train_step(
            self.cfg, self.static, self.base_verts, self.topo, mesh=self.mesh
        )
        self._uncertain_strikes = 0
        return True

    def _tracer_budgets(self) -> dict:
        st = self.static
        return {
            "k_cap": st.k_cap, "k_cap_incoherent": st.k_cap_incoherent,
            "queue_avg": st.queue_avg,
            "queue_avg_incoherent": st.queue_avg_incoherent,
        }

    def _adapt_num_rays(self, num_points: float) -> bool:
        """Reference adaptive_num_rays (-O, utils.py:1133-1134): grow the ray
        batch so each step fills the num_points sample budget once the
        trained occupancy thins the per-ray sample count.  Static shapes mean
        a changed batch is a recompile, so growth is bucketed (power-of-two
        multiples of the starting count, grow-only, capped) — at most a
        handful of recompiles per run, each cached thereafter."""
        cfg = self.cfg
        if num_points <= 0:
            return False
        cap = max(cfg.num_rays, 2 ** 14)
        desired = cfg.num_rays * cfg.num_points / num_points
        grew = False
        while cfg.num_rays * 2 <= min(desired, cap):
            cfg.num_rays *= 2  # doubling keeps DP divisibility
            grew = True
        if grew:
            self.log(
                f"[adaptive] num_points {num_points:.0f}/{cfg.num_points} -> "
                f"num_rays {cfg.num_rays} (rebuilding train step)"
            )
            self.train_step = stage0.make_train_step(
                cfg, self.nerf_spec, self.sampler, mesh=self.mesh
            )
        return grew

    def _stage1_batch(self, i: int) -> Dict[str, jnp.ndarray]:
        ssaa = max(int(self.cfg.ssaa), 1)
        f = self.sampler.frame_rays(
            i % self.train_data.num_frames, ssaa=ssaa
        )
        batch = {
            "rays_o": f["rays_o"], "rays_d": f["rays_d"],
            "pixels": f["pixels"], "alpha": f["alpha"],
        }
        if self.stage1_rows > 0:
            # row-band chunking: slice a contiguous band (image-space passes
            # stay valid inside the band); bands cycle across steps
            Hb = self.train_data.H
            n_bands = Hb // self.stage1_rows
            b = (i // max(self.train_data.num_frames, 1)) % n_bands
            Ws = self.train_data.W * ssaa
            r0 = b * self.stage1_rows
            sl_hi = slice(r0 * ssaa * Ws, (r0 + self.stage1_rows) * ssaa * Ws)
            sl_lo = slice(r0 * self.train_data.W, (r0 + self.stage1_rows) * self.train_data.W)
            batch = {
                "rays_o": batch["rays_o"][sl_hi], "rays_d": batch["rays_d"][sl_hi],
                "pixels": batch["pixels"][sl_lo], "alpha": batch["alpha"][sl_lo],
            }
        return batch

    # ----------------------------------------------------------------- eval
    def evaluate(
        self, data: Optional[FrameData] = None, max_frames: Optional[int] = None
    ) -> Dict[str, float]:
        """Twin meters: NeRF image AND BRDF image from ONE render per frame
        (reference PSNRMeter + PSNRMeter_brdf, utils.py:477-708). With
        --eval_use_gt_mask the GT alpha masks BOTH images before metrics."""
        sampler = RayDataset(data, bound=self.cfg.bound) if data is not None else self.sampler
        n = sampler.data.num_frames if max_frames is None else min(
            sampler.data.num_frames, max_frames
        )
        lp = self._lpips()
        acc: Dict[str, List[float]] = {}
        for i in range(n):
            outs, gt = self._render_eval_outputs(sampler, i)
            img = outs["image"]
            brdf = outs.get("image_brdf")
            if self.cfg.eval_use_gt_mask and sampler.data.images.shape[-1] == 4:
                m = np.asarray(sampler.data.images[i, ..., 3:4]) > 0.5
                img = np.where(m, img, 1.0)
                gt = np.where(m, gt, 1.0)
                if brdf is not None:
                    brdf = np.where(m, brdf, 1.0)
            gt_j = jnp.asarray(gt)
            acc.setdefault("psnr", []).append(float(psnr_fn(jnp.asarray(img), gt_j)))
            acc.setdefault("ssim", []).append(float(ssim_fn(jnp.asarray(img), gt_j)))
            if lp is not None:
                acc.setdefault("lpips", []).append(lp(img, gt))
            if brdf is not None:
                acc.setdefault("psnr_brdf", []).append(float(psnr_fn(jnp.asarray(brdf), gt_j)))
                acc.setdefault("ssim_brdf", []).append(float(ssim_fn(jnp.asarray(brdf), gt_j)))
                if lp is not None:
                    acc.setdefault("lpips_brdf", []).append(lp(brdf, gt))
        res = {k: float(np.mean(v)) for k, v in acc.items()}
        self.log(f"[eval] {res}")
        return res

    def _lpips(self):
        if not hasattr(self, "_lpips_cache"):
            from .metrics import lpips_fn

            self._lpips_cache = lpips_fn(self.cfg.lpips_weights)
            kind = getattr(self._lpips_cache, "kind", "?")
            if kind != "vgg":
                self.log(f"[lpips] using '{kind}' fallback (no VGG weights in image)")
        return self._lpips_cache

    def _downsample(self, x: np.ndarray, H: int, W: int, ssaa: int) -> np.ndarray:
        x = np.asarray(x, np.float32)
        c = x.shape[-1] if x.ndim > 1 else 1
        x = x.reshape(H * ssaa, W * ssaa, -1)
        if ssaa > 1:
            x = x.reshape(H, ssaa, W, ssaa, -1).mean(axis=(1, 3))
        return x if c > 1 else x[..., 0]

    def _render_eval_outputs(self, sampler: RayDataset, idx: int):
        """Render one frame; returns ({name: [H,W,C] np array}, gt)."""
        ssaa = max(int(self.cfg.ssaa), 1) if self.cfg.stage == 1 else 1
        f = sampler.frame_rays(idx, ssaa=ssaa)
        H, W = sampler.H, sampler.W
        gt = np.asarray(f["pixels"]).reshape(H, W, 3)
        if self.cfg.stage == 0:
            img, depth = stage0.render_frame(
                self.state, self.render_fn, f["rays_o"], f["rays_d"], H, W
            )
            return {"image": np.clip(np.asarray(img), 0, 1), "depth": np.asarray(depth)}, gt

        from ..render.stage1 import render_stage1

        # relighting: swap envmap, scale albedo, apply exposure
        # (reference renderer.py:1026,1087-1089,1126)
        relight_env = None
        albedo_scale = None
        exposure = None
        if self.cfg.test and self.cfg.envmap_path != "None":
            relight_env = self._relight_env()
            albedo_scale = jnp.array(
                [self.cfg.albedo_scale_x, self.cfg.albedo_scale_y, self.cfg.albedo_scale_z]
            )
        if self.cfg.use_hdr:
            exposure = jnp.asarray(2.0 ** self.cfg.exposure)

        static = self.static
        import dataclasses

        if getattr(self, "stage1_rows", 0) > 0:
            static = dataclasses.replace(
                static, H=sampler.H * ssaa
            )  # eval renders full frames even when training is row-banded
        # test-mode spp override (reference NVS protocol: 512 spp converged
        # eval, 128 spp relighting — readme.md:93,111)
        if self.cfg.test:
            spp = self.cfg.relight_spp if relight_env is not None else self.cfg.eval_spp
            if spp > 0 and spp != static.spp:
                static = dataclasses.replace(static, spp=spp)
        # jit once per (static identity, relight-mode) — eager dispatch of
        # the full stage-1 graph costs minutes (static holds arrays, so key
        # by identity, not equality)
        cache_key = (id(self.static), static.H, static.spp, relight_env is not None,
                     albedo_scale is not None, exposure is not None)
        if getattr(self, "_eval_render_key", None) != cache_key:
            self._eval_render_key = cache_key
            self._eval_render_fn = jax.jit(
                lambda params, bv, ro, rd, k, renv, ascale, esc: render_stage1(
                    params, static, bv, ro, rd, k,
                    relight_env=renv, albedo_scale=ascale, exposure_scale=esc,
                )
            )
        out = self._eval_render_fn(
            self.state.params, jnp.asarray(self.base_verts),
            f["rays_o"], f["rays_d"], self._next_key(),
            relight_env, albedo_scale, exposure,
        )
        ds = lambda k: self._downsample(np.asarray(out[k]), H, W, ssaa)  # noqa: E731
        outs = {"image": np.clip(ds("image"), 0, 1), "depth": ds("depth")}
        if self.cfg.use_brdf:
            outs["image_brdf"] = np.clip(ds("image_brdf"), 0, 1)
            for k in ("kd", "ks", "normal", "diffuse_light", "specular_light"):
                outs[k] = ds(k)
        return outs, gt

    def _relight_env(self):
        if not hasattr(self, "_relight_env_cache"):
            from ..utils.image_io import load_hdr

            env = load_hdr(self.cfg.envmap_path)
            self._relight_env_cache = jnp.asarray(env)
            self.log(f"[relight] loaded {self.cfg.envmap_path} {env.shape}")
        return self._relight_env_cache

    def test(self, data: Optional[FrameData] = None, out_dir: Optional[str] = None) -> None:
        """Render the test trajectory and dump artifacts: rgb/brdf/depth pngs
        plus kd/ks/normal/env_map/diffuse/specular EXRs per frame
        (reference utils.py:1368-1377) — the inputs albedo_eval.py consumes."""
        from ..utils.image_io import save_exr, save_png

        sampler = RayDataset(data, bound=self.cfg.bound) if data is not None else self.sampler
        out_dir = out_dir or os.path.join(self.workspace, "results")
        os.makedirs(out_dir, exist_ok=True)
        exr_keys = {
            "kd": "kd", "ks": "ks", "normal": "normal",
            "diffuse_light": "diffuse", "specular_light": "specular",
        }
        for i in range(sampler.data.num_frames):
            outs, _ = self._render_eval_outputs(sampler, i)
            base = os.path.join(out_dir, f"{self.name}_{i:04d}")
            save_png(base + "_rgb.png", outs["image"])
            d = outs["depth"]
            save_png(base + "_depth.png", d / max(float(d.max()), 1e-8))
            if "image_brdf" in outs:
                save_png(base + "_brdf.png", outs["image_brdf"])
                for src, dst in exr_keys.items():
                    save_exr(f"{base}_{dst}.exr", outs[src])
        if self.cfg.stage == 1 and self.cfg.use_brdf:
            # trained envmap, once per run (reference dumps env_map EXR)
            save_exr(
                os.path.join(out_dir, f"{self.name}_env_map.exr"),
                np.asarray(self.state.params.env),
            )
        self.log(f"[test] wrote {sampler.data.num_frames} frames to {out_dir}")

    # ----------------------------------------------------------------- export
    def save_mesh(self, resolution: Optional[int] = None, decimate_target: Optional[float] = None):
        from ..export.stage0_export import export_stage0_mesh

        cfg = self.cfg
        params = self.state.ema_params if hasattr(self.state, "ema_params") else self.state.params

        def density_fn(pts):
            return nerf_model.density(params, pts, self.nerf_spec)["sigma"]

        return export_stage0_mesh(
            jax.jit(density_fn), self.workspace,
            bound=cfg.bound, cascade=cfg.cascade,
            resolution=resolution or cfg.mcubes_reso,
            density_thresh=cfg.density_thresh,
            decimate_target=decimate_target if decimate_target is not None else cfg.decimate_target,
            clean_min_f=cfg.clean_min_f, clean_min_d=cfg.clean_min_d,
            sdf=cfg.sdf,
            dataset=self.train_data if cfg.mesh_visibility_culling else None,
            visibility_culling=cfg.mesh_visibility_culling,
            env_reso=cfg.env_reso,
        )

    def export_stage1(self, texture_size: Optional[int] = None) -> str:
        from ..export.stage1_export import export_stage1_mesh

        verts = np.asarray(
            jnp.asarray(self.base_verts) + act_voffsets(self.state.params.offsets)
        )

        def material_fn(pts):
            return sample_material(self.state.params.mat, pts, self.static.mat_spec)

        return export_stage1_mesh(
            verts, self.tris, jax.jit(material_fn), self.workspace,
            texture_size=texture_size or self.cfg.texture_size,
        )

    # ------------------------------------------------------------- checkpoints
    def save_checkpoint(self, best: bool = False) -> None:
        extra = {}
        if self.cfg.stage == 1:
            # persist (possibly escalated) tracer budgets alongside state
            extra["tracer_budgets"] = self._tracer_budgets()
        ckpt.save_checkpoint(
            self.workspace, self.name, self.cfg.stage, self.global_step,
            self.state, extra=extra, best=best,
        )
