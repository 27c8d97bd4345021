"""Interactive orbit viewer: the TPU-native analog of the reference's
dearpygui GUI (`nerf/gui.py` + Trainer.test_gui, dormant upstream).

Serves a browser page with mouse-orbit controls; every drag requests
/render?theta=..&phi=..&radius=.. which renders through the live framework
(stage-0 volume render from a checkpoint, or stage-1 mesh + ReSTIR/PT) and
streams a JPEG back.  Runs against the real TPU — first request compiles
(~1-4 min through the tunnel), subsequent orbits are interactive.

Usage:
  python scripts/live_viewer.py --workspace ws/ --stage 0 [--port 8000]
  python scripts/live_viewer.py --workspace ws/ --stage 1 --use_brdf [--spp 2]

Train-while-viewing (the reference GUI's train mode, nerf/gui.py:229-257
train_step-per-frame): pass --train to run the full Trainer loop in a
daemon thread of THIS process (one TPU client — two processes would fight
over the chip); orbit renders read the live training state between steps,
so the view sharpens as the run progresses.

  python scripts/live_viewer.py --workspace ws/ --stage 0 --train --iters 5000
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import threading

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

PAGE = """<!doctype html>
<html><head><title>mirres-tpu live viewer</title><style>
body{margin:0;background:#111;color:#ddd;font-family:monospace}
#v{display:block;margin:12px auto;border:1px solid #333;cursor:grab}
#s{text-align:center}</style></head><body>
<div id=s>drag to orbit &middot; wheel to zoom &middot;
<select id=m>__MODES__</select> &middot; <span id=t></span></div>
<img id=v width=__W__ height=__H__>
<script>
let th=1.2, ph=0.5, r=2.2, busy=false, dirty=true;
const img=document.getElementById('v'), lab=document.getElementById('t');
const sel=document.getElementById('m'); sel.onchange=()=>dirty=true;
function tick(){
  if(!busy && dirty){
    busy=true; dirty=false;
    const t0=performance.now();
    const u=`/render?theta=${th.toFixed(3)}&phi=${ph.toFixed(3)}&radius=${r.toFixed(3)}&mode=${sel.value}&_=${Math.random()}`;
    const i=new Image();
    i.onload=()=>{img.src=i.src;lab.textContent=`${(performance.now()-t0).toFixed(0)} ms`;busy=false;};
    i.onerror=()=>{busy=false;};
    i.src=u;
  }
  requestAnimationFrame(tick);
}
let drag=false,lx=0,ly=0;
img.onmousedown=e=>{drag=true;lx=e.clientX;ly=e.clientY;};
window.onmouseup=()=>drag=false;
window.onmousemove=e=>{if(!drag)return; ph+=(e.clientX-lx)*0.01; th-=(e.clientY-ly)*0.01;
  th=Math.max(0.1,Math.min(3.0,th)); lx=e.clientX; ly=e.clientY; dirty=true;};
img.onwheel=e=>{e.preventDefault(); r*=Math.exp(e.deltaY*0.001); r=Math.max(0.5,Math.min(6,r)); dirty=true;};
tick();
</script></body></html>"""


# set by main() so the viewer test can watch training progress in-process
_TRAINER_FOR_TEST = None
_SERVER_FOR_TEST = None


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workspace", required=True)
    ap.add_argument("--stage", type=int, default=0)
    ap.add_argument("--use_brdf", action="store_true")
    ap.add_argument("--use_restir", action="store_true")
    ap.add_argument("--spp", type=int, default=1)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--bound", type=float, default=1.0)
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--fp16", action="store_true")
    ap.add_argument("--hash_levels", type=int, default=16)
    ap.add_argument("--hash_log2_size", type=int, default=19)
    ap.add_argument("--hash_max_res", type=int, default=0)
    ap.add_argument("--train", action="store_true",
                    help="run the Trainer loop in a daemon thread and view "
                         "the live state (reference gui.py train mode)")
    ap.add_argument("--data", type=str, default="",
                    help="dataset path for --train (blender/colmap/dtu; "
                         "default: the synthetic sphere scene)")
    ap.add_argument("--data_format", type=str, default="nerf")
    ap.add_argument("--iters", type=int, default=0,
                    help="training iterations for --train (0 = config default)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from mirres_restir_nerf_mesh_tpu.config import Config, finalize
    from mirres_restir_nerf_mesh_tpu.data.synthetic import make_synthetic_dataset, orbit_pose
    from mirres_restir_nerf_mesh_tpu.data.rays import get_rays
    from mirres_restir_nerf_mesh_tpu.train.trainer import Trainer

    H = W = args.size
    fx = 0.8 * W
    intr = jnp.asarray([fx, fx, W / 2.0, H / 2.0], jnp.float32)

    cfg = finalize(
        Config(
            workspace=args.workspace, stage=args.stage, bound=args.bound,
            use_brdf=args.use_brdf, use_restir=args.use_restir, spp=args.spp,
            ssaa=1, data_parallel=False, fp16=args.fp16,
            hash_levels=args.hash_levels, hash_log2_size=args.hash_log2_size,
            hash_max_res=args.hash_max_res,
        )
    )
    if args.train:
        cfg = finalize(
            Config(
                workspace=args.workspace, stage=args.stage, bound=args.bound,
                use_brdf=args.use_brdf, use_restir=args.use_restir,
                spp=args.spp, ssaa=1, data_parallel=False, fp16=args.fp16,
                hash_levels=args.hash_levels,
                hash_log2_size=args.hash_log2_size,
                hash_max_res=args.hash_max_res, path=args.data,
                data_format=args.data_format,
                **({"iters": args.iters} if args.iters else {}),
            )
        )
        if args.data:
            from main import load_dataset

            data = load_dataset(cfg, cfg.train_split)
        else:
            data = make_synthetic_dataset(
                n_frames=8, H=H, W=W, bound=args.bound
            )
    else:
        # trainer only needs a dataset shell for shapes
        data = make_synthetic_dataset(n_frames=1, H=H, W=W, bound=args.bound)
    trainer = Trainer("ngp", cfg, data)
    global _TRAINER_FOR_TEST
    _TRAINER_FOR_TEST = trainer
    lock = threading.Lock()

    if args.train:
        # the reference GUI interleaves train steps and renders inside one
        # process (gui.py:229-257); here the full Trainer loop runs in a
        # daemon thread of THIS process — one TPU client, no chip contention
        # — and orbit renders read the trainer's live (immutable) state refs
        th_train = threading.Thread(target=trainer.train, daemon=True)
        th_train.start()
        print("[viewer] training in background; renders track the live state",
              flush=True)

    # buffer modes: the reference GUI's mode combo ('image', 'depth') +
    # shading combo ('full', 'diffuse', 'specular') (nerf/gui.py:305,312),
    # extended with the material/normal G-buffers stage 1 already returns
    if args.stage == 0:
        modes = ("image", "depth")
    else:
        modes = ("image_brdf", "image", "depth", "normal", "kd", "ks",
                 "diffuse", "specular", "indirect")
        if not args.use_brdf:
            modes = ("image",) + tuple(m for m in modes if m != "image")

    def _viz(out: dict, mode: str) -> np.ndarray:
        m = np.asarray(out["mask"]).reshape(H, W, 1) if "mask" in out else None
        if mode == "depth":
            d = np.asarray(out["depth"]).reshape(H, W, 1)
            live = d[np.isfinite(d) & (d > 0)] if m is None else d[m[..., 0] > 0.5]
            lo, hi = (live.min(), live.max()) if live.size else (0.0, 1.0)
            d = np.where(np.isfinite(d), (d - lo) / max(hi - lo, 1e-6), 1.0)
            return np.repeat(1.0 - np.clip(d, 0, 1), 3, axis=-1)
        if mode == "normal":
            n = np.asarray(out["normal"]).reshape(H, W, 3)
            return np.where(m > 0.5, n * 0.5 + 0.5, 1.0)
        if mode == "kd":
            return np.where(m > 0.5, np.asarray(out["kd"]).reshape(H, W, 3), 1.0)
        if mode == "ks":
            return np.where(m > 0.5, np.asarray(out["ks"]).reshape(H, W, 3), 1.0)
        if mode == "diffuse":
            kd = np.asarray(out["kd"]).reshape(H, W, 3)
            metal = np.asarray(out["ks"]).reshape(H, W, 3)[..., 2:3]
            dl = np.asarray(out["diffuse_light"]).reshape(H, W, 3)
            return np.where(m > 0.5, kd * (1 - metal) * dl, 1.0)
        if mode == "specular":
            sl = np.asarray(out["specular_light"]).reshape(H, W, 3)
            return np.where(m > 0.5, sl, 1.0)
        if mode == "indirect":
            il = np.asarray(out["img_brdf_indirect"]).reshape(H, W, 3)
            return np.where(m > 0.5, il, 1.0)
        return np.asarray(out[mode]).reshape(H, W, 3)

    def render(theta: float, phi: float, radius: float, mode: str) -> np.ndarray:
        mode = mode if mode in modes else modes[0]
        pose = jnp.asarray(orbit_pose(theta, phi, radius=radius))
        rays = get_rays(pose[None], intr, H, W)
        with lock:
            if args.stage == 0:
                from mirres_restir_nerf_mesh_tpu.train import stage0

                img, depth = stage0.render_frame(
                    trainer.state, trainer.render_fn, rays["rays_o"], rays["rays_d"], H, W
                )
                out = {"image": img, "depth": depth}
                img = _viz(out, mode)
            else:
                from mirres_restir_nerf_mesh_tpu.render.stage1 import render_stage1

                out = render_stage1(
                    trainer.state.params, trainer.static,
                    jnp.asarray(trainer.base_verts),
                    rays["rays_o"], rays["rays_d"], jax.random.PRNGKey(0),
                )
                img = _viz(out, mode)
        return np.clip(np.asarray(img, np.float32), 0, 1)

    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    from PIL import Image

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            u = urlparse(self.path)
            if u.path == "/":
                opts = "".join(f"<option>{m}</option>" for m in modes)
                body = (
                    PAGE.replace("__W__", str(W)).replace("__H__", str(H))
                    .replace("__MODES__", opts).encode()
                )
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(body)
                return
            if u.path == "/render":
                q = parse_qs(u.query)
                img = render(
                    float(q.get("theta", [1.2])[0]),
                    float(q.get("phi", [0.5])[0]),
                    float(q.get("radius", [2.2])[0]),
                    q.get("mode", [modes[0]])[0],
                )
                buf = io.BytesIO()
                Image.fromarray((img * 255).astype(np.uint8)).save(buf, "JPEG", quality=90)
                self.send_response(200)
                self.send_header("Content-Type", "image/jpeg")
                self.end_headers()
                self.wfile.write(buf.getvalue())
                return
            self.send_response(404)
            self.end_headers()

    print(f"[viewer] http://localhost:{args.port}  (first render compiles; be patient)")
    global _SERVER_FOR_TEST
    srv = ThreadingHTTPServer(("0.0.0.0", args.port), Handler)
    _SERVER_FOR_TEST = srv  # tests call .shutdown() so no server thread
    srv.serve_forever()     # outlives the test (r5: a leaked thread rode
    srv.server_close()      # alongside a later test's compile-cache write)


if __name__ == "__main__":
    main()
