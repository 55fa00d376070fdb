"""Interactive visualizer backend (the reference imgui visualizer's Renderer,
viz/renderer.py:125-444, re-designed as a headless render service).

Capabilities mirrored from the reference widget set (viz/*.py): checkpoint
selection, seed/latent control, style mixing (geometry/appearance split),
truncation + noise mode, pose (yaw/pitch/fov), render types
(image | seg | depth | normals | raw), backbone caching, per-frame timing.

TPU design: the hot free-view path caches the tri-plane stacks per (seed,
truncation, stylemix) state — pose changes then only re-run renderer + superres
(the reference's backbone-cache widget does the same, viz/renderer.py:373-377).
Two jitted programs: plane generation and plane-conditioned frame rendering."""

from __future__ import annotations

import dataclasses
import math
import time
from typing import Optional, Tuple

import numpy as np


@dataclasses.dataclass
class VizState:
    seed: int = 0
    stylemix_seed: Optional[int] = None
    stylemix_geometry: bool = False  # mix rows :8 from stylemix_seed
    stylemix_appearance: bool = False  # mix rows 8: from stylemix_seed
    truncation_psi: float = 0.7
    truncation_cutoff: int = 14
    yaw: float = 0.0
    pitch: float = 0.0
    fov: float = 18.0
    num_steps: int = 48
    render_type: str = "image"  # image | seg | depth | normals | raw
    noise_mode: str = "const"


class VizRenderer:
    def __init__(self, G, params):
        import jax
        import jax.numpy as jnp

        from .. import render as R
        from ..render.renderer import RenderParams

        self.G, self.params = G, params
        self._jax, self._jnp, self._R = jax, jnp, R
        self._RenderParams = RenderParams
        self._plane_cache_key = None
        self._planes = None
        self._quad = None
        self._ws = None

        S = G.synthesis
        dt = jnp.dtype(G.cfg.dtype)

        self._planes_fn = jax.jit(lambda p, w: S.generate_planes(p, w))
        # cache the QUAD TABLE per identity, not just the planes: pose-only
        # changes then skip the table build entirely
        self._quad_fn = jax.jit(
            lambda iv, sv: S.renderer.build_table(iv.astype(dt), sv.astype(dt))
        )

        # Pose-change frame as TWO chained XLA programs (the two-phase split
        # measured ~10% faster than fused on v5e, PERF.md round 2).
        def phase1(p, quad, c, rp: RenderParams):
            return S.renderer.render_coarse(
                p["renderer"], None, None, c[:, :16].reshape(-1, 4, 4), rp, quad=quad
            )

        def phase2(p, st, ws, rp: RenderParams):
            rout = S.renderer.render_fine(p["renderer"], st, rp)
            n_vb = len(S.voxel_block_resolutions)
            img_raw = S._raw_rgb()(
                p["raw_rgb"], rout["feature"].astype(dt), ws[:, n_vb + 1]
            ).astype(jnp.float32)
            img = S.superresolve(p, rout["feature"], img_raw, ws)
            return img, rout["seg"], rout["depth"], rout["weights_sum"], img_raw

        p1 = jax.jit(phase1, static_argnames=("rp",))
        p2 = jax.jit(phase2, static_argnames=("rp",))
        self._frame_fn = lambda p, quad, ws, c, rp: p2(p, p1(p, quad, c, rp), ws, rp)

        # On-device uint8 conversion: the host pull is the latency bottleneck on
        # remote-host links (measured 491 ms for a 3 MB fp32 512^2 image over the
        # tunneled TPU vs ~4x less as uint8); production hosts also benefit.
        self._to_u8 = jax.jit(
            lambda x: jnp.clip(jnp.round((x + 1.0) * 127.5), 0, 255).astype(jnp.uint8)
        )
        self._seg_color_u8 = None  # built lazily (imports utils.seg)

    # ------------------------------------------------------------- layer capture

    def capture_layers(self, st: VizState) -> dict:
        """Named intermediate activations (the reference layer widget,
        viz/renderer.py:408-444, which captures module outputs via forward
        hooks): every vb block's backbone/planes, the composited feature image,
        raw RGB, and each superres stage. Returns
        {name: {"shape": tuple, "mean": float, "std": float, "preview": uint8
        [h,w,3]}} — preview is the first-3-channel slice, normalized."""
        import jax

        jnp, R = self._jnp, self._R
        S, G = self.G.synthesis, self.G
        ws = self._make_ws(st)

        rp = self._RenderParams(img_size=self.G.cfg.render_size,
                                num_steps=st.num_steps, hierarchical=True, fov=st.fov)
        dt = jnp.dtype(G.cfg.dtype)
        n_vb = len(S.voxel_block_resolutions)

        # ONE jitted program produces every tap (eager per-op dispatch is
        # seconds/op over a tunneled TPU; see CLAUDE.md)
        def taps_fn(p, ws, c):
            taps = {}
            x = img_v = seg_v = None
            for i, res in enumerate(S.voxel_block_resolutions):
                ws2 = jnp.stack([ws[:, i], ws[:, n_vb]], axis=1)
                x, img_v, seg_v = S._vb_block(i, res)(
                    p[f"vb{res}"], x, img_v, ws2, condition_img=seg_v
                )
                taps[f"vb{res}.x"] = x
                taps[f"vb{res}.img_v"] = img_v
                taps[f"vb{res}.seg_v"] = seg_v
            rout = S.renderer.render(p["renderer"], img_v.astype(dt),
                                     seg_v.astype(dt), c[:, :16].reshape(-1, 4, 4), rp)
            taps["renderer.feature"] = rout["feature"]
            taps["renderer.seg"] = rout["seg"]
            taps["renderer.depth"] = rout["depth"]
            img_raw = S._raw_rgb()(p["raw_rgb"], rout["feature"].astype(dt),
                                   ws[:, n_vb + 1]).astype(jnp.float32)
            taps["raw_rgb"] = img_raw
            xs, img = rout["feature"], img_raw
            base = n_vb + 2
            for i, res in enumerate(S.block_resolutions):
                r0 = base + 2 * i
                ws3 = jnp.stack([ws[:, r0], ws[:, r0 + 1],
                                 ws[:, min(r0 + 2, S.num_ws - 1)]], axis=1)
                xs, img = S._sr_block(i, res)(p[f"b{res}"], xs, img, ws3)
                taps[f"b{res}.x"] = xs
                taps[f"b{res}.img"] = img
            return taps

        c2w = R.look_at_pose(st.yaw + math.pi / 2, st.pitch + math.pi / 2,
                             [0.0, 0.0, 0.0], radius=2.7)
        c = R.make_label_25(c2w)
        taps = jax.jit(taps_fn)(self.params["synthesis"], ws, c)

        caps = {}
        for name, x in taps.items():
            arr = np.asarray(x[0], np.float32)
            entry = {"shape": tuple(arr.shape), "mean": float(arr.mean()),
                     "std": float(arr.std())}
            if arr.ndim == 3:
                pre = arr[..., :3] if arr.shape[-1] >= 3 else np.repeat(arr[..., :1], 3, -1)
                lo, hi = pre.min(), pre.max()
                pre = (pre - lo) / max(hi - lo, 1e-8)
                entry["preview"] = np.rint(pre * 255).clip(0, 255).astype(np.uint8)
            caps[name] = entry
        return caps

    # ------------------------------------------------------------------ latents

    def _make_ws(self, st: VizState):
        jnp, R, G = self._jnp, self._R, self.G
        c = jnp.asarray(R.CANONICAL_POSE_25)[None]

        def map_seed(seed):
            z = jnp.asarray(np.random.RandomState(seed).randn(1, G.cfg.z_dim), jnp.float32)
            return G.mapping(
                self.params["mapping"], z, c,
                truncation_psi=st.truncation_psi, truncation_cutoff=st.truncation_cutoff,
            )

        ws = map_seed(st.seed)
        if st.stylemix_seed is not None and (st.stylemix_geometry or st.stylemix_appearance):
            ws2 = map_seed(st.stylemix_seed)
            n_geo = G.synthesis.num_ws_geo
            geo = ws2[:, :n_geo] if st.stylemix_geometry else ws[:, :n_geo]
            app = ws2[:, n_geo:] if st.stylemix_appearance else ws[:, n_geo:]
            ws = jnp.concatenate([geo, app], axis=1)
        return ws

    # -------------------------------------------------------------------- frame

    def render(self, st: VizState) -> Tuple[np.ndarray, dict]:
        """Returns (uint8 image [R, R, 3], info dict incl. render_time)."""
        t0 = time.perf_counter()
        jnp, R = self._jnp, self._R

        cache_key = (st.seed, st.stylemix_seed, st.stylemix_geometry,
                     st.stylemix_appearance, st.truncation_psi, st.truncation_cutoff)
        cache_hit = cache_key == self._plane_cache_key
        if not cache_hit:
            self._ws = self._make_ws(st)
            self._planes = self._planes_fn(self.params["synthesis"], self._ws)
            self._quad = self._quad_fn(*self._planes)
            self._plane_cache_key = cache_key

        c2w = R.look_at_pose(
            st.yaw + math.pi / 2, st.pitch + math.pi / 2, [0.0, 0.0, 0.0], radius=2.7
        )
        c = R.make_label_25(c2w)
        rp = self._RenderParams(
            img_size=self.G.cfg.render_size, num_steps=st.num_steps,
            hierarchical=True, fov=st.fov,
        )
        img, seg, depth, wsum, img_raw = self._frame_fn(
            self.params["synthesis"], self._quad, self._ws, c, rp
        )

        if st.render_type == "image":
            out = np.asarray(self._to_u8(img[0])).astype(np.float32)
        elif st.render_type == "raw":
            out = np.asarray(self._to_u8(img_raw[0])).astype(np.float32)
        elif st.render_type == "seg":
            from ..utils.seg import mask2color

            if self._seg_color_u8 is None:
                self._seg_color_u8 = self._jax.jit(
                    lambda s: mask2color(s).astype(self._jnp.uint8)
                )
            out = np.asarray(self._seg_color_u8(seg))[0].astype(np.float32)
        elif st.render_type == "depth":
            d = np.asarray(depth[0, ..., 0])
            d = (d - d.min()) / max(d.max() - d.min(), 1e-8)
            out = np.repeat((d * 255)[..., None], 3, -1)
        elif st.render_type == "normals":
            d = np.asarray(depth[0, ..., 0])
            gy, gx = np.gradient(d)
            n = np.stack([-gx, -gy, np.full_like(d, 0.02)], -1)
            n /= np.linalg.norm(n, axis=-1, keepdims=True) + 1e-8
            out = (n * 0.5 + 0.5) * 255 * (np.asarray(wsum[0, ..., 0]) > 0.5)[..., None]
        else:
            raise ValueError(st.render_type)

        out = np.rint(out).clip(0, 255).astype(np.uint8)
        info = {"render_time": time.perf_counter() - t0, "plane_cached": cache_hit}
        return out, info


_BROWSER_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>IDE-3D visualizer</title>
<style>body{font-family:sans-serif;background:#181818;color:#ddd;margin:16px}
img{border:1px solid #444;width:512px;height:512px}
.t{display:flex;gap:10px;flex-wrap:wrap;align-items:center;margin:8px 0}
input[type=range]{width:150px}</style></head><body>
<h3>IDE-3D model browser <small id="ms"></small></h3>
<div class="t">
 seed <input id="seed" type="number" value="0" style="width:70px" onchange="go()">
 trunc <input id="trunc" type="range" min="0" max="1" step="0.05" value="0.7" onchange="go()">
 yaw <input id="yaw" type="range" min="-0.6" max="0.6" step="0.02" value="0" oninput="go()">
 pitch <input id="pitch" type="range" min="-0.4" max="0.4" step="0.02" value="0" oninput="go()">
 type <select id="type" onchange="go()">
  <option>image</option><option>seg</option><option>depth</option>
  <option>normals</option><option>raw</option></select>
 mix-seed <input id="mix" type="number" value="" placeholder="off" style="width:70px" onchange="go()">
 <label><input id="mix_geo" type="checkbox" onchange="go()">geometry</label>
 <label><input id="mix_app" type="checkbox" onchange="go()">appearance</label>
</div>
<img id="out">
<script>
const $=x=>document.getElementById(x); let busy=false, queued=false;
async function go(){
 if(busy){queued=true;return} busy=true;
 const p=new URLSearchParams({seed:$("seed").value,yaw:$("yaw").value,
  pitch:$("pitch").value,trunc:$("trunc").value,type:$("type").value});
 if($("mix").value!==""){p.set("mix",$("mix").value);
  p.set("mix_geo",$("mix_geo").checked?1:0);p.set("mix_app",$("mix_app").checked?1:0);}
 const t0=performance.now();
 const r=await fetch("/render?"+p); const b=await r.blob();
 $("out").src=URL.createObjectURL(b);
 $("ms").textContent=(performance.now()-t0).toFixed(0)+" ms (server "+
   (parseFloat(r.headers.get("X-Render-Time"))*1000).toFixed(0)+" ms)";
 busy=false; if(queued){queued=false;go();}
}
window.addEventListener("load",go);
</script></body></html>
"""


def main(argv=None):
    """Render server + model-browser page: GET / for the UI,
    GET /render?seed=0&yaw=0.2&type=image for raw PNG frames."""
    import argparse
    import io
    from http.server import BaseHTTPRequestHandler, HTTPServer
    from urllib.parse import parse_qs, urlparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--network", required=True)
    ap.add_argument("--port", type=int, default=8000)
    args = ap.parse_args(argv)

    from .common import load_generator

    G, params = load_generator(args.network)
    renderer = VizRenderer(G, params)

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                page = _BROWSER_HTML.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(page)))
                self.end_headers()
                self.wfile.write(page)
                return
            if url.path != "/render":
                self.send_response(404)
                self.end_headers()
                return
            q = {k: v[0] for k, v in parse_qs(url.query).items()}
            st = VizState(
                seed=int(q.get("seed", 0)),
                yaw=float(q.get("yaw", 0)),
                pitch=float(q.get("pitch", 0)),
                fov=float(q.get("fov", 18)),
                truncation_psi=float(q.get("trunc", 0.7)),
                render_type=q.get("type", "image"),
                stylemix_seed=int(q["mix"]) if "mix" in q else None,
                stylemix_geometry=q.get("mix_geo", "0") == "1",
                stylemix_appearance=q.get("mix_app", "0") == "1",
            )
            img, info = renderer.render(st)
            import PIL.Image

            buf = io.BytesIO()
            PIL.Image.fromarray(img).save(buf, "PNG")
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("X-Render-Time", f"{info['render_time']:.4f}")
            self.end_headers()
            self.wfile.write(buf.getvalue())

        def log_message(self, *a):
            pass

    print(f"render server on :{args.port}  (GET /render?seed=0&yaw=0.3&type=seg)")
    HTTPServer(("0.0.0.0", args.port), Handler).serve_forever()


if __name__ == "__main__":
    main()
