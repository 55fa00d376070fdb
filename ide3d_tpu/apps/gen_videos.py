"""Render interpolation orbit videos (CLI contract: gen_videos.py:190).

Usage:
    python -m ide3d_tpu.apps.gen_videos --network random:0 --seeds 0,1,2,3 \
        --grid 2x2 --output out/video.mp4 --image-mode image_seg

Cubic-spline interpolation through the seeds' w+ codes while the camera orbits
(yaw/pitch sinusoids around the front pose, gen_videos.py:83-129); modes:
image | image_seg | image_depth (:130-137).

Throughput design (PERF.md): frames are rendered --chunk at a time inside ONE
jitted program (`lax.scan` over the per-frame synthesis) with uint8 conversion
(and seg colorization / depth shading) ON DEVICE — one dispatch + one small
host pull per chunk instead of a ~30 ms tunnel round trip and a 3 MB fp32 pull
per frame."""

from __future__ import annotations

import argparse
import math
import os

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--network", required=True)
    ap.add_argument("--seeds", required=True)
    ap.add_argument("--grid", default="1x1")
    ap.add_argument("--num-keyframes", type=int, default=None)
    ap.add_argument("--w-frames", type=int, default=24, help="frames per keyframe transition")
    ap.add_argument("--trunc", type=float, default=1.0, dest="truncation_psi")
    ap.add_argument("--truncation-cutoff", type=int, default=14)
    ap.add_argument("--image-mode", choices=["image", "image_seg", "image_depth"],
                    default="image")
    ap.add_argument("--num-steps", type=int, default=96)  # reference budget (gen_images.py:102)
    ap.add_argument("--chunk", type=int, default=8,
                    help="frames rendered per XLA program (lax.scan); amortizes "
                         "dispatch RTT over the tunneled backend")
    ap.add_argument("--fps", type=int, default=24)
    ap.add_argument("--output", required=True)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from scipy import interpolate as sinterp

    from .. import render
    from ..render.renderer import RenderParams
    from ..utils.seg import mask2color
    from .common import load_generator, parse_range, write_video

    G, params = load_generator(args.network)
    gw, gh = (int(x) for x in args.grid.split("x"))
    seeds = parse_range(args.seeds)
    num_keyframes = args.num_keyframes
    if num_keyframes is None:
        num_keyframes = len(seeds) // (gw * gh)
    seeds = (seeds * ((num_keyframes * gw * gh) // len(seeds) + 1))[: num_keyframes * gw * gh]

    rp = RenderParams(img_size=G.cfg.render_size, num_steps=args.num_steps, hierarchical=True)

    # Map all keyframe seeds to w+ (gen_videos.py:75-90).
    cs = jnp.broadcast_to(jnp.asarray(render.CANONICAL_POSE_25), (len(seeds), 25))
    zs = jnp.asarray(
        np.stack([np.random.RandomState(s).randn(G.cfg.z_dim) for s in seeds]), jnp.float32
    )
    map_fn = jax.jit(
        lambda p, z, c: G.mapping(
            p, z, c,
            truncation_psi=args.truncation_psi,
            truncation_cutoff=args.truncation_cutoff,
        )
    )
    ws = map_fn(params["mapping"], zs, cs)
    ws = np.asarray(ws).reshape(gh, gw, num_keyframes, *ws.shape[1:])

    # Cubic interpolation over keyframes, periodic (gen_videos.py:96-106).
    interps = {}
    for yi in range(gh):
        for xi in range(gw):
            k = ws[yi, xi]  # [K, num_ws, w_dim]
            x = np.arange(-num_keyframes * 2, num_keyframes * 2)
            y = np.tile(k, [4, 1, 1])
            interps[(yi, xi)] = sinterp.interp1d(x, y, kind="cubic", axis=0)

    image_mode = args.image_mode
    R = G.cfg.img_resolution

    def post(out):
        """Per-frame on-device epilogue: uint8 image + mode extra (seg color /
        shaded depth)."""
        img8 = jnp.clip(jnp.round((out["img"][0] + 1) * 127.5), 0, 255).astype(jnp.uint8)
        if image_mode == "image_seg":
            ex8 = mask2color(out["seg"])[0].astype(jnp.uint8)
        elif image_mode == "image_depth":
            d = out["depth"][0, ..., 0]
            d = (d - d.min()) / jnp.maximum(d.max() - d.min(), 1e-8)
            d = jax.image.resize(d, (R, R), method="bilinear")
            ex8 = jnp.repeat(
                jnp.clip(jnp.round(d * 255), 0, 255).astype(jnp.uint8)[..., None], 3, axis=-1
            )
        else:
            ex8 = jnp.zeros((0, 0, 3), jnp.uint8)
        return img8, ex8

    # Frames are independent — on a multi-chip mesh each device scans its own
    # K/n slice of the chunk (parallel/render.make_frame_sharded_chunks);
    # single-chip degenerates to a plain jitted scan of the same body.
    from ..parallel.render import make_frame_sharded_chunks

    ndev = jax.device_count()
    mesh = None
    K = max(1, args.chunk)
    if ndev > 1:
        K = max(K, ndev) // ndev * ndev  # round chunk to a multiple of n
        from jax.sharding import Mesh, NamedSharding
        from jax.sharding import PartitionSpec as P

        mesh = Mesh(np.array(jax.devices()), ("data",))
        # checkpoint restore commits params to one device; replicate over the
        # mesh or the sharded program refuses the mixed placement
        params = jax.device_put(params, NamedSharding(mesh, P()))
    chunk_body = make_frame_sharded_chunks(G.synthesis, post, mesh, rp)

    def chunk_fn(params, ws_k, cs_k):
        return chunk_body(params["synthesis"], ws_k, cs_k)

    total = num_keyframes * args.w_frames
    # Flat work list, frame-major then tile raster order.
    work_ws, work_cs = [], []
    for fi in range(total):
        # camera orbit (gen_videos.py:83-88)
        yaw = 0.4 * math.sin(2 * math.pi * fi / total)
        pitch = 0.05 * math.cos(2 * math.pi * fi / total)
        c2w = render.look_at_pose(
            math.pi / 2 + yaw, math.pi / 2 - pitch, [0.0, 0.0, 0.2], radius=2.7
        )
        c = np.asarray(render.make_label_25(c2w), np.float32).reshape(25)
        for yi in range(gh):
            for xi in range(gw):
                work_ws.append(np.asarray(interps[(yi, xi)](fi / args.w_frames), np.float32))
                work_cs.append(c)

    starts = list(range(0, len(work_ws), K))

    def dispatch(start):
        ws_k = np.stack(work_ws[start : start + K])
        cs_k = np.stack(work_cs[start : start + K])
        n = ws_k.shape[0]
        if n < K:  # pad the tail chunk to the compiled shape; trim on pull
            ws_k = np.concatenate([ws_k, np.repeat(ws_k[-1:], K - n, axis=0)])
            cs_k = np.concatenate([cs_k, np.repeat(cs_k[-1:], K - n, axis=0)])
        return chunk_fn(params, jnp.asarray(ws_k), jnp.asarray(cs_k)), n

    # One chunk kept in flight: the host pull of chunk i (the throughput bound
    # over a tunneled link, ~40 ms/frame at 512²) overlaps the device rendering
    # of chunk i+1 (dispatch is async). Measured 70 -> 43 ms/frame end-to-end.
    tiles8 = []
    pending = dispatch(starts[0])
    for si in range(len(starts)):
        nxt = dispatch(starts[si + 1]) if si + 1 < len(starts) else None
        (imgs8, exs8), n = pending
        imgs8 = np.asarray(imgs8)[:n]
        exs8 = np.asarray(exs8)[:n]
        for i in range(n):
            t = imgs8[i]
            if image_mode != "image":
                t = np.concatenate([t, exs8[i]], axis=1)
            tiles8.append(t)
        print(f"frame {len(tiles8) // (gh * gw)}/{total}")
        pending = nxt

    frames = []
    per_frame = gh * gw
    for fi in range(total):
        block = tiles8[fi * per_frame : (fi + 1) * per_frame]
        rows = [
            np.concatenate(block[yi * gw : (yi + 1) * gw], axis=1) for yi in range(gh)
        ]
        frames.append(np.concatenate(rows, axis=0))

    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    out_path = write_video(args.output, frames, fps=args.fps)
    print(f"wrote {out_path} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
