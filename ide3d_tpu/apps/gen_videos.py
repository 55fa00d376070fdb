"""Render interpolation orbit videos (CLI contract: gen_videos.py:190).

Usage:
    python -m ide3d_tpu.apps.gen_videos --network random:0 --seeds 0,1,2,3 \
        --grid 2x2 --output out/video.mp4 --image-mode image_seg

Cubic-spline interpolation through the seeds' w+ codes while the camera orbits
(yaw/pitch sinusoids around the front pose, gen_videos.py:83-129); modes:
image | image_seg | image_depth (:130-137). One jitted frame program; every frame
is data.
"""

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
    ws = G.mapping(
        params["mapping"], zs, cs,
        truncation_psi=args.truncation_psi, truncation_cutoff=args.truncation_cutoff,
    )
    ws = np.asarray(ws).reshape(gh, gw, num_keyframes, *ws.shape[1:])

    # Cubic interpolation over keyframes, periodic (gen_videos.py:96-106).
    interps = {}
    for yi in range(gh):
        for xi in range(gw):
            k = ws[yi, xi]  # [K, num_ws, w_dim]
            x = np.arange(-num_keyframes * 2, num_keyframes * 2)
            y = np.tile(k, [4, 1, 1])
            interps[(yi, xi)] = sinterp.interp1d(x, y, kind="cubic", axis=0)

    @jax.jit
    def frame_fn(params, w, c):
        out = G.synthesis(params["synthesis"], w, c, render_params=rp, return_all=True)
        return out["img"], out["seg"], out["depth"]

    total = num_keyframes * args.w_frames
    frames = []
    for fi in range(total):
        # camera orbit (gen_videos.py:83-88)
        yaw = 0.4 * math.sin(2 * math.pi * fi / total)
        pitch = 0.05 * math.cos(2 * math.pi * fi / total)
        c2w = render.look_at_pose(
            math.pi / 2 + yaw, math.pi / 2 - pitch, [0.0, 0.0, 0.2], radius=2.7
        )
        c = render.make_label_25(c2w)

        tiles = []
        for yi in range(gh):
            row = []
            for xi in range(gw):
                w = jnp.asarray(interps[(yi, xi)](fi / args.w_frames), jnp.float32)[None]
                img, seg, depth = frame_fn(params, w, c)
                img8 = np.asarray((img[0] + 1) * 127.5).clip(0, 255).astype(np.uint8)
                if args.image_mode == "image_seg":
                    seg8 = np.asarray(mask2color(seg))[0].astype(np.uint8)
                    img8 = np.concatenate([img8, seg8], axis=1)
                elif args.image_mode == "image_depth":
                    d = np.asarray(depth[0, ..., 0])
                    d = (d - d.min()) / max(d.max() - d.min(), 1e-8)
                    d8 = (d * 255).astype(np.uint8)
                    d8 = np.repeat(d8[..., None], 3, axis=-1)
                    R = img8.shape[0]
                    import PIL.Image

                    d8 = np.asarray(PIL.Image.fromarray(d8).resize((R, R), PIL.Image.BILINEAR))
                    img8 = np.concatenate([img8, d8], axis=1)
                row.append(img8)
            tiles.append(np.concatenate(row, axis=1))
        frames.append(np.concatenate(tiles, axis=0))
        if fi % 24 == 0:
            print(f"frame {fi}/{total}")

    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    out_path = write_video(args.output, frames, fps=args.fps)
    print(f"wrote {out_path} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
