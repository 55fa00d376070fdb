"""Avatar style transfer with camera-label interpolation sweeps.

CLI contract: apps/infer_face_animation_avatar.py:39-190 — a fixed driving
geometry (seed or inverted code) restyled via the generator's image-conditioning
pathway (`cond_img=target_render`, :114) while the camera label sweeps through
yaw/pitch interpolations (:129-135).

Requires a generator built with `use_encoder=True` (GeneratorConfig) — with the
default mapping-only checkpoints the style source falls back to style-mixing the
appearance rows of a second seed.

Usage:
    python -m ide3d_tpu.apps.infer_face_animation_avatar --network random:0 \
        --seed 1 --style-seed 7 --frames 48 --output avatar.mp4
"""

from __future__ import annotations

import argparse
import math
import os

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--network", required=True)
    ap.add_argument("--seed", type=int, default=0, help="driving geometry seed")
    ap.add_argument("--style-seed", type=int, default=7)
    ap.add_argument("--style-image", default=None,
                    help="restyle from an image via G.encode (needs use_encoder ckpt)")
    ap.add_argument("--trunc", type=float, default=0.7)
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--yaw-range", type=float, default=0.45)
    ap.add_argument("--pitch-range", type=float, default=0.12)
    ap.add_argument("--fps", type=int, default=24)
    ap.add_argument("--output", required=True)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from .. import render
    from .common import load_generator, write_video

    G, params = load_generator(args.network)
    c0 = jnp.asarray(render.CANONICAL_POSE_25)[None]
    n_geo = G.synthesis.num_ws_geo

    def map_seed(seed):
        z = jnp.asarray(np.random.RandomState(seed).randn(1, G.cfg.z_dim), jnp.float32)
        return G.mapping(params["mapping"], z, c0, truncation_psi=args.trunc)

    ws_drive = map_seed(args.seed)

    if args.style_image and G.cfg.use_encoder:
        from .infer_hybrid_encoder import load_image

        img = jnp.asarray(load_image(args.style_image, G.cfg.img_resolution))[None]
        ws_style, _ = G.encode(params, img)
    else:
        # cond_img pathway unavailable -> appearance style-mix (reference fallback
        # semantics: geometry from the driver, appearance from the style source)
        ws_style = map_seed(args.style_seed)

    ws = jnp.concatenate([ws_drive[:, :n_geo], ws_style[:, n_geo:]], axis=1)

    @jax.jit
    def frame(params, ws, c):
        return G.synthesis(params["synthesis"], ws, c)

    frames = []
    for i in range(args.frames):
        t = 2 * math.pi * i / args.frames
        yaw = args.yaw_range * math.sin(t)
        pitch = args.pitch_range * math.cos(t)
        c2w = render.look_at_pose(
            math.pi / 2 + yaw, math.pi / 2 + pitch, [0.0, 0.0, 0.0], radius=2.7
        )
        img = frame(params, ws, render.make_label_25(c2w))
        frames.append(np.rint((np.asarray(img[0]) + 1) * 127.5).clip(0, 255).astype(np.uint8))
        if i % 12 == 0:
            print(f"frame {i}/{args.frames}")

    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    out = write_video(args.output, frames, fps=args.fps)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
