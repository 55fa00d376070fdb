"""Semantic-driven face reenactment (+ avatar style-transfer variant).

CLI contracts:
  * apps/infer_face_animation.py:92-155 — per-frame driving mask (from a video's
    BiSeNet parse or a directory of masks) + fixed style latent -> E(style_render,
    driving_seg), appearance locked to the style, rendered at a driving/orbit pose,
  * apps/infer_face_animation_avatar.py:39-190 — style transfer via camera-label
    interpolation sweeps with a fixed driving geometry.

Usage:
    python -m ide3d_tpu.apps.infer_face_animation --network random:0 \
        --encoder random:0 --masks masks_dir/ --seed 7 --output anim.mp4
"""

from __future__ import annotations

import argparse
import glob
import math
import os

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--network", required=True)
    ap.add_argument("--encoder", default="random:0")
    ap.add_argument("--masks", required=True, help="directory of driving 19-class masks")
    ap.add_argument("--seed", type=int, default=0, help="style seed")
    ap.add_argument("--trunc", type=float, default=0.7)
    ap.add_argument("--orbit", action="store_true", help="sweep yaw while animating")
    ap.add_argument("--fps", type=int, default=24)
    ap.add_argument("--output", required=True)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from .. import render
    from ..apps.painter import PainterSession
    from ..models.encoder import HybridEncoder
    from ..utils.seg import mask2color
    from .common import load_generator, write_video
    from .infer_hybrid_encoder import load_mask

    G, g_params = load_generator(args.network)
    R = G.cfg.img_resolution
    n_geo = G.synthesis.num_ws_geo
    E = HybridEncoder(size=R, n_latents_app=G.num_ws - n_geo, n_latents_geo=n_geo,
                      w_dim=G.cfg.w_dim)
    if args.encoder.startswith("random"):
        seed = int(args.encoder.split(":")[1]) if ":" in args.encoder else 0
        e_params = jax.jit(E.init)(jax.random.PRNGKey(seed))
    else:
        from ..io.checkpoint import load_checkpoint

        e_params, _ = load_checkpoint(args.encoder)

    sess = PainterSession(G=G, E=E, g_params=g_params, e_params=e_params)
    sess.set_seed(args.seed, truncation_psi=args.trunc)
    sess.inversion = True  # lock the style's appearance rows across frames

    mask_files = sorted(
        glob.glob(os.path.join(args.masks, "*.png"))
        + glob.glob(os.path.join(args.masks, "*.jpg"))
    )
    assert mask_files, f"no masks in {args.masks}"

    frames = []
    style_w = sess.w
    for i, mf in enumerate(mask_files):
        mask = load_mask(mf, R)
        yaw = 0.35 * math.sin(2 * math.pi * i / len(mask_files)) if args.orbit else 0.0
        sess.w = style_w  # re-anchor the appearance every frame (reference :144-152)
        img, seg = sess.edit(mask, yaw=yaw)
        frames.append(np.concatenate([img, seg], axis=1))
        if i % 10 == 0:
            print(f"frame {i}/{len(mask_files)}")

    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    out_path = write_video(args.output, frames, fps=args.fps)
    print(f"wrote {out_path} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
