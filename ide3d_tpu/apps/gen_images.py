"""Generate multi-view RGB images + semantic masks (CLI contract: gen_images.py:70).

Usage:
    python -m ide3d_tpu.apps.gen_images --network random:0 --seeds 0-3 --outdir out/

For each seed: one z -> w+ (with truncation), rendered at yaws {-0.5, 0, 0.5}
(gen_images.py:93), RGB saved as seed{NNNN}.png and the colorized 19-class mask as
seed{NNNN}_seg.png, both 1x3 grids. The whole sweep runs as ONE jitted program per
yaw — poses are data, not code, so there is exactly one compile.
"""

from __future__ import annotations

import argparse
import math
import os

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--network", required=True, help="checkpoint dir or random:<seed>")
    ap.add_argument("--seeds", required=True, help="e.g. 0,1,4-6")
    ap.add_argument("--trunc", type=float, default=1.0, dest="truncation_psi")
    ap.add_argument("--noise-mode", choices=["const", "random", "none"], default="const")
    ap.add_argument("--num-steps", type=int, default=96)  # reference budget (gen_images.py:102)
    ap.add_argument("--outdir", required=True)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from .. import render
    from ..render.renderer import RenderParams
    from ..utils.seg import mask2color
    from .common import load_generator, parse_range, save_image_grid

    G, params = load_generator(args.network)
    os.makedirs(args.outdir, exist_ok=True)
    rp = RenderParams(img_size=G.cfg.render_size, num_steps=args.num_steps, hierarchical=True)

    @jax.jit
    def synth_views(params, ws, cams):
        # All yaws in one batched program: poses are data, one dispatch per seed.
        ws3 = jnp.broadcast_to(ws, (cams.shape[0],) + ws.shape[1:])
        img, seg = G.synthesis(params["synthesis"], ws3, cams, render_params=rp, return_seg=True)
        return img, mask2color(seg)

    map_fn = jax.jit(
        lambda p, z, c: G.mapping(p, z, c, truncation_psi=args.truncation_psi)
    )

    cs = jnp.asarray(render.CANONICAL_POSE_25)[None]
    yaws = [-0.5, 0.0, 0.5]
    cams = jnp.concatenate(
        [
            render.make_label_25(
                render.look_at_pose(y + math.pi / 2, math.pi / 2, [0.0, 0.0, 0.0], radius=2.7)
            )
            for y in yaws
        ],
        axis=0,
    )

    for seed in parse_range(args.seeds):
        z = jnp.asarray(np.random.RandomState(seed).randn(1, G.cfg.z_dim), jnp.float32)
        ws = map_fn(params["mapping"], z, cs)
        img, seg_rgb = synth_views(params, ws, cams)
        imgs = np.asarray(img)
        segs = np.asarray(seg_rgb) / 127.5 - 1.0
        save_image_grid(imgs, f"{args.outdir}/seed{seed:04d}.png", grid=(3, 1))
        save_image_grid(segs, f"{args.outdir}/seed{seed:04d}_seg.png", grid=(3, 1))
        print(f"seed {seed}: wrote {args.outdir}/seed{seed:04d}.png (+_seg)")


if __name__ == "__main__":
    main()
