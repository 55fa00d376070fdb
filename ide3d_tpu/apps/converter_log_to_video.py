"""Replay a recorded Painter session into a video
(CLI contract: Painter/converter_log_to_video.py).

Usage:
    python -m ide3d_tpu.apps.converter_log_to_video --network random:0 \
        --encoder random:0 --log session.npz --seed 3 --output session.mp4
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--network", required=True)
    ap.add_argument("--encoder", default="random:0")
    ap.add_argument("--log", required=True)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--fps", type=int, default=8)
    ap.add_argument("--output", required=True)
    args = ap.parse_args(argv)

    import jax

    from ..models.encoder import HybridEncoder
    from .common import load_generator, write_video
    from .painter import PainterSession

    G, g_params = load_generator(args.network)
    n_geo = G.synthesis.num_ws_geo
    E = HybridEncoder(size=G.cfg.img_resolution, n_latents_app=G.num_ws - n_geo,
                      n_latents_geo=n_geo, w_dim=G.cfg.w_dim)
    if args.encoder.startswith("random"):
        seed = int(args.encoder.split(":")[1]) if ":" in args.encoder else 0
        e_params = jax.jit(E.init)(jax.random.PRNGKey(seed))
    else:
        from ..io.checkpoint import load_checkpoint

        e_params, _ = load_checkpoint(args.encoder)

    sess = PainterSession(G=G, E=E, g_params=g_params, e_params=e_params)
    sess.set_seed(args.seed)

    frames = []
    for rgb, seg in sess.replay_log(args.log):
        frames.append(np.concatenate([rgb, seg], axis=1))

    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    out_path = write_video(args.output, frames, fps=args.fps)
    print(f"wrote {out_path} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
