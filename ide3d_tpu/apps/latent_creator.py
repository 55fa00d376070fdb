"""Batch latent creation: project a folder of images to w+ codes.

CLI contract: inversion/scripts/latent_creators/*.py (SG2/SG2+/e4e projector
batch runs) — one npz pivot per image plus an index file.

Usage:
    python -m ide3d_tpu.apps.latent_creator --network random:0 --images faces/ \
        --steps 200 [--encoder ckpt --masks masks/] --outdir latents/
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--network", required=True)
    ap.add_argument("--images", required=True)
    ap.add_argument("--masks", default=None)
    ap.add_argument("--encoder", default=None)
    ap.add_argument("--e4e", default=None,
                    help="e4e/pSp .pt checkpoint: ONE-SHOT e4e latents "
                         "(no projector — the reference E4ELatentCreator leg, "
                         "inversion/scripts/latent_creators/e4e_latent_creator.py)")
    ap.add_argument("--e4e-variant", default="auto",
                    choices=("auto", "e4e", "gradual"))
    ap.add_argument("--steps", type=int, default=450)
    ap.add_argument("--labels", default=None)
    ap.add_argument("--outdir", required=True)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from .. import render
    from ..io.checkpoint import save_pytree_npz
    from ..train.pti import ProjectorConfig, project_w_plus
    from .common import load_generator
    from .infer_hybrid_encoder import load_image

    G, g_params = load_generator(args.network)
    R = G.cfg.img_resolution
    os.makedirs(args.outdir, exist_ok=True)

    files = sorted(sum((glob.glob(os.path.join(args.images, e))
                        for e in ("*.png", "*.jpg", "*.jpeg")), []))
    assert files, f"no images in {args.images}"

    labels = {}
    if args.labels:
        with open(args.labels) as f:
            labels = dict(json.load(f))

    e4e_fn = None
    if args.e4e:
        from .common import make_e4e_pivot_fn

        e4e_fn, e4e_report = make_e4e_pivot_fn(G, args.e4e, args.e4e_variant)
        print(f"e4e: {e4e_report}")

    E = e_params = None
    if args.encoder:
        from ..io.checkpoint import load_checkpoint
        from ..models.encoder import HybridEncoder

        n_geo = G.synthesis.num_ws_geo
        E = HybridEncoder(size=R, n_latents_app=G.num_ws - n_geo, n_latents_geo=n_geo,
                          w_dim=G.cfg.w_dim)
        e_params, _ = load_checkpoint(args.encoder)
        if "E" in e_params:
            e_params = e_params["E"]

    index = []
    for i, f in enumerate(files):
        name = os.path.splitext(os.path.basename(f))[0]
        target = jnp.asarray(load_image(f, R))[None]
        c = jnp.asarray(labels.get(os.path.basename(f), render.CANONICAL_POSE_25),
                        jnp.float32).reshape(1, 25)
        if e4e_fn is not None:
            # one-shot e4e leg (E4ELatentCreator): encode, no optimization
            ws = e4e_fn(target)
            out = os.path.join(args.outdir, f"{name}.npz")
            save_pytree_npz(out, {"ws": ws, "c": c})
            index.append([os.path.basename(f), f"{name}.npz"])
            print(f"[{i+1}/{len(files)}] {name} (e4e one-shot)")
            continue

        initial_w = None
        if E is not None and args.masks:
            mp = os.path.join(args.masks, os.path.basename(f))
            if os.path.exists(mp):
                from ..utils.seg import mask2onehot
                from .infer_hybrid_encoder import load_mask

                seg = mask2onehot(jnp.asarray(load_mask(mp, R))[None]) * 2 - 1
                initial_w = jax.jit(
                    lambda ep, gp, t, s: E(ep, t, s)
                    + gp["mapping"]["w_avg"][None, None]
                )(e_params, g_params, target, seg)
        ws = project_w_plus(G, g_params, target, c,
                            ProjectorConfig(num_steps=args.steps),
                            initial_w=initial_w, key=jax.random.PRNGKey(i))
        out = os.path.join(args.outdir, f"{name}.npz")
        save_pytree_npz(out, {"ws": ws, "c": c})
        index.append([os.path.basename(f), f"{name}.npz"])
        print(f"[{i+1}/{len(files)}] {name}")

    with open(os.path.join(args.outdir, "index.json"), "w") as f:
        json.dump(index, f, indent=2)
    print(f"wrote {len(index)} latents to {args.outdir}")


if __name__ == "__main__":
    main()
