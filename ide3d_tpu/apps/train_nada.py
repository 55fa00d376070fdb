"""StyleGAN-NADA text-driven domain adaptation CLI.

The reference ships `ide3d-nada` as an empty submodule (README.md:157-165
describes: adapt the generator from a source to a target text prompt with CLIP
guidance). train/nada.py implements the step; this CLI wires it to the real
CLIP embedder (models/clip.py — weights gated in zero-egress environments).

    python -m ide3d_tpu.apps.train_nada --network ckpt/ \
        --clip ViT-B-32-state.pt --bpe bpe_simple_vocab_16e6.txt.gz \
        --source "photo" --target "sketch" --steps 300 --outdir nada_out
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--network", required=True)
    ap.add_argument("--clip", required=True, help="CLIP ViT state_dict (.pt)")
    ap.add_argument("--bpe", required=True, help="bpe_simple_vocab_16e6.txt.gz")
    ap.add_argument("--source", required=True, help="source domain text, e.g. 'photo'")
    ap.add_argument("--target", required=True, help="target domain text, e.g. 'sketch'")
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--train-geometry", action="store_true",
                    help="also adapt vb blocks + renderer (default: frozen)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from .. import render
    from ..io.checkpoint import save_checkpoint
    from ..models.clip import SimpleTokenizer, load_clip, make_image_embedder, text_direction
    from ..train.nada import NadaConfig, init_nada_state, make_nada_step
    from .common import load_generator

    G, g_params = load_generator(args.network)
    clip_model, clip_params = load_clip(args.clip)
    tokenizer = SimpleTokenizer(bpe_path=args.bpe)

    embed = make_image_embedder(clip_model, clip_params)
    tdir = text_direction(clip_model, clip_params, tokenizer, args.source, args.target)

    cfg = NadaConfig(lr=args.lr, freeze_geometry=not args.train_geometry)
    state = init_nada_state(G, g_params, cfg)
    step = make_nada_step(G, g_params, embed, tdir, cfg)

    key = jax.random.PRNGKey(0)
    c = jnp.broadcast_to(jnp.asarray(render.CANONICAL_POSE_25), (args.batch, 25))
    for i in range(args.steps):
        key, kz, kr = jax.random.split(key, 3)
        z = jax.random.normal(kz, (args.batch, G.z_dim))
        state, loss = step(state, z, c, kr)
        if i % 10 == 0:
            print(f"step {i}: directional loss {float(loss):.4f}")

    os.makedirs(args.outdir, exist_ok=True)
    save_checkpoint(os.path.join(args.outdir, "nada_g"), state.params_train,
                    source=args.source, target=args.target)
    print(f"saved adapted generator to {args.outdir}/nada_g")


if __name__ == "__main__":
    main()
