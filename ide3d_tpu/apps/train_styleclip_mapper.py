"""Train a StyleCLIP LevelsMapper for a text-described edit.

Reference: inversion/models/StyleCLIP/mapper/scripts/train.py + the coach
(mapper/training/coach.py) — here the decoder is the IDE-3D generator and the
whole step (2×G + mapper + CLIP [+ ArcFace]) is one jitted program.

Requires CLIP weights + the BPE vocab (zero-egress environments gate both):

    python -m ide3d_tpu.apps.train_styleclip_mapper --network ckpt/ \
        --clip ViT-B-32-state.pt --bpe bpe_simple_vocab_16e6.txt.gz \
        --description "a face with purple hair" --steps 5000 --outdir mapper_out \
        [--ir-se50 model_ir_se50.pth] [--no-fine-mapper]
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--network", required=True)
    ap.add_argument("--clip", required=True, help="CLIP ViT state_dict (.pt)")
    ap.add_argument("--bpe", required=True, help="bpe_simple_vocab_16e6.txt.gz")
    ap.add_argument("--description", required=True)
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--ir-se50", default=None, help="ArcFace weights for the ID loss")
    ap.add_argument("--steps", type=int, default=50_000)
    ap.add_argument("--lr", type=float, default=0.5)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--id-lambda", type=float, default=0.1)
    ap.add_argument("--clip-lambda", type=float, default=1.0)
    ap.add_argument("--latent-l2-lambda", type=float, default=0.8)
    ap.add_argument("--no-coarse-mapper", action="store_true")
    ap.add_argument("--no-medium-mapper", action="store_true")
    ap.add_argument("--no-fine-mapper", action="store_true")
    args = ap.parse_args(argv)

    from ..editing.latent_editor import LevelsMapper
    from ..io.checkpoint import save_checkpoint
    from ..models.clip import SimpleTokenizer, load_clip
    from ..train.styleclip import StyleClipConfig, train_styleclip_mapper
    from .common import load_generator

    G, g_params = load_generator(args.network)
    clip_model, clip_params = load_clip(args.clip)
    tokenizer = SimpleTokenizer(bpe_path=args.bpe)

    embed_id = None
    if args.ir_se50 and args.id_lambda > 0:
        from ..io.torch_import import load_torch_state_dict, state_dict_to_tree
        from ..models.arcface import ArcFaceIRSE50

        arc = ArcFaceIRSE50()
        arc_params = state_dict_to_tree(load_torch_state_dict(args.ir_se50))
        embed_id = lambda img: arc.embed_faces(arc_params, img)  # noqa: E731
    elif args.id_lambda > 0:
        print("no --ir-se50 weights: disabling the ID loss term")
        args.id_lambda = 0.0

    cfg = StyleClipConfig(
        description=args.description, lr=args.lr, id_lambda=args.id_lambda,
        clip_lambda=args.clip_lambda, latent_l2_lambda=args.latent_l2_lambda,
        batch_size=args.batch, max_steps=args.steps,
    )
    mapper = LevelsMapper(
        w_dim=G.w_dim, num_ws=G.num_ws,
        use_coarse=not args.no_coarse_mapper,
        use_medium=not args.no_medium_mapper,
        use_fine=not args.no_fine_mapper,
    )
    mapper, params = train_styleclip_mapper(
        G, g_params, clip_model, clip_params, tokenizer,
        cfg=cfg, mapper=mapper, embed_id=embed_id, steps=args.steps)

    os.makedirs(args.outdir, exist_ok=True)
    save_checkpoint(os.path.join(args.outdir, "mapper"), params,
                    description=args.description)
    print(f"saved mapper to {args.outdir}/mapper")


if __name__ == "__main__":
    main()
