"""Hybrid-encoder inference: one image (+ mask) -> w+ code + reconstruction.

CLI contract: apps/infer_hybrid_encoder.py — load image (and 19-class mask, or
parse one with BiSeNet), E(img, seg) + w_avg (:80-81), optional appearance
override from another code (:83-85), save rec_ws + recon render.

Usage:
    python -m ide3d_tpu.apps.infer_hybrid_encoder --network <G ckpt|random:0> \
        --encoder <E ckpt|random:0> --img face.png [--mask mask.png] \
        [--appearance-code other_ws.npz] --outdir out/
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def load_image(path: str, resolution: int) -> np.ndarray:
    import PIL.Image

    img = PIL.Image.open(path).convert("RGB").resize((resolution, resolution),
                                                     PIL.Image.LANCZOS)
    return np.asarray(img, np.float32) / 127.5 - 1.0


def load_mask(path: str, resolution: int) -> np.ndarray:
    import PIL.Image

    m = PIL.Image.open(path).convert("L").resize((resolution, resolution),
                                                 PIL.Image.NEAREST)
    return np.asarray(m, np.int64)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--network", required=True)
    ap.add_argument("--encoder", default="random:0")
    ap.add_argument("--img", required=True)
    ap.add_argument("--mask", default=None)
    ap.add_argument("--bisenet", default=None, help="segNet-20Class.pth for auto-parsing")
    ap.add_argument("--appearance-code", default=None,
                    help="npz ws whose appearance rows override the encoder's")
    ap.add_argument("--outdir", required=True)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from .. import render
    from ..models.encoder import HybridEncoder
    from ..utils.seg import id_remap, mask2color, mask2onehot
    from .common import load_generator, save_image_grid

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
        if "E" in e_params:
            e_params = e_params["E"]

    img = jnp.asarray(load_image(args.img, R))[None]
    if args.mask is not None:
        mask = load_mask(args.mask, R)
        seg = mask2onehot(jnp.asarray(mask)[None]) * 2.0 - 1.0
    else:
        assert args.bisenet, "provide --mask or --bisenet weights"
        from ..io.torch_import import import_bisenet
        from ..models.bisenet import BiSeNet

        bis = BiSeNet(20)
        bp = import_bisenet(args.bisenet)
        ids = id_remap(jnp.argmax(bis(bp, img), axis=-1))
        seg = mask2onehot(ids) * 2.0 - 1.0

    # jit the encode: eager dispatch is seconds/op on tunneled hosts (CLAUDE.md)
    rec_ws = jax.jit(
        lambda ep, gp, i, s: E(ep, i, s) + gp["mapping"]["w_avg"][None, None, :]
    )(e_params, g_params, img, seg)
    if args.appearance_code:
        from ..io.checkpoint import load_pytree_npz

        other = load_pytree_npz(args.appearance_code)["ws"]
        rec_ws = jnp.concatenate([rec_ws[:, :n_geo], jnp.asarray(other)[:, n_geo:]], axis=1)

    c = jnp.asarray(render.CANONICAL_POSE_25)[None]
    recon, recon_seg = jax.jit(
        lambda p, w, c: G.synthesis(p["synthesis"], w, c, return_seg=True)
    )(g_params, rec_ws, c)

    os.makedirs(args.outdir, exist_ok=True)
    from ..io.checkpoint import save_pytree_npz

    save_pytree_npz(os.path.join(args.outdir, "rec_ws.npz"), {"ws": rec_ws})
    save_image_grid(np.asarray(recon), os.path.join(args.outdir, "recon.png"))
    save_image_grid(np.asarray(mask2color(recon_seg)) / 127.5 - 1.0,
                    os.path.join(args.outdir, "recon_seg.png"))
    print(f"wrote {args.outdir}/rec_ws.npz, recon.png, recon_seg.png")


if __name__ == "__main__":
    main()
