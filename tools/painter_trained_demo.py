"""End-to-end inversion+editing demo on TRAINED weights (training validation).

Drives the full IDE-3D product loop — the reference's Painter workflow
(Painter/run_UI.py:167-206) — against a generator trained by apps/train_gan.py
and a hybrid encoder trained by apps/train_hybrid_encoder.py on the synthetic
pose-consistent dataset (tools/make_synthetic_dataset.py):

  1. invert a held-out dataset view: rec_ws = E(img, seg) + w_avg,
  2. reconstruct at the view's own camera and at the canonical front pose,
  3. apply a semantic mask edit (dilate the hair class) through
     PainterSession.edit — re-encode, appearance-locked,
  4. re-render the EDITED latent at several yaws to show the edit is a 3D edit.

Outputs two grids under --outdir:
  painter_trained_recon.png  [target | recon@pose | recon@front]
  painter_trained_edit.png   [before | after, then after @ yaw sweep]

Usage:
    python tools/painter_trained_demo.py --network /tmp/gan_small_run/snapshot-final \
        --encoder /tmp/enc_run/encoder-00006000 --data /tmp/sphere_faces \
        --item 00000_2 --outdir docs/img
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--network", required=True)
    ap.add_argument("--encoder", required=True)
    ap.add_argument("--data", required=True, help="synthetic dataset root (img/ seg/)")
    ap.add_argument("--item", default="00000_2")
    ap.add_argument("--hair-dilate", type=int, default=5)
    ap.add_argument("--pivot", default=None,
                    help="npz ws from run_pti: use the PTI pivot latent (with a "
                         "tuned --network) instead of the encoder inversion — "
                         "the full reference workflow encoder->projector->PTI->"
                         "Painter (single_id_coach + run_UI)")
    ap.add_argument("--prefix", default="painter_trained",
                    help="output file prefix")
    ap.add_argument("--outdir", required=True)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import PIL.Image

    from ide3d_tpu import render
    from ide3d_tpu.apps.common import load_generator, save_image_grid
    from ide3d_tpu.apps.painter import PainterSession
    from ide3d_tpu.io.checkpoint import load_checkpoint
    from ide3d_tpu.models.encoder import HybridEncoder
    from ide3d_tpu.utils.seg import mask2color, mask2onehot

    G, g_params = load_generator(args.network)
    R = G.cfg.img_resolution
    n_geo = G.synthesis.num_ws_geo
    E = HybridEncoder(size=R, n_latents_app=G.num_ws - n_geo,
                      n_latents_geo=n_geo, w_dim=G.cfg.w_dim)
    e_params, _ = load_checkpoint(args.encoder)
    if "E" in e_params:
        e_params = e_params["E"]

    img = np.asarray(
        PIL.Image.open(os.path.join(args.data, "img", args.item + ".png"))
        .convert("RGB").resize((R, R), PIL.Image.LANCZOS), np.float32) / 127.5 - 1.0
    mask = np.asarray(
        PIL.Image.open(os.path.join(args.data, "seg", args.item + ".png"))
        .convert("L").resize((R, R), PIL.Image.NEAREST), np.int64)

    labels = dict(json.load(
        open(os.path.join(args.data, "img", "dataset.json")))["labels"])
    c_own = np.asarray(labels[args.item + ".png"], np.float32)
    c_own[[1, 2, 5, 6, 9, 10]] *= -1  # OpenCV -> OpenGL (dataset_seg.py:314)
    c_own = jnp.asarray(c_own)[None]
    c_front = jnp.asarray(render.CANONICAL_POSE_25)[None]

    # 1) invert (jitted: eager dispatch is seconds/op on tunneled hosts), or
    # load a PTI pivot (run_pti output) when --pivot is given
    seg_pm = mask2onehot(jnp.asarray(mask)[None]) * 2.0 - 1.0
    if args.pivot:
        from ide3d_tpu.io.checkpoint import load_pytree_npz

        rec_ws = jnp.asarray(load_pytree_npz(args.pivot)["ws"])
    else:
        rec_ws = jax.jit(
            lambda ep, gp, i, s: E(ep, i, s) + gp["mapping"]["w_avg"][None, None, :]
        )(e_params, g_params, jnp.asarray(img)[None], seg_pm)

    synth = jax.jit(lambda p, w, c: G.synthesis(p["synthesis"], w, c, return_seg=True))
    recon_own, _ = synth(g_params, rec_ws, c_own)
    recon_front, _ = synth(g_params, rec_ws, c_front)

    os.makedirs(args.outdir, exist_ok=True)
    grid = np.stack([img, np.asarray(recon_own[0]), np.asarray(recon_front[0])])
    save_image_grid(grid, os.path.join(args.outdir, args.prefix + "_recon.png"),
                    grid=(3, 1))

    # 2) mask edit: dilate the hair class (17) downward over skin
    edited = mask.copy()
    k = args.hair_dilate
    hair = (mask == 17)
    grown = hair.copy()
    for dy in range(1, k + 1):
        grown[dy:, :] |= hair[:-dy, :]
    edited[grown & (mask == 1)] = 17

    sess = PainterSession(G=G, E=E, g_params=g_params, e_params=e_params)
    sess.set_inversion(rec_ws)
    before = np.asarray(recon_front[0])
    sess.edit(edited)  # front view edit; updates sess.w (appearance-locked)
    sweep = []
    for yaw in (-0.4, 0.0, 0.4):
        rgb, _ = sess.view(yaw=yaw)
        sweep.append(rgb.astype(np.float32) / 127.5 - 1.0)
    grid = np.stack([before] + sweep)
    save_image_grid(grid, os.path.join(args.outdir, args.prefix + "_edit.png"),
                    grid=(4, 1))

    # colorized edited mask for the writeup
    mc = np.asarray(mask2color(mask2onehot(jnp.asarray(edited)[None]) * 2.0 - 1.0))[0]
    PIL.Image.fromarray(mc.astype(np.uint8)).save(
        os.path.join(args.outdir, args.prefix + "_edit_mask.png"))
    print(f"wrote {args.outdir}/{args.prefix}_recon.png, {args.prefix}_edit.png")


if __name__ == "__main__":
    main()
