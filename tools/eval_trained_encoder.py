"""Batch reconstruction metrics for a trained G + hybrid encoder.

Quantifies the inversion stack on the synthetic pose-consistent dataset
(tools/make_synthetic_dataset.py): for N dataset views, rec_ws = E(img, seg) +
w_avg, re-render at the view's own camera, and report

  * rgb_l2   — mean per-pixel squared error (the reference's l2 criterion,
               apps/calc_losses_on_images.py:19),
  * seg_miou — mean IoU between the input 19-class mask and the re-rendered
               semantics (mIoU over classes present in either mask),
  * ws_spread — std of the recovered latents across identities (collapse check).

Prints one JSON line; cited by TRAINING.md.

Usage:
    python tools/eval_trained_encoder.py --network /tmp/gan_small_run/snapshot-final \
        --encoder /tmp/enc_run/encoder-00006000 --data /tmp/sphere_faces --n 32
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
    ap.add_argument("--data", required=True)
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import PIL.Image

    from ide3d_tpu.apps.common import load_generator
    from ide3d_tpu.io.checkpoint import load_checkpoint
    from ide3d_tpu.models.encoder import HybridEncoder
    from ide3d_tpu.utils.seg import mask2onehot

    G, g_params = load_generator(args.network)
    R = G.cfg.img_resolution
    n_geo = G.synthesis.num_ws_geo
    E = HybridEncoder(size=R, n_latents_app=G.num_ws - n_geo,
                      n_latents_geo=n_geo, w_dim=G.cfg.w_dim)
    e_params, _ = load_checkpoint(args.encoder)
    if "E" in e_params:
        e_params = e_params["E"]

    labels = dict(json.load(
        open(os.path.join(args.data, "img", "dataset.json")))["labels"])
    names = sorted(labels)[: args.n]

    @jax.jit
    def recon(g_params, e_params, img, seg_pm, c):
        ws = E(e_params, img, seg_pm) + g_params["mapping"]["w_avg"][None, None, :]
        out, out_seg = G.synthesis(g_params["synthesis"], ws, c, return_seg=True)
        return out, out_seg, ws

    l2s, ious, ws_all = [], [], []
    B = args.batch
    for i in range(0, len(names), B):
        chunk = names[i : i + B]
        if len(chunk) < B:  # static shapes: drop the ragged tail
            break
        imgs, segs, cs = [], [], []
        for nm in chunk:
            img = np.asarray(PIL.Image.open(
                os.path.join(args.data, "img", nm)).convert("RGB"),
                np.float32) / 127.5 - 1.0
            mask = np.asarray(PIL.Image.open(
                os.path.join(args.data, "seg", nm)).convert("L"), np.int64)
            c = np.asarray(labels[nm], np.float32)
            c[[1, 2, 5, 6, 9, 10]] *= -1  # OpenCV -> OpenGL
            imgs.append(img)
            segs.append(mask)
            cs.append(c)
        img_b = jnp.asarray(np.stack(imgs))
        mask_b = np.stack(segs)
        seg_pm = mask2onehot(jnp.asarray(mask_b)) * 2.0 - 1.0
        out, out_seg, ws = recon(g_params, e_params, img_b, seg_pm,
                                 jnp.asarray(np.stack(cs)))
        out = np.asarray(out)
        pred = np.asarray(jnp.argmax(out_seg, axis=-1))
        l2s.append(((out - np.stack(imgs)) ** 2).mean(axis=(1, 2, 3)))
        for b in range(B):
            per_cls = []
            for cls in np.union1d(np.unique(mask_b[b]), np.unique(pred[b])):
                p, t = pred[b] == cls, mask_b[b] == cls
                per_cls.append((p & t).sum() / max((p | t).sum(), 1))
            ious.append(float(np.mean(per_cls)))
        ws_all.append(np.asarray(ws))

    ws_cat = np.concatenate(ws_all)
    print(json.dumps({
        "n": int(len(ious)),
        "rgb_l2": round(float(np.concatenate(l2s).mean()), 5),
        "seg_miou": round(float(np.mean(ious)), 4),
        "ws_spread": round(float(ws_cat.std(axis=0).mean()), 4),
    }))


if __name__ == "__main__":
    main()
