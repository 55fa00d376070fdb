"""Pairwise reconstruction metrics between two image folders.

CLI contract: apps/calc_losses_on_images.py:19-122 (LPIPS / L2 / mIoU between
reconstructions and ground truth) + apps/calc_id_loss_parallel.py (ID cosine
similarity — enabled when ArcFace weights are provided).

Usage:
    python -m ide3d_tpu.apps.calc_losses_on_images --mode l2,lpips \
        --data-a recon_dir/ --data-b gt_dir/ [--masks-a a/ --masks-b b/]
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np


def _files(d):
    return sorted(sum((glob.glob(os.path.join(d, e)) for e in ("*.png", "*.jpg")), []))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="l2,lpips")
    ap.add_argument("--data-a", required=True)
    ap.add_argument("--data-b", required=True)
    ap.add_argument("--masks-a", default=None)
    ap.add_argument("--masks-b", default=None)
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--lpips-weights", default=None)
    ap.add_argument("--arcface-weights", default=None)
    ap.add_argument("--output", default=None, help="also write the JSON report here")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from .infer_hybrid_encoder import load_image, load_mask

    fa, fb = _files(args.data_a), _files(args.data_b)
    assert len(fa) == len(fb) and fa, f"folder mismatch: {len(fa)} vs {len(fb)}"
    modes = args.mode.split(",")

    lp = lp_params = None
    if "lpips" in modes:
        from ..metrics.lpips import LPIPS

        lp = LPIPS()
        if args.lpips_weights:
            from ..io.torch_import import load_torch_state_dict, state_dict_to_tree

            lp_params = state_dict_to_tree(load_torch_state_dict(args.lpips_weights))
        else:
            lp_params = lp.init(jax.random.PRNGKey(0))
            print("WARNING: uncalibrated LPIPS (random lin weights)")

    arc = arc_params = None
    if "id" in modes:
        from ..models.arcface import ArcFaceIRSE50

        arc = ArcFaceIRSE50()
        if args.arcface_weights:
            from ..io.torch_import import load_torch_state_dict, state_dict_to_tree

            arc_params = state_dict_to_tree(load_torch_state_dict(args.arcface_weights))
        else:
            arc_params = arc.init()
            print("WARNING: random ArcFace weights — ID numbers not meaningful")

    scores = {m: [] for m in modes}
    for pa, pb in zip(fa, fb):
        a = jnp.asarray(load_image(pa, args.resolution))[None]
        b = jnp.asarray(load_image(pb, args.resolution))[None]
        if "l2" in modes:
            scores["l2"].append(float(jnp.mean(jnp.square(a - b))))
        if "lpips" in modes:
            scores["lpips"].append(float(lp.mean(lp_params, a, b)))
        if "id" in modes:
            ea = arc.embed_faces(arc_params, a)
            eb = arc.embed_faces(arc_params, b)
            ea = ea / jnp.linalg.norm(ea, axis=-1, keepdims=True)
            eb = eb / jnp.linalg.norm(eb, axis=-1, keepdims=True)
            scores["id"].append(float((ea * eb).sum()))
        if "miou" in modes:
            assert args.masks_a and args.masks_b, "mIoU needs --masks-a/--masks-b"
            ma = load_mask(os.path.join(args.masks_a, os.path.basename(pa)), args.resolution)
            mb = load_mask(os.path.join(args.masks_b, os.path.basename(pb)), args.resolution)
            ious = []
            for cls in range(19):
                inter = np.logical_and(ma == cls, mb == cls).sum()
                union = np.logical_or(ma == cls, mb == cls).sum()
                if union > 0:
                    ious.append(inter / union)
            scores["miou"].append(float(np.mean(ious)))

    result = {m: {"mean": float(np.mean(v)), "std": float(np.std(v))}
              for m, v in scores.items() if v}
    print(json.dumps(result))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(result, f, indent=1)
    return result


if __name__ == "__main__":
    main()
