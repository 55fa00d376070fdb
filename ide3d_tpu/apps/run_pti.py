"""PTI inversion pipeline driver (CLI contract: inversion/scripts/run_pti.py:66-195).

Per input image: optional encoder warm start -> w+ projector -> pivotal tuning of
G -> save pivot latents (`<name>.npz`, the reference's 0.pt), camera label
(`<name>_label.npz`), tuned generator checkpoint (`model_<name>`), and comparison
renders (+ optional orbit video). `--multi-id` tunes ONE generator over all images
(the MultiIDCoach, inversion/training/coaches/multi_id_coach.py).

Usage:
    python -m ide3d_tpu.apps.run_pti --network random:0 --images face.png \
        --outdir pti_out/ [--encoder ckpt] [--multi-id] [--video]
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
    ap.add_argument("--images", required=True, help="image file, glob, or directory")
    ap.add_argument("--masks", default=None, help="directory of masks for encoder warm start")
    ap.add_argument("--encoder", default=None, help="HybridEncoder ckpt for initial_w")
    ap.add_argument("--e4e", default=None,
                    help="e4e/pSp .pt checkpoint: first-stage w_type='e4e' pivots "
                         "(base_coach.py:181-199); takes precedence over --encoder")
    ap.add_argument("--e4e-variant", default="auto",
                    choices=("auto", "e4e", "gradual"),
                    help="encoder architecture in the --e4e checkpoint "
                         "(weight-isomorphic, so shapes can't tell them apart): "
                         "'auto' reads opts.encoder_type and warns when guessing")
    ap.add_argument("--labels", default=None, help="json {fname: 25-dim pose}; default front")
    ap.add_argument("--opencv-labels", action="store_true",
                    help="--labels values are in the dataset.json OpenCV "
                         "convention; apply the OpenCV->OpenGL sign flip "
                         "(data/dataset.py / dataset_seg.py:314) before use")
    ap.add_argument("--projector-steps", type=int, default=450)
    ap.add_argument("--pti-steps", type=int, default=350)
    ap.add_argument("--lpips-threshold", type=float, default=0.06)
    ap.add_argument("--multi-id", action="store_true")
    ap.add_argument("--video", action="store_true")
    ap.add_argument("--join-view", action="store_true",
                    help="ide3d_join_view coach: add mirrored-view consistency "
                         "(single_id_coach.py:66-71)")
    ap.add_argument("--use-locality", action="store_true",
                    help="ball-holder locality regularization "
                         "(criteria/localitly_regulizer.py:9-59)")
    ap.add_argument("--no-noise-opt", action="store_true",
                    help="disable joint per-layer noise-buffer optimization")
    ap.add_argument("--outdir", required=True)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from .. import render
    from ..io.checkpoint import save_checkpoint, save_pytree_npz
    from ..train.pti import PtiConfig, ProjectorConfig, pivotal_tune, project_w_plus
    from .common import load_generator, save_image_grid
    from .infer_hybrid_encoder import load_image

    G, g_params = load_generator(args.network)
    R = G.cfg.img_resolution
    os.makedirs(args.outdir, exist_ok=True)

    if os.path.isdir(args.images):
        files = sorted(sum((glob.glob(os.path.join(args.images, e))
                            for e in ("*.png", "*.jpg", "*.jpeg")), []))
    else:
        files = sorted(glob.glob(args.images))
    assert files, f"no images match {args.images}"

    labels = {}
    if args.labels:
        import json

        with open(args.labels) as f:
            labels = dict(json.load(f))
        if args.opencv_labels:
            import numpy as np

            def _cv2gl(v):
                v = np.asarray(v, np.float32).copy()
                v[[1, 2, 5, 6, 9, 10]] *= -1
                return v

            labels = {k: _cv2gl(v) for k, v in labels.items()}

    e4e_fn = None
    if args.e4e:
        from .common import make_e4e_pivot_fn

        e4e_fn, e4e_report = make_e4e_pivot_fn(G, args.e4e, args.e4e_variant)
        print(f"e4e: {e4e_report}")

    e_params = E = None
    if args.encoder:
        from ..io.checkpoint import load_checkpoint
        from ..models.encoder import HybridEncoder

        n_geo = G.synthesis.num_ws_geo
        E = HybridEncoder(size=R, n_latents_app=G.num_ws - n_geo, n_latents_geo=n_geo,
                          w_dim=G.cfg.w_dim)
        e_params, _ = load_checkpoint(args.encoder)
        if "E" in e_params:
            e_params = e_params["E"]

    pcfg = ProjectorConfig(num_steps=args.projector_steps,
                           optimize_noise=not args.no_noise_opt)
    tcfg = PtiConfig(max_steps=args.pti_steps, lpips_threshold=args.lpips_threshold,
                     join_view=args.join_view, use_locality=args.use_locality)

    pivots = []
    tuned = g_params
    for fi, f in enumerate(files):
        name = os.path.splitext(os.path.basename(f))[0]
        target = jnp.asarray(load_image(f, R))[None]
        c = jnp.asarray(
            labels.get(os.path.basename(f), render.CANONICAL_POSE_25), jnp.float32
        ).reshape(1, 25)

        initial_w = None
        if e4e_fn is not None:
            initial_w = e4e_fn(target)
        elif E is not None and args.masks:
            from ..utils.seg import mask2onehot
            from .infer_hybrid_encoder import load_mask

            mask_path = os.path.join(args.masks, os.path.basename(f))
            if os.path.exists(mask_path):
                seg = mask2onehot(jnp.asarray(load_mask(mask_path, R))[None]) * 2 - 1
                initial_w = jax.jit(
                    lambda ep, gp, t, s: E(ep, t, s)
                    + gp["mapping"]["w_avg"][None, None]
                )(e_params, g_params, target, seg)

        print(f"[{fi+1}/{len(files)}] projecting {name} ...")
        w_pivot, noise = project_w_plus(G, tuned, target, c, pcfg,
                                        initial_w=initial_w,
                                        key=jax.random.PRNGKey(fi), verbose=True,
                                        return_noise=True)
        save_pytree_npz(os.path.join(args.outdir, f"{name}.npz"), {"ws": w_pivot})
        save_pytree_npz(os.path.join(args.outdir, f"{name}_label.npz"), {"c": c})
        pivots.append((name, w_pivot, noise, target, c))

        if not args.multi_id:
            print(f"tuning G around pivot {name} ...")
            # the pivot w was optimized jointly with these noise buffers — PTI
            # must inherit them (the reference projector writes G's buffers in
            # place and the coach tunes that same G, base_coach.py:105)
            base = _with_noise(g_params, noise)
            tuned_i = pivotal_tune(G, base, w_pivot, target, c, tcfg, verbose=True)
            save_checkpoint(os.path.join(args.outdir, f"model_{name}"),
                            {"G_ema": tuned_i}, config=G.cfg)
            _save_viz(G, tuned_i, w_pivot, target, c, args, name)

    if args.multi_id:
        # MultiIDCoach: one generator tuned over all pivots round-robin. Each
        # pivot's projector noise is merged just before its tuning pass (the
        # reference's in-place buffer writes leave the LAST projector's noise
        # in G; per-pivot merging is the closest functional equivalent).
        print("multi-id tuning over all pivots ...")
        for name, w_pivot, noise, target, c in pivots:
            tuned = pivotal_tune(G, _with_noise(tuned, noise), w_pivot, target, c,
                                 PtiConfig(max_steps=max(tcfg.max_steps // len(pivots), 20),
                                           lpips_threshold=tcfg.lpips_threshold))
        save_checkpoint(os.path.join(args.outdir, "model_multi_id"),
                        {"G_ema": tuned}, config=G.cfg)
        for name, w_pivot, noise, target, c in pivots:
            _save_viz(G, tuned, w_pivot, target, c, args, name)

    print(f"done: {args.outdir}")


def _with_noise(g_params, noise):
    """Merge projector-optimized noise buffers into a params tree (no-op for
    --no-noise-opt runs, where the projector returns an empty dict)."""
    if not noise:
        return g_params
    from ..train.pti import merge_noise

    return {**g_params, "synthesis": merge_noise(g_params["synthesis"], noise)}


def _save_viz(G, g_params, w_pivot, target, c, args, name):
    import jax
    import jax.numpy as jnp

    from .. import render
    from .common import save_image_grid

    recon = jax.jit(lambda p, w, c: G.synthesis(p["synthesis"], w, c, noise_mode="const"))(
        g_params, w_pivot, c
    )
    pair = np.concatenate([np.asarray(target), np.asarray(recon)], axis=0)
    save_image_grid(pair, os.path.join(args.outdir, f"{name}_compare.png"), grid=(2, 1))

    if args.video:
        from .common import write_video

        frames = []
        for i in range(60):
            yaw = math.pi / 2 + 0.5 * math.sin(2 * math.pi * i / 60)
            c2w = render.look_at_pose(yaw, math.pi / 2, [0.0, 0.0, 0.2], radius=2.7)
            img = jax.jit(
                lambda p, w, cc: G.synthesis(p["synthesis"], w, cc, noise_mode="const")
            )(g_params, w_pivot, render.make_label_25(c2w))
            frames.append(
                np.rint((np.asarray(img[0]) + 1) * 127.5).clip(0, 255).astype(np.uint8)
            )
        write_video(os.path.join(args.outdir, f"{name}_orbit.mp4"), frames, fps=24)


if __name__ == "__main__":
    main()
