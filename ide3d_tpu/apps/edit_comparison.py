"""Qualitative edit-comparison harness.

Reference contract: `inversion/evaluation/qualitative_edit_comparison.py` +
`experiment_setting_creator.py` — for every inverted image, render the
reconstruction and a sweep of latent edits (InterFaceGAN factor ladder,
GANSpace component ladder) for EACH inversion method side by side, saving
single frames and concatenated comparison strips (save_concat_image /
save_single_image, `inversion/utils/log_utils.py`).

Inputs are the artifacts the repo's own pipeline produces:
  * `--pti` dir from apps/run_pti.py (`<name>.npz` pivots + `<name>_label.npz`
    + `model_<name>` tuned checkpoints — the 'PTI' method),
  * zero or more `--latents NAME=dir` from apps/latent_creator.py runs
    (e.g. SG2 projector, e4e) rendered with the UNtuned generator,
  * edit directions: `--directions npz` (named InterFaceGAN normals) and/or
    GANSpace PCA computed on the fly from generator samples
    (editing/latent_editor.compute_ganspace_pca).

Factor ladders mirror the reference: interfacegan ±3.0 step 0.5 (excluding 0),
ganspace -20..20 step 5 (qualitative_edit_comparison.py:102-103).

    python -m ide3d_tpu.apps.edit_comparison --network random:0 \
        --images faces/ --pti pti_out/ --latents e4e=lat_e4e/ --outdir cmp/
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def _stack_strip(frames):
    """[N, H, W, C] -> one horizontal strip [H, N*W, C]."""
    return np.concatenate(list(frames), axis=1)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--network", required=True)
    ap.add_argument("--images", required=True, help="folder of target images")
    ap.add_argument("--pti", default=None, help="apps/run_pti.py output dir")
    ap.add_argument("--latents", action="append", default=[],
                    metavar="NAME=DIR", help="latent_creator output dirs")
    ap.add_argument("--directions", default=None,
                    help="npz of named InterFaceGAN direction vectors [w_dim]")
    ap.add_argument("--interfacegan-max", type=float, default=3.0)
    ap.add_argument("--interfacegan-step", type=float, default=0.5)
    ap.add_argument("--ganspace-components", type=int, default=2)
    ap.add_argument("--ganspace-factors", default="-20,25,5",
                    help="start,stop,step (reference range(-20, 25, 5))")
    ap.add_argument("--max-images", type=int, default=8)
    ap.add_argument("--num-steps", type=int, default=None,
                    help="override sampling budget (faster previews)")
    ap.add_argument("--outdir", required=True)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from .. import render
    from ..editing.latent_editor import (apply_ganspace_edit,
                                         apply_interfacegan,
                                         compute_ganspace_pca)
    from ..io.checkpoint import load_checkpoint, load_pytree_npz
    from .common import load_generator, save_image_grid
    from .infer_hybrid_encoder import load_image

    G, g_params = load_generator(args.network)
    if args.num_steps:
        import dataclasses
        rp = dataclasses.replace(G.cfg.render, num_steps=args.num_steps,
                                 fine_steps=args.num_steps)
        G = type(G)(dataclasses.replace(G.cfg, render=rp))
    R = G.cfg.img_resolution

    synth = jax.jit(lambda p, ws, c: G.synthesis(p["synthesis"], ws, c))

    def to_u8(img):
        return np.asarray(jnp.clip((img + 1) * 127.5, 0, 255)).astype(np.uint8)

    # ---- methods: name -> (params, {image_name: ws}) ------------------------
    files = sorted(sum((glob.glob(os.path.join(args.images, e))
                        for e in ("*.png", "*.jpg", "*.jpeg")), []))[: args.max_images]
    assert files, f"no images in {args.images}"
    names = [os.path.splitext(os.path.basename(f))[0] for f in files]

    # name -> (params_for_image: dict image->tree, ws_for_image: dict image->ws)
    methods = {}  # insertion order = row order in the strips
    for spec in args.latents:
        mname, mdir = spec.split("=", 1)
        ws = {n: load_pytree_npz(os.path.join(mdir, f"{n}.npz"))["ws"]
              for n in names
              if os.path.exists(os.path.join(mdir, f"{n}.npz"))}
        methods[mname] = ({n: g_params for n in ws}, ws)
    if args.pti:
        ws, tuned = {}, {}
        for n in names:
            pnpz = os.path.join(args.pti, f"{n}.npz")
            mdir = os.path.join(args.pti, f"model_{n}")
            multi = os.path.join(args.pti, "model_multi_id")
            if not os.path.exists(pnpz):
                continue
            ws[n] = load_pytree_npz(pnpz)["ws"]
            ck = mdir if os.path.exists(mdir) else multi
            if os.path.exists(ck):
                # no template: the tuned tree is a SUPERSET of g_params
                # (projector noise buffers merged by run_pti's _with_noise),
                # and a plain nested dict restores fine without one
                t = load_checkpoint(ck)[0]
                tuned[n] = t.get("G_ema", t)
            else:
                tuned[n] = g_params
        methods["PTI"] = (tuned, ws)
    assert methods, "provide --pti and/or --latents"

    # ---- cameras + edit directions ------------------------------------------
    def label_for(n):
        for d in [args.pti] + [s.split("=", 1)[1] for s in args.latents]:
            if d and os.path.exists(os.path.join(d, f"{n}_label.npz")):
                return load_pytree_npz(os.path.join(d, f"{n}_label.npz"))["c"]
        return jnp.asarray(render.CANONICAL_POSE_25)[None]

    directions = {}
    if args.directions:
        directions = {k: jnp.asarray(v)
                      for k, v in np.load(args.directions).items()}
    gs_lo, gs_hi, gs_step = (int(x) for x in args.ganspace_factors.split(","))
    gs_factors = list(range(gs_lo, gs_hi, gs_step))
    if_factors = [f for f in np.arange(-args.interfacegan_max,
                                       args.interfacegan_max + 1e-6,
                                       args.interfacegan_step)
                  if abs(f) > 1e-9]
    # GANSpace basis from the UNtuned generator's w distribution
    pca = compute_ganspace_pca(
        G, g_params, n_samples=256, key=jax.random.PRNGKey(0),
        n_components=max(args.ganspace_components, 1))

    # ---- render loop ---------------------------------------------------------
    os.makedirs(args.outdir, exist_ok=True)
    for n, f in zip(names, files):
        base = os.path.join(args.outdir, n)
        single = os.path.join(base, "single_images")
        concat = os.path.join(base, "concat_images")
        os.makedirs(single, exist_ok=True)
        os.makedirs(concat, exist_ok=True)
        target = load_image(f, R)[None]
        save_image_grid(target, os.path.join(single, "Original.jpg"))
        c = jnp.asarray(label_for(n))

        def rows_for(edit_fn, tag):
            """One strip: [target | method rows...] for a given latent edit."""
            row_imgs = [to_u8(target[0])]
            for mname, (mp, mws) in methods.items():
                if n not in mws:
                    continue
                params = mp[n]
                ws = jnp.asarray(mws[n])
                if ws.ndim == 2:
                    ws = ws[None]
                img = synth(params, edit_fn(ws), c)
                row_imgs.append(to_u8(np.asarray(img)[0]))
                if mname == "PTI":  # reference saves singles for the new G only
                    save_image_grid(np.asarray(img),
                                    os.path.join(single, f"{tag}.jpg"))
            save_image_grid(
                _stack_strip(np.stack(row_imgs))[None].astype(np.float32)
                / 127.5 - 1.0,
                os.path.join(concat, f"{tag}.jpg"))

        rows_for(lambda ws: ws, "rec")
        for dname, dvec in directions.items():
            for fac in if_factors:
                rows_for(lambda ws, d=dvec, f2=fac: apply_interfacegan(ws, d, f2),
                         f"{dname}_{fac}")
        num_ws = G.num_ws
        for ci in range(args.ganspace_components):
            for fac in gs_factors:
                rows_for(lambda ws, i=ci, f2=fac: apply_ganspace_edit(
                    ws, pca, [(i, 0, num_ws, float(f2))]),
                    f"ganspace_c{ci}_{fac}")
        print(f"{n}: wrote {base}")
    print(f"done: {args.outdir}")


if __name__ == "__main__":
    main()
