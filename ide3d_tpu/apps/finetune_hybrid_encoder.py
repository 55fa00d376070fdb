"""Per-image encoder finetuning toward a PTI pivot.

CLI contract: apps/finetune_hybrid_encoder.py:69-216 — align the encoder output
with a target code for one image: smooth-L1(ws, target) + L2(recon) + cycle
(:157-183); saves the finetuned encoder params + the mask used.

Usage:
    python -m ide3d_tpu.apps.finetune_hybrid_encoder --network random:0 \
        --encoder random:0 --img face.png --mask mask.png \
        --target-code pivots/0.npz --steps 100 --outdir out/
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--network", required=True)
    ap.add_argument("--encoder", default="random:0")
    ap.add_argument("--img", required=True)
    ap.add_argument("--mask", required=True)
    ap.add_argument("--target-code", required=True)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--outdir", required=True)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from .. import render
    from ..io.checkpoint import load_pytree_npz, save_checkpoint
    from ..models.encoder import HybridEncoder
    from ..train import losses as L
    from ..utils.seg import mask2onehot
    from .common import load_generator
    from .infer_hybrid_encoder import load_image, load_mask

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

    img = jnp.asarray(load_image(args.img, R))[None]
    seg = mask2onehot(jnp.asarray(load_mask(args.mask, R))[None]) * 2.0 - 1.0
    target_ws = jnp.asarray(load_pytree_npz(args.target_code)["ws"])
    c = jnp.asarray(render.CANONICAL_POSE_25)[None]
    w_avg = g_params["mapping"]["w_avg"][None, None, :]

    opt = optax.adam(args.lr)
    opt_state = opt.init(e_params)

    def loss_fn(e_params):
        rec_ws = E(e_params, img, seg) + w_avg
        l_ws = L.smooth_l1(rec_ws, target_ws) * 50.0
        rec_img, rec_seg = G.synthesis(g_params["synthesis"], rec_ws, c, return_seg=True)
        l_img = L.l2(rec_img, img)
        cyc_ws = E(e_params, img, jnp.tanh(rec_seg)) + w_avg
        l_cyc = L.smooth_l1(jax.lax.stop_gradient(rec_ws), cyc_ws)
        return l_ws + l_img + l_cyc, {"ws": l_ws, "img": l_img, "cyc": l_cyc}

    @jax.jit
    def step(e_params, opt_state):
        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(e_params)
        updates, opt_state = opt.update(grads, opt_state, e_params)
        return optax.apply_updates(e_params, updates), opt_state, loss

    for i in range(args.steps):
        e_params, opt_state, loss = step(e_params, opt_state)
        if i % 20 == 0:
            print(f"step {i}: loss {float(loss):.4f}")

    os.makedirs(args.outdir, exist_ok=True)
    save_checkpoint(os.path.join(args.outdir, "finetuned_encoder"), e_params)
    print(f"wrote {args.outdir}/finetuned_encoder")


if __name__ == "__main__":
    main()
