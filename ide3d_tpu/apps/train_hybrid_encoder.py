"""Hybrid-encoder training driver (CLI contract: apps/train_hybrid_encoder.py:394-431).

Usage:
    python -m ide3d_tpu.apps.train_hybrid_encoder --network <G ckpt|random:0> \
        --data imgs/ --seg segs/ --outdir runs/e0 --batch 8 --max-steps 100000 \
        [--bisenet segNet-20Class.pth] [--resume ckpt]

One jitted step covers both synthetic and real branches (train/encoder.py); batch
sharded over the device mesh ('data'); snapshots every --snap steps with
start_iter for resume (reference :385-392).
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--network", required=True)
    ap.add_argument("--data", default=None)
    ap.add_argument("--seg", default=None)
    ap.add_argument("--bisenet", default=None)
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--max-steps", type=int, default=100000)
    ap.add_argument("--snap", type=int, default=10000)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--truncation", type=float, default=1.0)
    ap.add_argument("--no-gen-branch", action="store_true")
    ap.add_argument("--vgg-weights", default=None,
                    help="torch VGG19 state_dict for the perceptual loss")
    ap.add_argument("--lpips-weights", default=None,
                    help="torch LPIPS state_dict")
    ap.add_argument("--arcface-weights", default=None,
                    help="torch IR-SE50 state_dict for the ID loss")
    ap.add_argument("--resume", default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from .. import render
    from ..io.checkpoint import load_checkpoint, save_checkpoint
    from ..models.bisenet import BiSeNet
    from ..models.encoder import HybridEncoder
    from ..parallel import create_mesh, replicate, shard_batch
    from ..train import EncoderTrainConfig, init_encoder_state, make_encoder_train_step
    from ..train.encoder import EncoderTrainState
    from .common import load_generator

    os.makedirs(args.outdir, exist_ok=True)
    G, g_params = load_generator(args.network)
    R = G.cfg.img_resolution
    n_geo = G.synthesis.num_ws_geo
    E = HybridEncoder(size=R, n_latents_app=G.num_ws - n_geo, n_latents_geo=n_geo,
                      w_dim=G.cfg.w_dim)
    tcfg = EncoderTrainConfig(lr=args.lr, truncation=args.truncation,
                              train_gen=not args.no_gen_branch,
                              train_real=args.data is not None)

    bis = bp = None
    if args.bisenet:
        from ..io.torch_import import import_bisenet

        bis = BiSeNet(20)
        bp = import_bisenet(args.bisenet)

    # Perceptual / ID loss callbacks (apps/train_hybrid_encoder.py:304-322 parity)
    vgg_feats = lpips_fn = id_embed = None
    if args.vgg_weights:
        from ..io.torch_import import load_torch_state_dict, state_dict_to_tree
        from ..metrics.features import VGG16Features

        vgg = VGG16Features(cfg_name="vgg19")
        vgg_p = state_dict_to_tree(load_torch_state_dict(args.vgg_weights))
        vgg_feats = lambda x: vgg.feature_maps(vgg_p, x)
    if args.lpips_weights:
        from ..io.torch_import import load_torch_state_dict, state_dict_to_tree
        from ..metrics.lpips import LPIPS

        lp = LPIPS()
        lp_p = state_dict_to_tree(load_torch_state_dict(args.lpips_weights))
        lpips_fn = lambda x, y: lp(lp_p, x, y)
    if args.arcface_weights:
        from ..io.torch_import import load_torch_state_dict, state_dict_to_tree
        from ..models.arcface import ArcFaceIRSE50

        arc = ArcFaceIRSE50()
        arc_p = state_dict_to_tree(load_torch_state_dict(args.arcface_weights))
        id_embed = lambda x: arc.embed_faces(arc_p, x)

    n_dev = len(jax.devices())
    while args.batch % n_dev:
        n_dev -= 1
    mesh = create_mesh(n_dev)
    if args.resume:
        # restore INTO a freshly-initialized state: orbax needs the template to
        # rebuild the optax NamedTuple structure (io/checkpoint.py)
        tmpl = init_encoder_state(jax.random.PRNGKey(args.seed), E, tcfg)
        params, meta = load_checkpoint(
            args.resume, template={"E": tmpl.params_e, "opt_e": tmpl.opt_e}
        )
        state = EncoderTrainState(
            step=jnp.asarray(meta.get("step", 0), jnp.int32),
            params_e=params["E"], opt_e=params["opt_e"],
        )
    else:
        state = init_encoder_state(jax.random.PRNGKey(args.seed), E, tcfg)
    state = replicate(mesh, state)
    g_params = replicate(mesh, g_params)
    if bp is not None:
        bp = replicate(mesh, bp)

    step_fn = make_encoder_train_step(
        E, G, tcfg, bisenet=bis, vgg_feats=vgg_feats, lpips_fn=lpips_fn,
        id_embed=id_embed, mesh=mesh,
    )

    loader = None
    if args.data:
        from ..data import CameraLabeledDataset, infinite_loader

        ds = CameraLabeledDataset(args.data, args.seg, resolution=R)
        # compact uint8 wire batches, expanded on device inside the jitted
        # step (train/gan.py expand_compact_batch; ~22x fewer H2D bytes);
        # prefetch_to_device overlaps the transfer with the running step
        from ..parallel import prefetch_to_device

        loader = prefetch_to_device(
            infinite_loader(ds, args.batch, seed=args.seed, compact=True), mesh)

    key = jax.random.PRNGKey(args.seed + 1)
    t0 = time.time()
    start = int(np.asarray(state.step))
    for i in range(start, args.max_steps):
        if loader is not None:
            sbatch = next(loader)  # device-placed by prefetch_to_device
        else:
            sbatch = shard_batch(mesh, {
                "c": np.broadcast_to(render.CANONICAL_POSE_25, (args.batch, 25)).copy()
            })
        key, k = jax.random.split(key)
        state, stats = step_fn(state, g_params, bp, sbatch, jax.device_put(
            k, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())))

        if i % 100 == 0:
            line = {"step": i, "time_h": (time.time() - t0) / 3600,
                    **{k_: float(np.asarray(v)) for k_, v in stats.items()}}
            print(json.dumps(line, default=float))
            with open(os.path.join(args.outdir, "stats.jsonl"), "a") as f:
                f.write(json.dumps(line, default=float) + "\n")

        if (i + 1) % args.snap == 0 or (i + 1) == args.max_steps:
            save_checkpoint(os.path.join(args.outdir, f"encoder-{i+1:08d}"),
                            {"E": state.params_e, "opt_e": state.opt_e},
                            step=i + 1)
    print("done")


if __name__ == "__main__":
    main()
