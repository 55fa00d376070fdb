"""IDE-3D GAN training driver — the loop the reference never shipped
(README.md:186 "Training scipts will be released soon").

Usage:
    python -m ide3d_tpu.apps.train_gan --data imgs/ --seg segs/ --outdir runs/g0 \
        --batch 8 --kimg 25000 [--resume ckpt_dir]

Structure mirrors a StyleGAN2-ADA loop: host-sharded infinite loader, one jitted
train step over the device mesh (train/gan.py), ADA p-controller, G_ema snapshots
(orbax), periodic sample grids + metric evaluation, JSONL stats.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--seg", required=True)
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--kimg", type=float, default=25000)
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--snap-kimg", type=int, default=200)
    ap.add_argument("--grid-kimg", type=int, default=50)
    ap.add_argument("--ada-target", type=float, default=0.6)
    ap.add_argument("--ada-speed", type=float, default=500.0,
                    help="ADA adjustment speed in kimg (stylegan2-ada ada_kimg; "
                         "lower = faster p adaptation, useful on small datasets)")
    ap.add_argument("--ada-pmax", type=float, default=1.0,
                    help="cap on ADA p (prevents runaway G collapse when D "
                         "memorizes a tiny dataset and rt pins above target; "
                         "TRAINING.md)")
    ap.add_argument("--no-ada", action="store_true")
    ap.add_argument("--fixed-ada-p", type=float, default=None,
                    help="hold ADA at this constant p instead of running the "
                         "adaptive controller (controlled A/Bs of the "
                         "augmentation pipe itself, e.g. wavelet vs bilinear "
                         "warp, need both legs to see the SAME augmentation "
                         "rate from step 0)")
    ap.add_argument("--wavelet-aa", action="store_true",
                    help="reference-parity sym6 wavelet anti-aliasing around "
                         "the ADA geometric warp (training/augment.py:172); "
                         "default is the direct bilinear warp")
    ap.add_argument("--r1-gamma", type=float, default=None,
                    help="R1 penalty weight; default = the StyleGAN2-ADA "
                         "heuristic 0.0002*resolution^2/batch (train.py gamma "
                         "auto-config). Round-4 run A trained at 1.0 on a "
                         "512^2/batch-4 shape whose heuristic is ~13 and "
                         "collapsed (TRAINING.md) — don't hardcode a "
                         "resolution-independent default.")
    ap.add_argument("--pl-weight", type=float, default=0.0,
                    help="StyleGAN2 path-length regularization weight (0 = off)")
    ap.add_argument("--resume", default=None)
    ap.add_argument("--metrics", default="",
                    help="comma list (e.g. fid,kid) evaluated on G_ema at every "
                         "snapshot + at the end, reported to metric-<name>.jsonl "
                         "(the reference training convention: StyleGAN2-ADA "
                         "train loop + metric_main.report_metric)")
    ap.add_argument("--metric-items", type=int, default=500)
    ap.add_argument("--metric-detector", choices=["pixel", "inception", "vgg16"],
                    default="pixel")
    ap.add_argument("--metric-detector-weights", default=None,
                    help="torch state_dict (.pth) for the metric detector")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--fused-step", action="store_true",
                    help="compile the train step as ONE XLA program instead of "
                         "the split-phase default (measured ~6% slower at full "
                         "scale; kept for A/B and debugging)")
    ap.add_argument("--preset", choices=["full", "small", "tiny"], default="full",
                    help="tiny = smoke-test scale (CI / CPU); small = 64px "
                         "single-chip validation scale (synthetic-data runs)")
    ap.add_argument("--platform", default=None, help="force jax platform (e.g. cpu)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from .. import render
    from ..data import CameraLabeledDataset, infinite_loader
    from ..io.checkpoint import load_checkpoint, save_checkpoint
    from ..models import Discriminator, DiscriminatorConfig, GeneratorConfig, Ide3dGenerator
    from ..parallel import create_mesh, prefetch_to_device, replicate
    from ..parallel.stats import StatsAccumulator
    from ..train import GanTrainConfig, init_gan_state, make_gan_train_step
    from ..train.augment import AdaState, ada_accumulate, ada_init, ada_update
    from ..train.gan import GanTrainState, d_input_channels
    from ..utils.seg import mask2color
    from .common import save_image_grid

    if args.platform:
        import jax as _jax

        _jax.config.update("jax_platforms", args.platform)

    os.makedirs(args.outdir, exist_ok=True)
    if args.preset == "tiny":
        from ..render.renderer import RenderParams

        gcfg = GeneratorConfig(
            img_resolution=args.resolution, render_size=8, plane_resolution=16,
            channel_base=512, channel_max=32, sr_channel_base=256, sr_channel_max=16,
            feature_channels=8, dtype="float32",
            render=RenderParams(img_size=8, num_steps=4),
        )
    elif args.preset == "small":
        from ..render.renderer import RenderParams

        gcfg = GeneratorConfig(
            img_resolution=args.resolution, render_size=16, plane_resolution=64,
            channel_base=8192, channel_max=128, sr_channel_base=4096,
            sr_channel_max=64, feature_channels=16, dtype="float32",
            render=RenderParams(img_size=16, num_steps=12),
        )
    else:
        gcfg = GeneratorConfig(img_resolution=args.resolution)
    from ..train.augment import AugmentConfig

    if args.r1_gamma is None:
        # StyleGAN2-ADA auto gamma: 0.0002 * resolution^2 / batch
        args.r1_gamma = 0.0002 * gcfg.img_resolution ** 2 / args.batch
        print(f"r1-gamma (auto): {args.r1_gamma:.3g}")
    tcfg = GanTrainConfig(r1_gamma=args.r1_gamma, use_ada=not args.no_ada,
                          pl_weight=args.pl_weight,
                          aug=AugmentConfig(wavelet_aa=args.wavelet_aa))
    G = Ide3dGenerator(gcfg)
    D = Discriminator(
        DiscriminatorConfig(
            img_resolution=gcfg.img_resolution,
            img_channels=d_input_channels(tcfg, gcfg),
        )
    )

    n_dev = len(jax.devices())
    while args.batch % n_dev:
        n_dev -= 1
    mesh = create_mesh(n_dev)
    print(f"mesh: {n_dev} device(s); global batch {args.batch}")

    dataset = CameraLabeledDataset(args.data, args.seg, resolution=args.resolution,
                                   xflip=True)
    # compact wire batches (uint8 img + uint8 seg indices, ~22x fewer bytes);
    # the train step expands them on device (train/gan.py expand_compact_batch).
    # prefetch_to_device double-buffers the transfer behind the running step
    # (the 4 MB/step wire copy was the whole loop-vs-step gap, PERF.md).
    loader = prefetch_to_device(
        infinite_loader(dataset, args.batch, seed=args.seed, compact=True), mesh)

    if args.resume:
        # restore INTO a freshly-initialized state: orbax needs the template to
        # rebuild the optax NamedTuple structure (io/checkpoint.py)
        tmpl = init_gan_state(jax.random.PRNGKey(args.seed), G, D, tcfg)
        params, meta = load_checkpoint(
            args.resume,
            template={"G": tmpl.params_g, "D": tmpl.params_d,
                      "G_ema": tmpl.params_g_ema, "opt_g": tmpl.opt_g,
                      "opt_d": tmpl.opt_d, "pl_mean": tmpl.pl_mean},
        )
        state = GanTrainState(
            step=jnp.asarray(meta.get("step", 0), jnp.int32),
            params_g=params["G"], params_d=params["D"],
            params_g_ema=params["G_ema"],
            opt_g=params["opt_g"], opt_d=params["opt_d"],
            pl_mean=jnp.asarray(params.get("pl_mean", 0.0), jnp.float32),
        )
        start_img = int(meta.get("step", 0)) * args.batch
    else:
        state = init_gan_state(jax.random.PRNGKey(args.seed), G, D, tcfg)
        start_img = 0
    state = replicate(mesh, state)

    # split-phase step: two chained XLA programs, measured ~6% faster than the
    # fused single program at the flagship config (PERF.md); numerically
    # identical (tests/test_train.py::test_gan_train_step_split_matches_fused)
    step_fn = make_gan_train_step(G, D, tcfg, mesh=mesh,
                                  split=not args.fused_step)
    ada = ada_init()
    ada_p = 0.0
    if args.resume:
        ada_p = float(meta.get("ada_p", 0.0))
        ada = AdaState(p=float(ada_p), rt_accum=(0.0, 0.0))
    if args.fixed_ada_p is not None:
        ada_p = args.fixed_ada_p
    acc = StatsAccumulator()

    metric_names = [m.strip() for m in args.metrics.split(",") if m.strip()]
    if metric_names:
        from ..metrics import calc_metric
        from ..metrics.features import make_detector

        met_det, met_dp = make_detector(args.metric_detector,
                                        args.metric_detector_weights)
        # real-side stats come from the UN-mirrored dataset (the reference
        # fid50k_full convention pins xflip=False for metrics even when
        # training mirrors) — the training loader's xflip copies would
        # otherwise contaminate the cached real feature bank
        metric_dataset = CameraLabeledDataset(
            args.data, args.seg, resolution=args.resolution, xflip=False)
        metric_done = set()

        def eval_metrics(g_ema, kimg):
            if kimg in metric_done:  # final save can coincide with a snapshot
                return
            metric_done.add(kimg)
            # dataset stats hit the disk cache after the first snapshot; only
            # the generator-side extraction reruns.
            for name in metric_names:
                rec = calc_metric(
                    name, G=G, g_params=g_ema, dataset=metric_dataset,
                    detector=met_det, detector_params=met_dp,
                    num_items=args.metric_items, batch_size=args.batch,
                    cache_dir=os.path.join(args.outdir, ".metric_cache"),
                    mesh=mesh,
                )
                line = {"kimg": kimg, **rec}
                print(json.dumps(line, default=float))
                with open(os.path.join(args.outdir, f"metric-{name}.jsonl"), "a") as f:
                    f.write(json.dumps(line, default=float) + "\n")
    else:
        def eval_metrics(g_ema, kimg):
            pass

    grid_z = jnp.asarray(np.random.RandomState(1).randn(16, gcfg.z_dim), jnp.float32)
    grid_c = jnp.broadcast_to(jnp.asarray(render.CANONICAL_POSE_25), (16, 25))

    @jax.jit
    def snapshot_grid(g_ema):
        ws = G.mapping(g_ema["mapping"], grid_z, grid_c, truncation_psi=0.7)
        return G.synthesis(g_ema["synthesis"], ws, grid_c, return_seg=True)

    cur_img = start_img
    next_snap = cur_img + args.snap_kimg * 1000
    next_grid = cur_img
    t_start = time.time()
    key = jax.random.PRNGKey(args.seed + 1)
    sign_buf = []  # deferred-readback ADA sign statistics (see below)

    while cur_img < args.kimg * 1000:
        sbatch = next(loader)  # already device-placed by prefetch_to_device
        key, k_step = jax.random.split(key)
        # ADA runs INSIDE the jitted step (same per-sample transform for real and
        # fake D inputs, seg warped with the RGB); ada_p is a traced scalar so
        # controller updates never recompile.
        repl = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        state, stats = step_fn(
            state, sbatch, jax.device_put(k_step, repl),
            jax.device_put(jnp.asarray(ada_p, jnp.float32), repl),
        )
        cur_img += args.batch

        acc.update({k: v for k, v in stats.items()})
        if not args.no_ada and args.fixed_ada_p is None:
            # per-sample sign statistic computed in-jit over the global batch.
            # Buffer the DEVICE array and force it only at the controller's
            # 4-step update boundary: a per-step float() readback serializes
            # host and device (each iteration pays dispatch RTT + full step
            # latency; measured ~17% of the tunneled flagship loop, PERF.md
            # round 4) — deferring keeps 4 steps in flight.
            sign_buf.append(stats["real_signs"])
            if (cur_img // args.batch) % 4 == 0:
                for s in sign_buf:
                    ada = ada_accumulate(ada, float(np.asarray(s)), args.batch)
                sign_buf.clear()
                ada = ada_update(ada, args.batch * 4, target=args.ada_target,
                                 speed_kimg=args.ada_speed, p_max=args.ada_pmax)
                ada_p = float(ada.p)

        if cur_img % (args.batch * 100) == 0:
            # interval MEANS, not the last step's instantaneous values (lazy
            # regularizers like R1/PL fire on a sub-interval and would otherwise
            # always print as 0)
            line = {
                "kimg": cur_img / 1000,
                "time_h": (time.time() - t_start) / 3600,
                "ada_p": ada_p,
                **{k: acc.mean(k) for k in sorted(stats)},
            }
            acc.reset()
            print(json.dumps(line, default=float))
            with open(os.path.join(args.outdir, "stats.jsonl"), "a") as f:
                f.write(json.dumps(line, default=float) + "\n")

        if cur_img >= next_grid:
            img, seg = snapshot_grid(state.params_g_ema)
            save_image_grid(np.asarray(img), os.path.join(args.outdir,
                            f"fakes{cur_img//1000:06d}.png"), grid=(4, 4))
            save_image_grid(np.asarray(mask2color(seg)) / 127.5 - 1.0,
                            os.path.join(args.outdir, f"fakes{cur_img//1000:06d}_seg.png"),
                            grid=(4, 4))
            next_grid = cur_img + args.grid_kimg * 1000

        if cur_img >= next_snap:
            save_checkpoint(
                os.path.join(args.outdir, f"snapshot-{cur_img//1000:06d}"),
                {"G": state.params_g, "D": state.params_d, "G_ema": state.params_g_ema,
                 "opt_g": state.opt_g, "opt_d": state.opt_d,
                 "pl_mean": state.pl_mean},
                config=gcfg, step=int(state.step), ada_p=ada_p,
            )
            eval_metrics(state.params_g_ema, cur_img / 1000)
            next_snap = cur_img + args.snap_kimg * 1000

    if sign_buf:
        # loop ended mid-window: flush the buffered sign statistics so the
        # final checkpoint's ada_p reflects every step (VERDICT r4 hygiene)
        for s in sign_buf:
            ada = ada_accumulate(ada, float(np.asarray(s)), args.batch)
        ada = ada_update(ada, args.batch * len(sign_buf), target=args.ada_target,
                         speed_kimg=args.ada_speed, p_max=args.ada_pmax)
        ada_p = float(ada.p)
        sign_buf.clear()

    save_checkpoint(
        os.path.join(args.outdir, "snapshot-final"),
        {"G": state.params_g, "D": state.params_d, "G_ema": state.params_g_ema,
         "opt_g": state.opt_g, "opt_d": state.opt_d, "pl_mean": state.pl_mean},
        config=gcfg, step=int(state.step), ada_p=ada_p,
    )
    eval_metrics(state.params_g_ema, cur_img / 1000)
    print("done")


if __name__ == "__main__":
    main()
