"""A/B the REAL train-step phases and feature costs on hardware.

Unlike tools/profile_train_step.py (which times re-derived approximations of
the loss programs), this times the step's OWN compiled phases (split mode
exposes d_jit/g_jit) and then A/Bs config features by rebuilding the step:

    base          : flagship GanTrainConfig (ADA on, mixing 0.9, gpc 0.5)
    no_ada        : use_ada=False     (in-loss 512^2 warps, real+fake+R1)
    no_mixing     : style_mixing_prob=0 (second mapping pass + where)
    no_seg_d      : use_seg_d=False   (19 fewer D input channels)
    no_extras     : all three off     (floor of the core GAN step)

    python tools/ab_train_step.py --iters 6 --batch 4
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--num-steps", type=int, default=96)
    args = ap.parse_args()

    from bench import _rtt_baseline
    from ide3d_tpu import render
    from ide3d_tpu.models.discriminator import Discriminator, DiscriminatorConfig
    from ide3d_tpu.models.generator import GeneratorConfig, Ide3dGenerator
    from ide3d_tpu.render import RenderParams
    from ide3d_tpu.train.gan import (GanTrainConfig, d_input_channels,
                                     init_gan_state, make_gan_train_step)

    rp = RenderParams(img_size=64, num_steps=args.num_steps,
                      fine_steps=args.num_steps, hierarchical=True)
    G = Ide3dGenerator(GeneratorConfig(render=rp))
    B, R = args.batch, G.cfg.img_resolution
    key = jax.random.PRNGKey(1)
    k_img, k_seg, kz = jax.random.split(key, 3)
    batch = {
        "img": jax.random.uniform(k_img, (B, R, R, 3), minval=-1, maxval=1),
        "seg": jax.nn.one_hot(
            jax.random.randint(k_seg, (B, R, R), 0, G.cfg.seg_channels),
            G.cfg.seg_channels) * 2.0 - 1.0,
        "c": jnp.broadcast_to(jnp.asarray(render.CANONICAL_POSE_25), (B, 25)),
    }
    rng = jax.random.PRNGKey(2)
    ada_p = jnp.asarray(0.5, jnp.float32)
    rtt = _rtt_baseline()
    print(f"rtt {rtt*1e3:.1f} ms; batch {B}, {args.num_steps}+{args.num_steps}")

    def time_step(tag, tcfg, phases=False):
        D = Discriminator(DiscriminatorConfig(
            img_resolution=R, img_channels=d_input_channels(tcfg, G.cfg)))
        state = init_gan_state(jax.random.PRNGKey(0), G, D, tcfg)
        step = make_gan_train_step(G, D, tcfg, split=True)
        state, stats = step(state, batch, rng, ada_p)   # warm/compile
        _ = float(stats["loss_d"])
        ts = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            state, stats = step(state, batch, jax.random.fold_in(rng, i), ada_p)
            _ = float(stats["loss_d"])
            ts.append(time.perf_counter() - t0)
        t = max(np.median(ts) - rtt, 0.0)
        print(f"{tag:12s} {t*1e3:8.1f} ms/step ({B/t:.2f} imgs/s)")
        if phases:
            # time each compiled phase alone (same arrays the step feeds it).
            # fake_reuse order: g_jit first (returns the fake triple), then
            # d_jit consumes it; legacy order: d_jit first.
            g_args = (state.params_g, state.opt_g, state.params_g_ema,
                      state.pl_mean, state.step, state.params_d, batch, rng,
                      ada_p)
            fakes = None
            # donated args: make ALL iteration copies BEFORE timing (the
            # per-leaf copy dispatches hundreds of tiny programs over the
            # tunnel and used to inflate phase time ~4x)
            copies = [jax.tree_util.tree_map(jnp.copy, g_args[:4])
                      for _ in range(args.iters)]
            jax.block_until_ready(copies)
            ts = []
            for i in range(args.iters):
                t0 = time.perf_counter()
                out = step.g_jit(*copies[i], *g_args[4:])
                _ = float(out[4]["loss_g"])
                ts.append(time.perf_counter() - t0)
            tg = max(np.median(ts) - rtt, 0.0)
            if tcfg.fake_reuse:
                fakes = out[5]
            d_args = (state.params_d, state.opt_d, state.step, state.params_g,
                      batch, rng, ada_p)
            if tcfg.fake_reuse:
                d_args = d_args + (fakes,)
            copies = [jax.tree_util.tree_map(jnp.copy, d_args[:2])
                      for _ in range(args.iters)]
            jax.block_until_ready(copies)
            ts = []
            for i in range(args.iters):
                t0 = time.perf_counter()
                out = step.d_jit(*copies[i], *d_args[2:])
                _ = float(out[2]["loss_d"])
                ts.append(time.perf_counter() - t0)
            td = max(np.median(ts) - rtt, 0.0)
            print(f"  g_phase    {tg*1e3:8.1f} ms   d_phase {td*1e3:8.1f} ms "
                  f"(sum {1e3*(td+tg):.1f})")
        return t

    base = GanTrainConfig()
    time_step("base", base, phases=True)
    time_step("no_reuse", dataclasses.replace(base, fake_reuse=False))
    time_step("no_ada", dataclasses.replace(base, use_ada=False))
    time_step("no_mixing", dataclasses.replace(base, style_mixing_prob=0.0))
    time_step("no_seg_d", dataclasses.replace(base, use_seg_d=False))
    time_step("no_extras", dataclasses.replace(
        base, use_ada=False, style_mixing_prob=0.0, use_seg_d=False,
        gpc_swap_prob=0.0))


if __name__ == "__main__":
    main()
