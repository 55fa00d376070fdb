"""Phase-split profile of the jitted GAN train step on real hardware.

Times isolated sub-programs of train/gan.make_gan_train_step — D loss
grad (G fwd + D fwd/bwd), G loss grad (G fwd/bwd + D fwd), R1 double
backward, plain G forward, optimizer+EMA tail — each as its own jitted
program with bench.py's timing discipline (per-iteration scalar readback
minus measured dispatch RTT), so training-throughput work targets the real
bottleneck instead of a guess.

    python tools/profile_train_step.py --iters 8 --batch 4
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args_, iters, rtt):
    # warm (compile)
    out = fn(*args_)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    ts = []
    for _i in range(iters):
        t0 = time.perf_counter()
        out = fn(*args_)
        _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    return max(np.median(ts) - rtt, 0.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
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
    tcfg = GanTrainConfig()
    D = Discriminator(DiscriminatorConfig(
        img_resolution=G.cfg.img_resolution,
        img_channels=d_input_channels(tcfg, G.cfg)))
    state = init_gan_state(jax.random.PRNGKey(0), G, D, tcfg)

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
    z = jax.random.normal(kz, (B, G.cfg.z_dim))
    ada_p = jnp.asarray(0.5, jnp.float32)
    rng = jax.random.PRNGKey(2)
    rtt = _rtt_baseline()
    print(f"rtt baseline {rtt*1e3:.1f} ms; batch {B}, steps "
          f"{args.num_steps}+{args.num_steps}")

    # rebuild the internal loss closures exactly as make_gan_train_step does
    import ide3d_tpu.train.gan as gan_mod
    step = make_gan_train_step(G, D, tcfg)

    # Full step (reference point). Donation: copy state.
    state2, _ = step(jax.tree_util.tree_map(jnp.copy, state), batch, rng, ada_p)
    t_full = timed(
        lambda s, b, r, p: step(jax.tree_util.tree_map(jnp.copy, s), b, r, p)[1]["loss_d"],
        (state2, batch, rng, ada_p), args.iters, rtt)
    print(f"full step                 {t_full*1e3:8.1f} ms "
          f"({B/t_full:.2f} imgs/s)")

    # --- isolated pieces, built from the module's own internals via a
    # throwaway make to grab closures is invasive; instead re-express them:
    from ide3d_tpu.train.augment import augment_d_input

    def synth_full(params_g, z, c, rng):
        ws = G.mapping(params_g["mapping"], z, c)
        return G.synthesis(params_g["synthesis"], ws, c,
                           noise_mode="random", rng=rng, return_all=True)

    def d_in(out, c):
        rawu = jax.image.resize(out["img_raw"],
                                (B, R, R, out["img_raw"].shape[-1]), "bilinear")
        return jnp.concatenate([out["img"], rawu, out["seg"]], axis=-1)

    @jax.jit
    def g_fwd(params_g, z, c, rng):
        return synth_full(params_g, z, c, rng)["img"].sum()

    t = timed(g_fwd, (state.params_g, z, batch["c"], rng), args.iters, rtt)
    print(f"G fwd (512+seg, no grad)  {t*1e3:8.1f} ms")

    def _sum_all(tree):
        # sum over EVERY leaf: a single-leaf readback lets XLA dead-code the
        # rest of the backward (a w_avg-only readback once measured 6.6 ms
        # for the whole G backward — pure DCE)
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(tree))

    @jax.jit
    def g_loss_grad(params_g, params_d, z, c, rng):
        def loss(pg):
            out = synth_full(pg, z, c, rng)
            return D(params_d, d_in(out, c), c).mean()
        return _sum_all(jax.grad(loss)(params_g))

    t = timed(g_loss_grad, (state.params_g, state.params_d, z, batch["c"], rng),
              args.iters, rtt)
    print(f"G loss fwd+bwd            {t*1e3:8.1f} ms")

    @jax.jit
    def d_loss_grad(params_d, params_g, batch, z, rng):
        def loss(pd):
            out = synth_full(params_g, z, batch["c"], rng)
            fl = D(pd, jax.lax.stop_gradient(d_in(out, batch["c"])), batch["c"])
            rs = G.cfg.render_size
            rraw = jax.image.resize(batch["img"], (B, rs, rs, 3), "bilinear")
            rup = jax.image.resize(rraw, batch["img"].shape, "bilinear")
            rin = jnp.concatenate([batch["img"], rup, batch["seg"]], axis=-1)
            rl = D(pd, rin, batch["c"])
            return jnp.mean(jax.nn.softplus(fl)) + jnp.mean(jax.nn.softplus(-rl))
        return _sum_all(jax.grad(loss)(params_d))

    t = timed(d_loss_grad, (state.params_d, state.params_g, batch, z, rng),
              args.iters, rtt)
    print(f"D loss fwd+bwd (G fwd in) {t*1e3:8.1f} ms")

    # isolate the renderer gather's backward (scatter-add into the planes):
    # grad of the raw neural render w.r.t. the SYNTHESIS params only
    @jax.jit
    def g_bwd_raw(params_g, z, c, rng):
        ws = G.mapping(params_g["mapping"], z, c)

        def loss(ps):
            out = G.synthesis(ps, ws, c, noise_mode="random", rng=rng,
                              return_all=True)
            return jnp.sum(out["img_raw"])
        return _sum_all(jax.grad(loss)(params_g["synthesis"]))

    t = timed(g_bwd_raw, (state.params_g, z, batch["c"], rng), args.iters, rtt)
    print(f"G raw-render fwd+bwd      {t*1e3:8.1f} ms (plane scatter probe)")

    @jax.jit
    def r1_grad(params_d, batch, rng):
        def pen(pd):
            def d_sum(img):
                rs = G.cfg.render_size
                rraw = jax.image.resize(img, (B, rs, rs, 3), "bilinear")
                rup = jax.image.resize(rraw, img.shape, "bilinear")
                rin = jnp.concatenate([img, rup, batch["seg"]], axis=-1)
                return D(pd, rin, batch["c"]).sum()
            g = jax.grad(d_sum)(batch["img"])
            return jnp.sum(jnp.square(g)) / B
        return _sum_all(jax.grad(pen)(params_d))

    t = timed(r1_grad, (state.params_d, batch, rng), args.iters, rtt)
    print(f"R1 double-bwd (D only)    {t*1e3:8.1f} ms (/{tcfg.r1_interval} lazy)")

    # optimizer+EMA tail: apply zero grads + EMA over the params tree
    import optax
    opt = optax.adam(1e-3, b1=0.0, b2=0.99)
    opt_state = opt.init(state.params_g)

    @jax.jit
    def tail(params_g, opt_state, ema):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params_g)
        upd, opt_state = opt.update(zeros, opt_state, params_g)
        params_g = optax.apply_updates(params_g, upd)
        ema = jax.tree_util.tree_map(lambda e, p: e * 0.998 + p * 0.002,
                                     ema, params_g)
        return jax.tree_util.tree_leaves(ema)[0].sum()

    t = timed(tail, (state.params_g, opt_state, state.params_g_ema),
              args.iters, rtt)
    print(f"G opt+EMA tail            {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
