"""Microbench: where does the in-loss ADA cost live?

Times, at the flagship D-input scale ([B,512,512] x (3+3+19) ch):
  aug fwd          : augment_d_input forward only (the D-loss real/fake path —
                     no input grads needed there)
  aug fwd+bwd      : grad THROUGH augment_d_input w.r.t. its inputs (the G-loss
                     path: fake images need dL/dimg through the warp — its
                     transpose is a scatter-add)
  warp fwd / bwd   : the geometric warp alone (isolating vs the color matmul)

    python tools/ab_ada_cost.py --iters 8 --batch 4
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
    ap.add_argument("--res", type=int, default=512)
    args = ap.parse_args()

    from bench import _rtt_baseline
    from ide3d_tpu.train.augment import (AugmentConfig, _apply_warp,
                                         _geometry_matrix, augment_d_input)

    B, R = args.batch, args.res
    key = jax.random.PRNGKey(0)
    k1, k2, k3, kaug = jax.random.split(key, 4)
    img = jax.random.uniform(k1, (B, R, R, 3), minval=-1, maxval=1)
    raw = jax.random.uniform(k2, (B, R, R, 3), minval=-1, maxval=1)
    seg = jax.random.uniform(k3, (B, R, R, 19), minval=-1, maxval=1)
    p = jnp.asarray(0.5, jnp.float32)
    cfg = AugmentConfig()
    rtt = _rtt_baseline()
    print(f"rtt {rtt*1e3:.1f} ms; [{B},{R},{R}] x25ch, p=0.5")

    @jax.jit
    def aug_fwd(img, raw, seg):
        o = augment_d_input(kaug, img, raw, seg, p, cfg)
        return sum(jnp.sum(x) for x in o)

    t = timed(aug_fwd, (img, raw, seg), args.iters, rtt)
    print(f"aug fwd            {t*1e3:8.1f} ms")

    @jax.jit
    def aug_bwd(img, raw, seg):
        g = jax.grad(lambda a, b, c: sum(
            jnp.sum(x ** 2) for x in augment_d_input(kaug, a, b, c, p, cfg)),
            argnums=(0, 1, 2))(img, raw, seg)
        return sum(jnp.sum(x) for x in g)

    t = timed(aug_bwd, (img, raw, seg), args.iters, rtt)
    print(f"aug fwd+input-bwd  {t*1e3:8.1f} ms")

    stack = jnp.concatenate([img, raw, seg], axis=-1)
    keys = jax.random.split(kaug, 16)

    @jax.jit
    def warp_fwd(stack):
        G = _geometry_matrix(keys, p, cfg, B, R, R)
        return jnp.sum(_apply_warp(stack, G))

    t = timed(warp_fwd, (stack,), args.iters, rtt)
    print(f"warp fwd           {t*1e3:8.1f} ms")

    @jax.jit
    def warp_bwd(stack):
        G = _geometry_matrix(keys, p, cfg, B, R, R)
        return jnp.sum(jax.grad(
            lambda s: jnp.sum(_apply_warp(s, G) ** 2))(stack))

    t = timed(warp_bwd, (stack,), args.iters, rtt)
    print(f"warp fwd+input-bwd {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
