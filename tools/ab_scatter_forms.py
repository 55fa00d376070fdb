"""Microbench: the train step's tri-plane gather + scatter-add transpose.

Device traces (tools/profile_device_trace.py) show the g_phase spends ~40% in
the quad-table gathers (fusion.2/3: take of [792588,204]bf16 at 4.72M rows per
pass) and their scatter-add transposes (fusion.6/7). This A/Bs formulations of
the exact shapes to find a cheaper one:

    python tools/ab_scatter_forms.py --iters 6
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(tag, fn, args, iters, rtt):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    ts = []
    for _i in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    t = max(np.median(ts) - rtt, 0.0)
    print(f"{tag:42s} {t*1e3:9.2f} ms")
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()
    from bench import _rtt_baseline

    rtt = _rtt_baseline()
    print(f"rtt {rtt*1e3:.1f} ms")

    ROWS, CH = 792_588, 204      # quad table (batch 4 x 3 planes x 257^2)
    N = 4_718_592                # 4 imgs x 3 planes x 4096 rays x 96 samples
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    idx = jax.random.randint(k1, (N,), 0, ROWS, dtype=jnp.int32)
    idx_sorted = jnp.sort(idx)
    cot204_bf = jax.random.normal(k2, (N, CH), jnp.bfloat16)
    cot204_f32 = cot204_bf.astype(jnp.float32)
    tab_bf = jax.random.normal(k3, (ROWS, CH), jnp.bfloat16)
    tab_f32 = tab_bf.astype(jnp.float32)

    # ---- forward gather
    take = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum())
    timed("gather bf16 204ch 4.72M rows", take, (tab_bf, idx), args.iters, rtt)
    timed("gather f32  204ch 4.72M rows", take, (tab_f32, idx), args.iters, rtt)
    timed("gather bf16 sorted idx", take, (tab_bf, idx_sorted), args.iters, rtt)
    take51 = jax.jit(lambda t, i: jnp.take(t.reshape(ROWS * 4, CH // 4), i, axis=0).sum())
    timed("gather bf16 51ch 4x rows (corner-major)", take51,
          (tab_bf, jnp.repeat(idx * 4, 4) + jnp.tile(jnp.arange(4), N)), args.iters, rtt)

    # ---- scatter-add transpose forms
    def scat(tab_dtype, cot):
        z = jnp.zeros((ROWS, CH), tab_dtype)
        return z.at[idx].add(cot.astype(tab_dtype)).sum()

    timed("scatter bf16 204ch 4.72M rows", jax.jit(lambda c: scat(jnp.bfloat16, c)),
          (cot204_bf,), args.iters, rtt)
    timed("scatter f32  204ch 4.72M rows", jax.jit(lambda c: scat(jnp.float32, c)),
          (cot204_f32,), args.iters, rtt)

    def scat_sorted(cot):
        z = jnp.zeros((ROWS, CH), jnp.bfloat16)
        return z.at[idx_sorted].add(cot, indices_are_sorted=True).sum()

    timed("scatter bf16 SORTED idx", jax.jit(scat_sorted), (cot204_bf,), args.iters, rtt)

    # sort+segment-sum: pay an explicit sort of (idx, cot) then a sorted scatter
    def sort_then_scatter(cot):
        order = jnp.argsort(idx)
        z = jnp.zeros((ROWS, CH), jnp.bfloat16)
        return z.at[idx[order]].add(cot[order], indices_are_sorted=True).sum()

    timed("argsort+gather+sorted scatter", jax.jit(sort_then_scatter),
          (cot204_bf,), args.iters, rtt)

    # the real vjp as XLA builds it (transpose of take)
    def take_loss(t, c):
        return (jnp.take(t, idx, axis=0) * c).sum()

    g = jax.jit(jax.grad(take_loss, argnums=0))
    timed("vjp-of-take bf16 (XLA transpose)", lambda t, c: g(t, c),
          (tab_bf, cot204_bf), args.iters, rtt)

    # half-batch shapes: does per-row cost hold at batch 1 working set?
    R1, N1 = 198_147, 1_179_648
    idx1 = jax.random.randint(k1, (N1,), 0, R1, dtype=jnp.int32)
    tab1 = jax.random.normal(k3, (R1, CH), jnp.bfloat16)
    cot1 = jax.random.normal(k2, (N1, CH), jnp.bfloat16)
    timed("gather bf16 batch1 (1.18M rows)",
          jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum()), (tab1, idx1),
          args.iters, rtt)
    timed("scatter bf16 batch1 (1.18M rows)",
          jax.jit(lambda c: jnp.zeros((R1, CH), jnp.bfloat16).at[idx1].add(c).sum()),
          (cot1,), args.iters, rtt)

    # ---- round-5 variants: is the scatter row-count-bound, byte-bound, or
    # unique-target-bound? (the 81 ms/pass g_phase scatter runs AFTER an XLA
    # sort with indices_are_sorted=true — ~100 ns per TARGET row suggests a
    # serial per-target update loop)
    def scat_w1(cot_col):
        z = jnp.zeros((ROWS,), jnp.float32)
        return z.at[idx].add(cot_col).sum()

    timed("scatter f32 WIDTH-1 4.72M rows", jax.jit(scat_w1),
          (cot204_f32[:, 0],), args.iters, rtt)

    uniq_idx = jnp.arange(N, dtype=jnp.int32)

    def scat_unique(cot):
        z = jnp.zeros((N, CH), jnp.bfloat16)
        return z.at[uniq_idx].add(cot, indices_are_sorted=True,
                                  unique_indices=True).sum()

    timed("scatter bf16 UNIQUE+SORTED (N targets)", jax.jit(scat_unique),
          (cot204_bf,), args.iters, rtt)

    # gather-based segmented sum: sort once, then for each TARGET row read up
    # to K consecutive sorted source rows starting at start[r] and mask-add.
    # Exact when every run length <= K; the production form would fold longer
    # runs first / residual-scatter the tail. Includes the on-device cost of
    # computing start[r] (a width-1 min-scatter).
    def gather_segsum(cot, K=8):
        order = jnp.argsort(idx)
        ids = idx[order]
        cs = cot[order]
        pos = jnp.arange(N, dtype=jnp.int32)
        start = jnp.full((ROWS,), N, jnp.int32).at[ids].min(
            pos, indices_are_sorted=True)  # first sorted position per target
        acc = jnp.zeros((ROWS, CH), jnp.float32)
        base = jnp.clip(start, 0, N - 1)
        for l in range(K):
            j = jnp.minimum(base + l, N - 1)
            take_rows = jnp.take(cs, j, axis=0).astype(jnp.float32)
            ok = (ids[j] == jnp.arange(ROWS)) & (start < N)
            acc = acc + take_rows * ok[:, None]
        return acc.astype(jnp.bfloat16).sum()

    timed("sort+min-scatter+K=8 gather segsum", jax.jit(gather_segsum),
          (cot204_bf,), args.iters, rtt)

    # the width-1 min-scatter alone (the only scatter the gather form keeps)
    def min_scatter(_):
        order = jnp.argsort(idx)
        ids = idx[order]
        pos = jnp.arange(N, dtype=jnp.int32)
        return jnp.full((ROWS,), N, jnp.int32).at[ids].min(
            pos, indices_are_sorted=True).sum()

    timed("width-1 min-scatter (start[r]) alone", jax.jit(min_scatter),
          (cot204_bf,), args.iters, rtt)


if __name__ == "__main__":
    main()
