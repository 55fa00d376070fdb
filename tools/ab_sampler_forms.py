"""A/B the tri-plane quad-table sampler forms at the flagship train shape.

Forms:
  fused-take   : one B*3*H1*W1-table take + epilogue (round-2 shipped form)
  split-stack  : per-image takes, stacked wide rows, shared epilogue
                 (first split form; XLA rolls the takes into whiles and adds
                 ~100 ms/step of DUS+copy materializing the stacked rows)
  fused-vjp    : custom_vjp spanning take+mask+lerp+plane-sum — per-image
                 chains, narrow [N,C] outputs, bwd re-gathers rows and does
                 ONE fused full-table scatter

    python tools/ab_sampler_forms.py --iters 6
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(tag, fn, args, iters, rtt):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    assert np.isfinite(float(leaf.ravel()[0]))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    t = max(np.median(ts) - rtt, 0.0)
    print(f"{tag:44s} {t*1e3:9.2f} ms")
    return t


def epilogue(rows, wx, wy, inside, C):
    rows = rows * inside[..., None].astype(rows.dtype)
    v00 = rows[..., :C]
    v01 = rows[..., C : 2 * C]
    v10 = rows[..., 2 * C : 3 * C]
    v11 = rows[..., 3 * C :]
    top = v00 + (v01 - v00) * wx
    bot = v10 + (v11 - v10) * wx
    return (top + (bot - top) * wy).sum(axis=0)


def make_forms(B, R, N, C4):
    C = C4 // 4

    def fused_take(flat_b, idx, wx, wy, inside):
        flat = flat_b.reshape(B * R, C4)
        base = (jnp.arange(B, dtype=jnp.int32) * R)[None, :, None]
        rows = jnp.take(flat, (idx + base).reshape(-1), axis=0).reshape(3, B, N, C4)
        return epilogue(rows, wx[..., None], wy[..., None], inside, C)

    def split_stack(flat_b, idx, wx, wy, inside):
        per_b = [
            jnp.take(flat_b[b], idx[:, b].reshape(-1), axis=0).reshape(3, N, C4)
            for b in range(B)
        ]
        rows = jnp.stack(per_b, axis=1)
        return epilogue(rows, wx[..., None], wy[..., None], inside, C)

    @jax.custom_vjp
    def fused_vjp(flat_b, idx, wx, wy, inside):
        outs = []
        for b in range(B):
            rows = jnp.take(flat_b[b], idx[:, b].reshape(-1), axis=0).reshape(3, N, C4)
            outs.append(
                epilogue(rows, wx[:, b, :, None], wy[:, b, :, None], inside[:, b], C)
            )
        return jnp.stack(outs, axis=0)  # [B, N, C]

    def fwd(flat_b, idx, wx, wy, inside):
        return fused_vjp(flat_b, idx, wx, wy, inside), (flat_b, idx, wx, wy, inside)

    def bwd(res, g):  # g [B, N, C]
        flat_b, idx, wx, wy, inside = res
        wxe = wx[..., None].astype(g.dtype)  # [3, B, N, 1]
        wye = wy[..., None].astype(g.dtype)
        ge = g[None]  # [1, B, N, C] broadcast over planes
        d00 = ge * (1 - wye) * (1 - wxe)
        d01 = ge * (1 - wye) * wxe
        d10 = ge * wye * (1 - wxe)
        d11 = ge * wye * wxe
        cot = jnp.concatenate([d00, d01, d10, d11], axis=-1)  # [3, B, N, C4]
        cot = cot * inside[..., None].astype(g.dtype)
        base = (jnp.arange(B, dtype=jnp.int32) * R)[None, :, None]
        gidx = (idx + base).reshape(-1)
        dflat = (
            jnp.zeros((B * R, C4), flat_b.dtype)
            .at[gidx]
            .add(cot.reshape(-1, C4).astype(flat_b.dtype))
            .reshape(B, R, C4)
        )
        # Coords are non-differentiable on the train path (fine_z is
        # stop_gradient'd, rays are camera-only) -> wx/wy cotangents are
        # structurally zero; no rows residual, no re-gather.
        return dflat, np.zeros(idx.shape, jax.dtypes.float0), jnp.zeros_like(wx), \
            jnp.zeros_like(wy), np.zeros(inside.shape, jax.dtypes.float0)

    fused_vjp.defvjp(fwd, bwd)
    return fused_take, split_stack, fused_vjp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--check", action="store_true", help="CPU equality check only")
    args = ap.parse_args()

    if args.check:
        jax.config.update("jax_platforms", "cpu")
        B, R, N, C4 = 2, 4 * 5 * 5, 7, 8
    else:
        B, R, N, C4 = 4, 3 * 257 * 257, 4096 * 96, 204
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    dtype = jnp.float32 if args.check else jnp.bfloat16
    flat_b = jax.random.normal(ks[0], (B, R, C4), dtype)
    idx = jax.random.randint(ks[1], (3, B, N), 0, R, jnp.int32)
    wx = jax.random.uniform(ks[2], (3, B, N))
    wy = jax.random.uniform(ks[3], (3, B, N))
    inside = jax.random.uniform(ks[4], (3, B, N)) < 0.9

    fused_take, split_stack, fused_vjp = make_forms(B, R, N, C4)

    if args.check:
        o1 = fused_take(flat_b, idx, wx, wy, inside)
        o3 = fused_vjp(flat_b, idx, wx, wy, inside)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o3), rtol=1e-5, atol=1e-6)

        def loss(form):
            return lambda t, x, y: jnp.sum(form(t, idx, x, y, inside) ** 2)

        g1 = jax.grad(loss(fused_take), argnums=0)(flat_b, wx, wy)
        g3 = jax.grad(loss(fused_vjp), argnums=0)(flat_b, wx, wy)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g3), rtol=1e-5,
                                   atol=1e-6)
        print("fused_vjp == fused_take (value + table grads)")
        return

    from bench import _rtt_baseline

    rtt = _rtt_baseline()
    print(f"rtt {rtt*1e3:.1f} ms")

    for name, form in [("fused-take", fused_take), ("split-stack", split_stack),
                       ("fused-vjp", fused_vjp)]:
        f_fwd = jax.jit(lambda t, i, x, y, m, _f=form: _f(t, i, x, y, m).sum())
        timed(f"{name} fwd", f_fwd, (flat_b, idx, wx, wy, inside), args.iters, rtt)
        f_grad = jax.jit(
            jax.grad(lambda t, x, y, _f=form: (_f(t, idx, x, y, inside) ** 2).sum()
                     .astype(jnp.float32), argnums=(0,))
        )
        timed(f"{name} fwd+bwd(table)", f_grad, (flat_b, wx, wy), args.iters, rtt)

    print("done")


if __name__ == "__main__":
    main()
