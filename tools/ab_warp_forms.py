"""Microbench alternative formulations of the ADA affine warp.

The warp at [4,512,512,25] measured 181 ms fwd / 715 ms fwd+input-bwd —
~12x the repo's measured per-row gather model (PERF.md: ~2.4-3.6 ns/row).
Isolate the primitive costs at the exact shapes to find the fast form:

  raw_take        : 4x flat jnp.take of [B*N] rows from [B*H*W, 25]
  quad_take       : 1x flat take of [B*N] rows from a [B*H*W, 100] quad table
                    (renderer's trick: per-row cost is width-flat, 4x fewer rows)
  raw_take_bwd    : input-grad of raw_take (XLA scatter-add transpose)
  quad_take_bwd   : input-grad of quad_take
  onehot_y/x      : separable per-axis resample as batched one-hot MATMULs
                    [B,H',H]@[B,H,W*C] (exact for axis-aligned passes; shear
                    handled by per-column offset folded into the one-hot)

    python tools/ab_warp_forms.py --iters 8
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
    ap.add_argument("--ch", type=int, default=25)
    args = ap.parse_args()

    from bench import _rtt_baseline

    B, R, C = args.batch, args.res, args.ch
    H = W = R
    N = H * W
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    img = jax.random.uniform(k1, (B, H, W, C))
    # generic in-range sample positions (what the affine warp produces)
    xs = jax.random.uniform(k2, (B, N), minval=0.0, maxval=W - 1.001)
    ys = jax.random.uniform(k3, (B, N), minval=0.0, maxval=H - 1.001)
    rtt = _rtt_baseline()
    print(f"rtt {rtt*1e3:.1f} ms; [{B},{H},{W},{C}]")

    def corners(xs, ys):
        x0 = jnp.floor(xs).astype(jnp.int32)
        y0 = jnp.floor(ys).astype(jnp.int32)
        wx = (xs - x0)[..., None]
        wy = (ys - y0)[..., None]
        return x0, y0, wx, wy

    base = (jnp.arange(B, dtype=jnp.int32) * (H * W))[:, None]

    def raw_take(img, xs, ys):
        flat = img.reshape(B * H * W, C)
        x0, y0, wx, wy = corners(xs, ys)

        def g(xi, yi):
            idx = base + jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
            return jnp.take(flat, idx.reshape(-1), axis=0).reshape(B, N, C)

        v00, v01 = g(x0, y0), g(x0 + 1, y0)
        v10, v11 = g(x0, y0 + 1), g(x0 + 1, y0 + 1)
        top = v00 + (v01 - v00) * wx
        bot = v10 + (v11 - v10) * wx
        return top + (bot - top) * wy

    f = jax.jit(lambda i, a, b: jnp.sum(raw_take(i, a, b)))
    t = timed(f, (img, xs, ys), args.iters, rtt)
    print(f"raw_take fwd       {t*1e3:8.1f} ms")

    fb = jax.jit(lambda i, a, b: jnp.sum(
        jax.grad(lambda im: jnp.sum(raw_take(im, a, b) ** 2))(i)))
    t = timed(fb, (img, xs, ys), args.iters, rtt)
    print(f"raw_take fwd+bwd   {t*1e3:8.1f} ms")

    def quad_take(img, xs, ys):
        # quad table [B*H*W, 4C]: row (y,x) = [(y,x),(y,x+1),(y+1,x),(y+1,x+1)]
        r = jnp.roll(img, -1, axis=2)
        d = jnp.roll(img, -1, axis=1)
        dr = jnp.roll(r, -1, axis=1)
        quad = jnp.concatenate([img, r, d, dr], axis=-1).reshape(B * H * W, 4 * C)
        x0, y0, wx, wy = corners(xs, ys)
        idx = base + jnp.clip(y0, 0, H - 1) * W + jnp.clip(x0, 0, W - 1)
        rows = jnp.take(quad, idx.reshape(-1), axis=0).reshape(B, N, 4 * C)
        v00, v01 = rows[..., :C], rows[..., C:2 * C]
        v10, v11 = rows[..., 2 * C:3 * C], rows[..., 3 * C:]
        top = v00 + (v01 - v00) * wx
        bot = v10 + (v11 - v10) * wx
        return top + (bot - top) * wy

    f = jax.jit(lambda i, a, b: jnp.sum(quad_take(i, a, b)))
    t = timed(f, (img, xs, ys), args.iters, rtt)
    print(f"quad_take fwd      {t*1e3:8.1f} ms")

    fb = jax.jit(lambda i, a, b: jnp.sum(
        jax.grad(lambda im: jnp.sum(quad_take(im, a, b) ** 2))(i)))
    t = timed(fb, (img, xs, ys), args.iters, rtt)
    print(f"quad_take fwd+bwd  {t*1e3:8.1f} ms")

    # separable one-hot matmul: vertical resample with per-image scale+offset
    # (the shear's per-column offset term handled in the second pass benchmark
    # identically — cost is what matters here, correctness proven elsewhere)
    sy = jax.random.uniform(jax.random.fold_in(key, 7), (B,), minval=0.8, maxval=1.2)
    ty = jax.random.uniform(jax.random.fold_in(key, 8), (B,), minval=-5, maxval=5)

    def onehot_pass(img, sy, ty):
        # dst row i samples src at p = sy*i + ty -> weights [B, H_out, H_in]
        i_out = jnp.arange(H, dtype=jnp.float32)[None, :]  # [1,H]
        p = sy[:, None] * i_out + ty[:, None]  # [B,H]
        p0 = jnp.floor(p)
        fr = p - p0
        src = jnp.arange(H, dtype=jnp.float32)[None, None, :]  # [1,1,H]
        w = (jnp.maximum(0.0, 1.0 - jnp.abs(p[..., None] - src)))  # [B,H,H] hat
        x = img.reshape(B, H, W * C)
        out = jnp.einsum("bij,bjk->bik", w.astype(img.dtype), x,
                         preferred_element_type=jnp.float32)
        return out.reshape(B, H, W, C)

    f = jax.jit(lambda i: jnp.sum(onehot_pass(i, sy, ty)))
    t = timed(f, (img,), args.iters, rtt)
    print(f"onehot_y fwd       {t*1e3:8.1f} ms")

    fb = jax.jit(lambda i: jnp.sum(
        jax.grad(lambda im: jnp.sum(onehot_pass(im, sy, ty) ** 2))(i)))
    t = timed(fb, (img,), args.iters, rtt)
    print(f"onehot_y fwd+bwd   {t*1e3:8.1f} ms")

    # horizontal pass with PER-ROW offset (the shear form): weights [B,H,W,W]
    # would be 1 GB dense — instead keep [B,W',W] per-image matrix and add the
    # per-row fractional shift as a separate 2-tap lerp along x (exact split:
    # offset = rowwise integer roll + fractional lerp). Benchmark the pieces:
    def rowshift(img, alpha):
        # per-row fractional shift along x by alpha*y: 2-tap lerp of rolled rows
        yv = jnp.arange(H, dtype=jnp.float32)[None, :, None, None]
        o = alpha[:, None, None, None] * yv
        o0 = jnp.floor(o).astype(jnp.int32)
        fr = (o - o0).astype(img.dtype)
        # integer per-row roll via gather along x with wrapped indices
        xv = jnp.arange(W, dtype=jnp.int32)[None, None, :, None]
        idx0 = jnp.mod(xv + o0, W)
        g0 = jnp.take_along_axis(img, jnp.broadcast_to(idx0, img.shape), axis=2)
        idx1 = jnp.mod(xv + o0 + 1, W)
        g1 = jnp.take_along_axis(img, jnp.broadcast_to(idx1, img.shape), axis=2)
        return g0 * (1 - fr) + g1 * fr

    alpha = jax.random.uniform(jax.random.fold_in(key, 9), (B,), minval=-0.3, maxval=0.3)
    f = jax.jit(lambda i: jnp.sum(rowshift(i, alpha)))
    t = timed(f, (img,), args.iters, rtt)
    print(f"rowshift fwd       {t*1e3:8.1f} ms")
    fb = jax.jit(lambda i: jnp.sum(
        jax.grad(lambda im: jnp.sum(rowshift(im, alpha) ** 2))(i)))
    t = timed(fb, (img,), args.iters, rtt)
    print(f"rowshift fwd+bwd   {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
