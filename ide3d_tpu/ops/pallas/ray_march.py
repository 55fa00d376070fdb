"""Fused ray-march kernel: depth-sort + alpha compositing in one VMEM pass.

This fuses the tail of the hierarchical renderer (render/renderer.py):
  1. merge-sort the union of coarse+fine samples by depth,
  2. deltas, softplus density, alphas,
  3. transmittance (exclusive cumprod) and weights,
  4. weighted feature/semantic/depth sums.

The XLA path materializes several [B, R, 2S, *] intermediates in HBM (the
permutation one-hot, sorted values, alphas, transmittance). Here one ray tile
stays resident in VMEM end-to-end and every step is expressed as an MXU matmul:

  * rank-by-comparison -> one-hot permutation (0/1 matrix) applied with jnp.dot,
  * cumulative products via log -> lower-triangular ones matmul -> exp
    (an exclusive cumsum as a single [S, S] matmul — no serial scan),
  * weighted sums as [1, S] x [S, C] dots.

Grid: (B * R / RAY_TILE). Everything fp32 (compositing precision contract,
render/integration.py). The pure-jnp reference implementation used for testing
(and as the CPU path) is `sort_integrate_reference`.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU too (for constructors); guard anyway
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

RAY_TILE = 64


def sort_integrate_reference(
    z: jax.Array,  # [B, R, S, 1] unsorted depths
    vals: jax.Array,  # [B, R, S, C+1] features ++ sigma (unsorted)
    ray_norm: jax.Array,  # [B, R, 1] |ray_d|
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Pure-jnp reference: sort by z then composite (matches renderer's
    _sort_by_depth + integrate_rays with noise=0, softplus clamp).
    Returns (features [B,R,C], depth [B,R,1], weights_sum [B,R,1])."""
    from ...render.integration import integrate_rays
    from ...render.renderer import _sort_by_depth

    zs, vs = _sort_by_depth(z, vals)
    comp, depth, weights = integrate_rays(vs, ray_norm * jnp.ones((1, 1, 3)) / np.sqrt(3), zs)
    # integrate_rays scales deltas by ||rays_d||; passing a fake direction with the
    # right norm keeps this wrapper self-contained for testing.
    return comp, depth, weights.sum(axis=-2)


def _kernel(z_ref, vals_ref, norm_ref, feat_ref, depth_ref, wsum_ref, *, S, C):
    """One ray tile: z [T, S], vals [T, S, C+1], norm [T, 1]."""
    z = z_ref[...].astype(jnp.float32)  # [T, S]
    vals = vals_ref[...].astype(jnp.float32)  # [T, S, C+1]
    norm = norm_ref[...].astype(jnp.float32)  # [T, 1]
    T = z.shape[0]

    # ---- rank by comparison (stable) -> one-hot permutation
    zi = z[:, :, None]  # i
    zj = z[:, None, :]  # j
    i_idx = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    less = (zj < zi).astype(jnp.float32)
    tie = ((zj == zi) & (j_idx < i_idx)[None]).astype(jnp.float32)
    rank = (less + tie).sum(axis=-1).astype(jnp.int32)  # [T, S]
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (T, S, S), 2)
    perm = (rank[:, :, None] == k_idx).astype(jnp.float32)  # [T, S(i), S(k)]

    # ---- apply permutation on the MXU (batched matmuls; Mosaic requires 3-D rhs)
    z_sorted = jax.lax.dot_general(
        perm, z[:, :, None], (((1,), (1,)), ((0,), (0,)))
    )[..., 0]  # [T, S(k)]
    v_sorted = jax.lax.dot_general(
        perm, vals, (((1,), (1,)), ((0,), (0,)))
    )  # [T, S(k), C+1]

    feats = v_sorted[..., :C]
    sigma = v_sorted[..., C]

    # ---- deltas (last = inf) scaled by |ray|. Mosaic can't lower a concat of
    # offset slices ("offset mismatch on non-concat dimension"), so build the
    # shifted sequence with a roll and overwrite the final column instead.
    # pltpu.roll requires a non-negative shift: roll by S-1 == shift of -1.
    z_next = pltpu.roll(z_sorted, shift=S - 1, axis=1) if _HAS_PLTPU else jnp.roll(z_sorted, -1, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, z_sorted.shape, 1)
    deltas = jnp.where(col == S - 1, 1e10, z_next - z_sorted) * norm

    density = jax.nn.softplus(sigma)
    x = deltas * density
    alphas = 1.0 - jnp.exp(-x)  # [T, S]

    # ---- exclusive cumprod of (1 - alpha) via log + strict-lower-tri ones matmul.
    # log(1 - alpha) == -x analytically; computing it from alphas would hit
    # log(0) = -inf when alpha saturates (XLA reassociates the +eps away) and
    # -inf * 0 in the triangular matmul is NaN.
    log_om = -x
    strict_lower = (j_idx < i_idx).astype(jnp.float32)  # [S(i), S(j)]: sum_{j<i}
    cum_excl = jax.lax.dot_general(
        log_om, strict_lower.T, (((1,), (0,)), ((), ())),
    )  # [T, S] = sum_{j<i} log(1-a_j)
    trans = jnp.exp(cum_excl)
    weights = alphas * trans  # [T, S]

    feat_ref[...] = jax.lax.dot_general(
        weights[:, None, :], feats, (((2,), (1,)), ((0,), (0,))),
    )[:, 0, :]
    depth_ref[...] = jnp.sum(weights * z_sorted, axis=1, keepdims=True)
    wsum_ref[...] = jnp.sum(weights, axis=1, keepdims=True)


def sort_integrate_pallas(
    z: jax.Array,  # [B, R, S, 1]
    vals: jax.Array,  # [B, R, S, C+1]
    ray_norm: jax.Array,  # [B, R, 1]
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused sort+composite. Returns (features [B,R,C], depth [B,R,1], wsum [B,R,1])."""
    B, R, S, _ = z.shape
    C = vals.shape[-1] - 1
    assert R % RAY_TILE == 0, f"ray count {R} must be a multiple of {RAY_TILE}"
    T = RAY_TILE
    grid = (B * R // T,)

    zf = z.reshape(B * R, S)
    vf = vals.reshape(B * R, S, C + 1)
    nf = ray_norm.reshape(B * R, 1)

    kernel = functools.partial(_kernel, S=S, C=C)
    feat, depth, wsum = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, S), lambda i: (i, 0)),
            pl.BlockSpec((T, S, C + 1), lambda i: (i, 0, 0)),
            pl.BlockSpec((T, 1), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((T, C), lambda i: (i, 0)),
            pl.BlockSpec((T, 1), lambda i: (i, 0)),
            pl.BlockSpec((T, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * R, C), jnp.float32),
            jax.ShapeDtypeStruct((B * R, 1), jnp.float32),
            jax.ShapeDtypeStruct((B * R, 1), jnp.float32),
        ],
        interpret=interpret,
    )(zf, vf, nf)

    return (
        feat.reshape(B, R, C),
        depth.reshape(B, R, 1),
        wsum.reshape(B, R, 1),
    )
