"""Bilinear grid sampling + tri-plane / 3D-grid feature lookup.

This is the volume renderer's hot primitive. Reference contracts:
  * 2D bilinear sampling with zeros padding, align_corners=False
    (torch_utils/ops/grid_sample_gradfix.py:26-29),
  * `sample_from_2dgrid` / `sample_from_triplane` (dnnlib/util.py:603,580):
    tri-plane feature = xy-plane + yz-plane + xz-plane samples, summed,
  * `sample_from_3dgrid` (dnnlib/util.py:561): trilinear, align_corners=True.

TPU design: point sampling is a gather, not a conv. We flatten the spatial grid and
use `jnp.take_along_axis` over a `[B, H*W, C]` view — XLA lowers this to a dynamic
gather whose minor dimension (C) stays on the 128-lane axis. Out-of-range corners are
masked (zeros padding) rather than clamped. JAX autodiff provides arbitrary-order
gradients for free, which is what the reference's gradfix machinery existed to fix.

A fused Pallas kernel for the full 52-channel tri-plane gather + ray-march lives in
`ide3d_tpu/ops/pallas/`; this module is the reference implementation it is tested
against (the `impl='ref'` pattern of the reference op layer).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _unnormalize(coords: jax.Array, size: int, align_corners: bool) -> jax.Array:
    """Map [-1, 1] to pixel coordinates (torch grid_sample convention)."""
    if align_corners:
        return (coords + 1.0) * 0.5 * (size - 1)
    return ((coords + 1.0) * size - 1.0) * 0.5


def grid_sample_2d(
    image: jax.Array,  # [B, H, W, C]
    coords: jax.Array,  # [B, N, 2], (x, y) in [-1, 1]; x indexes W, y indexes H
    align_corners: bool = False,
) -> jax.Array:
    """Bilinear point sampling with zeros padding. Returns [B, N, C]."""
    B, H, W, C = image.shape
    x = _unnormalize(coords[..., 0].astype(jnp.float32), W, align_corners)
    y = _unnormalize(coords[..., 1].astype(jnp.float32), H, align_corners)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # TPU note: a batched gather (take_along_axis over [B, HW, C]) lowers ~6x
    # slower than a flat row gather (jnp.take) — measured 22 vs 144 GB/s on v5e.
    # Fold the batch index into a single flat index space instead.
    # All takes in this module pass mode="clip": indices are clipped in-bounds
    # by construction (out-of-range coords are handled by the separate
    # valid/inside masks), while the DEFAULT 'fill' mode emits a compare +
    # select over the full gathered tensor — measured 1.84 ms/pass on the
    # [1.18M, 204] render gathers, ~7% of the whole frame (round-5 device
    # trace). clip's index clamp is on the narrow s32 index vector instead.
    flat = image.reshape(B * H * W, C)
    N = coords.shape[1]
    base = (jnp.arange(B, dtype=jnp.int32) * (H * W))[:, None]

    def corner(xi, yi):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xc = jnp.clip(xi, 0, W - 1)
        yc = jnp.clip(yi, 0, H - 1)
        idx = base + yc * W + xc  # [B, N]
        vals = jnp.take(flat, idx.reshape(-1), axis=0, mode="clip").reshape(B, N, C)
        return vals * valid[..., None].astype(image.dtype)

    v00 = corner(x0i, y0i)
    v01 = corner(x0i + 1, y0i)
    v10 = corner(x0i, y0i + 1)
    v11 = corner(x0i + 1, y0i + 1)

    wx = wx[..., None].astype(image.dtype)
    wy = wy[..., None].astype(image.dtype)
    top = v00 + (v01 - v00) * wx
    bot = v10 + (v11 - v10) * wx
    return top + (bot - top) * wy


def grid_sample_2d_quad(
    image: jax.Array,  # [B, H, W, C]
    coords: jax.Array,  # [B, N, 2], (x, y) in [-1, 1]
    align_corners: bool = False,
    coords_grad: bool = True,
) -> jax.Array:
    """grid_sample_2d via a 2x2-neighborhood ("quad") table — the DENSE-sampling
    fast form. Numerically identical to grid_sample_2d (same corner masks, same
    lerp order); the win is one row gather per point instead of four, and a
    4x-fewer-rows scatter in the input-gradient transpose.

    Measured at the ADA warp's shape ([4,512,512,25ch], N = H*W): 20 ms fwd /
    45 ms fwd+input-bwd vs 161/705 ms for the 4-corner form (v5e; the per-row
    gather cost is width-flat, PERF.md, and XLA's scatter transpose cost is
    also per-row). Use when N is on the order of H*W; for sparse sampling the
    [B, H+2, W+2, 4C] table build dominates and grid_sample_2d is the right
    call. The renderer's tri-plane path uses the same trick
    (build_triplane_quad_table) with the table cached across passes.

    CONSTRUCTION NOTE (hard-won): the table is built as pad-then-ROLL, not
    pad-then-four-shifted-SLICES. The slice form ((H+1)-shaped slices of the
    padded image concatenated on channels) is mathematically identical and
    fine standalone, but inside the full GAN train-step program it made XLA
    emit NaNs in values that are FINITE eagerly and finite in every isolated
    probe (fake logits, R1 input-grads) — the same jit-rewrite NaN class as
    the round-2 log(1-alpha) incident (render/integration.py). Rolls of the
    padded image never surface the wrap-around: valid lower corners only read
    rows whose rolled entries lie in the zero padding, and fully-outside rows
    are masked."""
    B, H, W, C = image.shape
    N = coords.shape[1]
    x = _unnormalize(coords[..., 0].astype(jnp.float32), W, align_corners)
    y = _unnormalize(coords[..., 1].astype(jnp.float32), H, align_corners)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None].astype(image.dtype)
    wy = (y - y0)[..., None].astype(image.dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # quad[b, yq, xq] = concat(P[yq,xq], P[yq,xq+1], P[yq+1,xq], P[yq+1,xq+1])
    # over the zero-padded image P: a sample with lower corner (x0, y0) reads
    # the single row (y0+1, x0+1).
    p = jnp.pad(image, ((0, 0), (1, 1), (1, 1), (0, 0)))
    Hp, Wp = H + 2, W + 2
    r = jnp.roll(p, -1, axis=2)
    d = jnp.roll(p, -1, axis=1)
    dr = jnp.roll(r, -1, axis=1)
    quad = jnp.concatenate([p, r, d, dr], axis=-1)  # [B, Hp, Wp, 4C]

    # lower corners in [-1, W-1] x [-1, H-1] have their out-of-range corners
    # covered by the zero padding; anything farther out is all-zeros.
    inside = (x0i >= -1) & (x0i <= W - 1) & (y0i >= -1) & (y0i <= H - 1)
    xq = jnp.clip(x0i + 1, 0, W)
    yq = jnp.clip(y0i + 1, 0, H)

    idx = yq * Wp + xq  # [B, N], image-local rows
    if not coords_grad:
        # ADA-warp fast form: coords are the augmentation grid (no parameters
        # behind them) -> per-image chains + fused-scatter image gradient.
        return _fused_table_sampler(B, Hp * Wp, 1, N, 4 * C, False,
                                    str(image.dtype), acc_f32=True)(
            quad.reshape(B, Hp * Wp, 4 * C),
            idx[None],
            jax.lax.stop_gradient(wx[..., 0])[None],
            jax.lax.stop_gradient(wy[..., 0])[None],
            inside[None],
        )

    flat = quad.reshape(B * Hp * Wp, 4 * C)
    base = (jnp.arange(B, dtype=jnp.int32) * (Hp * Wp))[:, None]
    rows = jnp.take(flat, (base + idx).reshape(-1), axis=0, mode="clip").reshape(B, N, 4 * C)
    return _quad_epilogue(rows[None], wx[None], wy[None], inside[None],
                          sum_planes=False)


def grid_sample_3d(
    volume: jax.Array,  # [B, D, H, W, C]
    coords: jax.Array,  # [B, N, 3], (x, y, z) in [-1, 1]; x->W, y->H, z->D
    align_corners: bool = True,
) -> jax.Array:
    """Trilinear point sampling with zeros padding. Returns [B, N, C]."""
    B, D, H, W, C = volume.shape
    x = _unnormalize(coords[..., 0].astype(jnp.float32), W, align_corners)
    y = _unnormalize(coords[..., 1].astype(jnp.float32), H, align_corners)
    z = _unnormalize(coords[..., 2].astype(jnp.float32), D, align_corners)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    z0 = jnp.floor(z)
    wx = (x - x0)[..., None].astype(volume.dtype)
    wy = (y - y0)[..., None].astype(volume.dtype)
    wz = (z - z0)[..., None].astype(volume.dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    z0i = z0.astype(jnp.int32)

    flat = volume.reshape(B * D * H * W, C)
    N = coords.shape[1]
    base = (jnp.arange(B, dtype=jnp.int32) * (D * H * W))[:, None]

    def corner(xi, yi, zi):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H) & (zi >= 0) & (zi < D)
        xc = jnp.clip(xi, 0, W - 1)
        yc = jnp.clip(yi, 0, H - 1)
        zc = jnp.clip(zi, 0, D - 1)
        idx = base + (zc * H + yc) * W + xc
        vals = jnp.take(flat, idx.reshape(-1), axis=0, mode="clip").reshape(B, N, C)
        return vals * valid[..., None].astype(volume.dtype)

    c000 = corner(x0i, y0i, z0i)
    c100 = corner(x0i + 1, y0i, z0i)
    c010 = corner(x0i, y0i + 1, z0i)
    c110 = corner(x0i + 1, y0i + 1, z0i)
    c001 = corner(x0i, y0i, z0i + 1)
    c101 = corner(x0i + 1, y0i, z0i + 1)
    c011 = corner(x0i, y0i + 1, z0i + 1)
    c111 = corner(x0i + 1, y0i + 1, z0i + 1)

    c00 = c000 + (c100 - c000) * wx
    c10 = c010 + (c110 - c010) * wx
    c01 = c001 + (c101 - c001) * wx
    c11 = c011 + (c111 - c011) * wx
    c0 = c00 + (c10 - c00) * wy
    c1 = c01 + (c11 - c01) * wy
    return c0 + (c1 - c0) * wz


def sample_from_2dgrid(coords: jax.Array, grid: jax.Array) -> jax.Array:
    """[B, N, 2] coords, [B, H, W, C] grid -> [B, N, C].

    Contract: dnnlib/util.py:603-617 (bilinear, zeros, align_corners=False via the
    gradfix grid_sample).
    """
    return grid_sample_2d(grid, coords, align_corners=False)


def sample_from_triplane(coords: jax.Array, planes: jax.Array) -> jax.Array:
    """Tri-plane feature lookup (contract: dnnlib/util.py:580-600).

    coords: [B, N, 3] in [-1, 1]; planes: [B, H, W, 3*C] (xy | yz | xz stacked on the
    channel axis — channels-last analogue of the reference's [B, 3*C, H, W]).
    Returns [B, N, C] = xy(x,y) + yz(y,z) + xz(x,z).
    """
    B, H, W, C3 = planes.shape
    assert C3 % 3 == 0
    C = C3 // 3
    return sample_from_triplane_fused(coords, planes.reshape(B, H, W, 3, C))


def build_triplane_quad_table(planes: jax.Array) -> jax.Array:
    """Precompute the 2x2-neighborhood ("quad") table for fused tri-plane sampling.

    planes: [B, H, W, 3, C] -> Q [B, 3, H+1, W+1, 4C] where
    Q[b, p, y, x] = concat(P[y-1, x-1], P[y-1, x], P[y, x-1], P[y, x]) with zeros
    outside the plane. A bilinear sample whose lower corner is (x0, y0) reads the
    SINGLE row Q[y0+1, x0+1] — one gather instead of four.

    TPU rationale: v5e gather cost is per-row (~2.4 ns/row measured, nearly flat in
    row width up to 128+ lanes), so quadrupling the row width to cut row count 4x
    is a straight 4x win on the renderer's hottest op.
    """
    B, H, W, P, C = planes.shape
    pl = jnp.transpose(planes, (0, 3, 1, 2, 4))  # [B, 3, H, W, C]
    padded = jnp.pad(pl, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    q00 = padded[:, :, : H + 1, : W + 1]  # P[y-1, x-1]
    q01 = padded[:, :, : H + 1, 1 : W + 2]  # P[y-1, x]
    q10 = padded[:, :, 1 : H + 2, : W + 1]  # P[y,   x-1]
    q11 = padded[:, :, 1 : H + 2, 1 : W + 2]  # P[y,   x]
    return jnp.concatenate([q00, q01, q10, q11], axis=-1)  # [B, 3, H+1, W+1, 4C]


def _quad_epilogue(rows, wx, wy, inside, sum_planes: bool):
    """Mask + 2D lerp over gathered quad rows [P, N(, ...), 4C] -> [..., C].

    Measured, scan-amortized A/B on v5e: this slice-and-lerp chain over flat
    wide rows IS the fast form (corner-major tables, einsum folds, and
    narrow-output masking all measured slower — see sample_from_quad_table)."""
    C = rows.shape[-1] // 4
    rows = rows * inside[..., None].astype(rows.dtype)
    v00 = rows[..., :C]
    v01 = rows[..., C : 2 * C]
    v10 = rows[..., 2 * C : 3 * C]
    v11 = rows[..., 3 * C :]
    top = v00 + (v01 - v00) * wx
    bot = v10 + (v11 - v10) * wx
    out = top + (bot - top) * wy
    return out.sum(axis=0) if sum_planes else out[0]


@functools.lru_cache(maxsize=None)
def _fused_table_sampler(B: int, R: int, P: int, N: int, C4: int,
                         sum_planes: bool, tab_dtype: str,
                         acc_f32: bool = True):
    """Quad-table sample with the whole gather+mask+lerp(+plane-sum) chain under
    ONE custom_vjp — the no-coordinate-gradient fast path of the two quad ops.

    Rationale (v5e, flagship train shapes, tools/ab_scatter_forms.py +
    ab_sampler_forms.py): per-row gather cost scales with the TABLE size, not
    the row count — the batch-4 tri-plane gather costs 60 ms fused but 18.5 ms
    as four per-image gathers. Splitting the bare gather under standard AD,
    however, made the FULL train-step program ~80 ms/step slower: XLA rolls the
    four identical takes into while loops and materializes the stacked wide
    rows through dynamic-update-slices + copies. Spanning the epilogue keeps
    each per-image chain narrow ([N, C] out) and the backward is exactly one
    fused full-table scatter built from the lerp weights (per-image scatters
    measured slower, 103.7 vs 96.2 ms; no rows residual is ever saved).

    Coordinates are declared NON-differentiable here (wx/wy/inside cotangents
    are zero). Callers on the train path satisfy this structurally: fine_z is
    stop_gradient'd (renderer.py), rays are camera-only, and the ADA warp's
    transform grid carries no parameters. Generic coord-grad users take the
    plain-take path (coords_grad=True).

    f(flat_b [B,R,C4], idx [P,B,N] in [0,R), wx [P,B,N], wy [P,B,N],
      inside [P,B,N] bool) -> [B, N, C4//4] (sum_planes) or [B, N, C4//4].
    """

    @jax.custom_vjp
    def f(flat_b, idx, wx, wy, inside):
        outs = []
        for b in range(B):
            rows = jnp.take(flat_b[b], idx[:, b].reshape(-1), axis=0, mode="clip").reshape(
                P, N, C4
            )
            outs.append(
                _quad_epilogue(
                    rows,
                    wx[:, b, :, None].astype(rows.dtype),
                    wy[:, b, :, None].astype(rows.dtype),
                    inside[:, b],
                    sum_planes,
                )
            )
        return outs[0][None] if B == 1 else jnp.stack(outs, axis=0)

    def f_fwd(flat_b, idx, wx, wy, inside):
        return f(flat_b, idx, wx, wy, inside), (idx, wx, wy, inside)

    def f_bwd(res, g):  # g [B, N, C]
        idx, wx, wy, inside = res
        wxe = wx[..., None].astype(g.dtype)  # [P, B, N, 1]
        wye = wy[..., None].astype(g.dtype)
        # One broadcast product instead of four concatenated slices: the
        # [..., 4, C] -> [..., 4C] reshape is a memory no-op, so XLA emits a
        # single kLoop producing the scatter operand (the concat form
        # materialized four [N, C] tuples AND their re-read — ~30 ms/step).
        wq = jnp.stack(
            [(1 - wye) * (1 - wxe), (1 - wye) * wxe, wye * (1 - wxe), wye * wxe],
            axis=-2,
        )  # [P, B, N, 4, 1]
        wq = wq * inside[..., None, None].astype(g.dtype)
        cot = (wq * g[None, ..., None, :]).reshape(*idx.shape, C4)
        base = (jnp.arange(B, dtype=jnp.int32) * R)[None, :, None]
        gidx = (idx + base).reshape(-1)
        # Accumulation dtype is the caller's call (acc_f32):
        #   * ADA image sampler (grid_sample_2d_quad): f32 even for bf16
        #     tables — under the bf16 ADA pipe this backward feeds R1's input
        #     gradients, and a bf16 accumulation loses ~2 bits of the penalty
        #     signal (ADVICE r3 #2).
        #   * tri-plane sampler (sample_from_quad_table): TABLE dtype. R1
        #     never reaches the tri-planes (it regularizes D on real images),
        #     and the f32 scatter + operand relayout of the [4.7M, 204] f32
        #     cotangents was ~240 ms/step of the flagship train step — the
        #     round-4 device trace's single largest line (PERF.md round-4).
        acc = jnp.float32 if acc_f32 else jnp.dtype(tab_dtype)
        dflat = (
            jnp.zeros((B * R, C4), acc)
            .at[gidx]
            .add(cot.reshape(-1, C4).astype(acc))
            .astype(tab_dtype)
            .reshape(B, R, C4)
        )
        return (dflat, np.zeros(idx.shape, jax.dtypes.float0),
                jnp.zeros_like(wx), jnp.zeros_like(wy),
                np.zeros(inside.shape, jax.dtypes.float0))

    f.defvjp(f_fwd, f_bwd)
    return f


def sample_from_quad_table(coords: jax.Array, quad: jax.Array,
                           coords_grad: bool = True) -> jax.Array:
    """Tri-plane bilinear sampling against a quad table (see build_triplane_quad_table).

    coords [B, N, 3] in [-1, 1]; quad [B, 3, H+1, W+1, 4C]. Returns [B, N, C].
    Exact same semantics as summing three zeros-padded align_corners=False
    bilinear plane samples (dnnlib/util.py:580-600).

    coords_grad=False selects the train-path fast form (per-image gather
    chains + one fused-scatter backward, _fused_table_sampler) in which
    coords are NON-differentiable (their cotangents are zero). The renderer
    passes False — fine_z is stop_gradient'd and rays carry no parameters, so
    the zero is exact there."""
    B, P, H1, W1, C4 = quad.shape
    H, W = H1 - 1, W1 - 1
    C = C4 // 4
    N = coords.shape[1]
    x32 = coords.astype(jnp.float32)
    # per-plane 2D coords: xy, yz, xz (dnnlib/util.py:587-596 convention)
    cx = jnp.stack([x32[..., 0], x32[..., 1], x32[..., 0]], axis=0)  # [3, B, N]
    cy = jnp.stack([x32[..., 1], x32[..., 2], x32[..., 2]], axis=0)

    fx = _unnormalize(cx, W, False)
    fy = _unnormalize(cy, H, False)
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = (fx - x0)[..., None].astype(quad.dtype)  # [3, B, N, 1]
    wy = (fy - y0)[..., None].astype(quad.dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # The padded table covers lower corners in [-1, H-1] x [-1, W-1] exactly
    # (partial out-of-bounds corners read the zero padding); anything farther out
    # contributes nothing (zeros padding) -> one inside-mask per (plane, point).
    inside = (x0i >= -1) & (x0i <= W - 1) & (y0i >= -1) & (y0i <= H - 1)
    xq = jnp.clip(x0i + 1, 0, W)
    yq = jnp.clip(y0i + 1, 0, H)

    # Per-image base (plane-local): row r of image b's [3*H1*W1, C4] table.
    plane_base = jnp.arange(3, dtype=jnp.int32)[:, None, None] * (H1 * W1)  # [3,1,1]
    idx = plane_base + yq * W1 + xq  # [3, B, N], in [0, 3*H1*W1)

    if not coords_grad:
        # Train-path fast form: per-image gather chains + one fused scatter
        # backward, coords non-differentiable (see _fused_table_sampler).
        # acc_f32=False: the backward scatter accumulates in the TABLE dtype —
        # R1 never differentiates through the tri-planes, and the f32 scatter
        # was the train step's hottest op (see _fused_table_sampler notes).
        return _fused_table_sampler(B, 3 * H1 * W1, 3, N, C4, True,
                                    str(quad.dtype), acc_f32=False)(
            quad.reshape(B, 3 * H1 * W1, C4),
            idx,
            jax.lax.stop_gradient(wx[..., 0]),
            jax.lax.stop_gradient(wy[..., 0]),
            inside,
        )

    # Generic (coords differentiable) form: one fused take + epilogue.
    # Epilogue layout notes (measured, scan-amortized A/B on v5e): this
    # slice-and-lerp chain over flat 204-channel rows IS the fast form.
    # Rejected alternatives: (a) folding mask+lerp+plane-sum into one
    # 'pbnk,pbnkc->bnc' einsum — 2x slower (bad dot lowering/transposes);
    # (b) a corner-major [..,4,C] table so corner selection avoids minor-dim
    # slicing — 2.2x slower (each 51-lane corner pads to its own register
    # tile, 2.5x the gather traffic); (c) masking the narrow per-plane output
    # instead of the wide rows — no change (XLA fuses the mask either way).
    flat = quad.reshape(B * 3 * H1 * W1, C4)
    img_base = (jnp.arange(B, dtype=jnp.int32) * (3 * H1 * W1))[None, :, None]
    rows = jnp.take(flat, (idx + img_base).reshape(-1), axis=0, mode="clip").reshape(
        3, B, N, C4
    )
    return _quad_epilogue(rows, wx, wy, inside, sum_planes=True)


def sample_from_triplane_fused(coords: jax.Array, planes: jax.Array) -> jax.Array:
    """Fused tri-plane lookup (one row gather per plane-point via the quad table).

    coords: [B, N, 3]; planes: [B, H, W, 3, C]. Returns [B, N, C].
    For repeated sampling against the same planes (hierarchical rendering,
    sigma-grid extraction), build the table once with `build_triplane_quad_table`
    and call `sample_from_quad_table` directly."""
    return sample_from_quad_table(coords, build_triplane_quad_table(planes))


def sample_from_3dgrid(coords: jax.Array, grid: jax.Array) -> jax.Array:
    """[B, N, 3] coords, [B, D, H, W, C] grid -> [B, N, C].

    Contract: dnnlib/util.py:561-578 (trilinear, zeros, align_corners=True).
    """
    return grid_sample_3d(grid, coords, align_corners=True)
