"""ADA augmentation pipe (StyleGAN2-ADA), functional JAX port of the contract.

Reference: training/augment.py:122-436 (AugmentPipe.forward) — a probability-gated
composition of pixel blits (xflip / 90deg rot / integer translate), general
geometric transforms (isotropic+anisotropic scale, pre/post rotation, fractional
translate) applied as one fused inverse-affine warp, color transforms (brightness,
contrast, luma flip, hue rotation, saturation) applied as one fused 4x4 color
matrix, and cutout. The adaptive-p controller (heuristic rt = E[sign(D_real)])
lives in `AdaState.update`.

TPU design: every augmentation is branch-free — transforms are always computed and
blended by Bernoulli masks, so one XLA program covers all probability settings;
geometry composes into a single 3x3 per-image matrix executed by ONE bilinear warp
(ops/grid_sample.py), colors into a single 4x4 matrix -> one einsum.

Anti-aliasing: the reference wraps the geometric warp in sym6-wavelet up/down
filtering (training/augment.py:172,280-306). Both execution forms are provided
here — `AugmentConfig.wavelet_aa=True` reproduces that pipeline (reflect pad ->
2x sym6 upsample -> bilinear warp at 2x -> sym6 downsample with crop; the
orthogonal wavelet makes up-then-down an exact identity in the interior), while
the default executes one plain bilinear warp at 1x (~4x cheaper; the warp sits
inside the jitted GAN losses and its input-gradient is a training hot path,
PERF.md ADA section). One deliberate static-shape deviation under jit: the
reference computes per-batch reflect margins from the transformed corners
(augment.py:276-288, clamped to width-1); here the margin is a static
`wavelet_margin` fraction of the image (+ filter support), beyond which samples
fall to zeros exactly like the bilinear path.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.grid_sample import grid_sample_2d_quad
from ..ops.upfirdn2d import downsample2d, setup_filter, upsample2d

# Orthogonal wavelet decomposition low-pass (public sym6 coefficients; the
# reference registers setup_filter(wavelets['sym6']) as Hz_geom,
# training/augment.py:172).
WAVELET_SYM6 = (
    0.015404109327027373, 0.0034907120842174702, -0.11799011114819057,
    -0.048311742585633, 0.4910559419267466, 0.787641141030194,
    0.3379294217276218, -0.07263752278646252, -0.021060292512300564,
    0.04472490177066578, 0.0017677118642428036, -0.007800708325034148,
)


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    # probabilities multiply the global p (reference defaults, augment.py:128-160)
    xflip: float = 1.0
    rotate90: float = 1.0
    xint: float = 1.0
    xint_max: float = 0.125
    scale: float = 1.0
    rotate: float = 1.0
    aniso: float = 1.0
    xfrac: float = 1.0
    scale_std: float = 0.2
    rotate_max: float = 1.0
    aniso_std: float = 0.2
    xfrac_std: float = 0.125
    brightness: float = 1.0
    contrast: float = 1.0
    lumaflip: float = 1.0
    hue: float = 1.0
    saturation: float = 1.0
    brightness_std: float = 0.2
    contrast_std: float = 0.5
    hue_max: float = 1.0
    saturation_std: float = 1.0
    cutout: float = 0.0
    cutout_size: float = 0.5
    # Reference-parity wavelet anti-aliasing around the geometric warp
    # (training/augment.py:280-306). Off by default: the 2x-resolution warp
    # multiplies the in-loss augmentation cost ~4x (PERF.md measures the A/B).
    wavelet_aa: bool = False
    # Static reflect-pad margin as a fraction of image width (replaces the
    # reference's dynamic per-batch corner margin, clamped there to width-1).
    wavelet_margin: float = 0.125
    # Compute dtype of the in-loss warp/color pipeline. D itself casts its
    # input to bfloat16 at entry (models/discriminator.py:64-68), so warping
    # at bf16 loses nothing D ever sees while halving the augmentation's HBM
    # traffic (the warp quad table + its gather/scatter are the D/G-phase's
    # biggest non-renderer tensors: [B, 514, 514, 100] at the flagship shape).
    compute_dtype: str = "bfloat16"


def _bernoulli(key, p, shape):
    return (jax.random.uniform(key, shape) < p).astype(jnp.float32)


def _rot2d(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    z = jnp.zeros_like(theta)
    o = jnp.ones_like(theta)
    return jnp.stack(
        [jnp.stack([c, -s, z], -1), jnp.stack([s, c, z], -1), jnp.stack([z, z, o], -1)], -2
    )


def _translate2d(tx, ty):
    z = jnp.zeros_like(tx)
    o = jnp.ones_like(tx)
    return jnp.stack(
        [jnp.stack([o, z, tx], -1), jnp.stack([z, o, ty], -1), jnp.stack([z, z, o], -1)], -2
    )


def _scale2d(sx, sy):
    z = jnp.zeros_like(sx)
    o = jnp.ones_like(sx)
    return jnp.stack(
        [jnp.stack([sx, z, z], -1), jnp.stack([z, sy, z], -1), jnp.stack([z, z, o], -1)], -2
    )


def _geometry_matrix(
    keys, p, cfg: AugmentConfig, B: int, W: int, H: int
) -> jax.Array:
    """Per-image forward geometry matrix [B,3,3] (blits + general geometric,
    augment.py:190-280), in [-1,1] image coordinates."""
    G = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))

    # ---- pixel blits + geometry, composed into one matrix (augment.py:190-280)
    if cfg.xflip > 0:
        w = _bernoulli(keys[0], cfg.xflip * p, (B,))
        flip = _scale2d(1.0 - 2.0 * w, jnp.ones((B,)))
        G = flip @ G
    if cfg.rotate90 > 0:
        w = _bernoulli(keys[1], cfg.rotate90 * p, (B,))
        k = jax.random.randint(keys[2], (B,), 0, 4).astype(jnp.float32) * w
        G = _rot2d(-k * (math.pi / 2)) @ G
    if cfg.xint > 0:
        # ONE Bernoulli gates BOTH translation axes (the reference draws the
        # where-mask with shape [B,1], augment.py:207 — independent per-axis
        # gates would produce x-only/y-only shifts the reference never emits)
        w = _bernoulli(keys[3], cfg.xint * p, (B, 1))
        t = (jax.random.uniform(keys[4], (B, 2)) * 2 - 1) * cfg.xint_max * w
        t = jnp.round(t * jnp.asarray([W, H]) / 2.0) * 2.0 / jnp.asarray([W, H])
        G = _translate2d(t[:, 0], t[:, 1]) @ G
    if cfg.scale > 0:
        w = _bernoulli(keys[5], cfg.scale * p, (B,))
        s = jnp.exp2(jax.random.normal(keys[6], (B,)) * cfg.scale_std * w)
        G = _scale2d(s, s) @ G
    if cfg.rotate > 0 or cfg.aniso > 0:
        # PRE-rotation -> aniso -> POST-rotation, each rotation applied with
        # p_rot = 1 - sqrt(1 - rotate*p) so P(any rotation) = rotate*p
        # (augment.py:235-259); a single rotation would keep the anisotropic
        # stretch axis-aligned, a narrower transform family.
        p_rot = 1.0 - jnp.sqrt(jnp.clip(1.0 - cfg.rotate * p, 0.0, 1.0))
        if cfg.rotate > 0:
            w = (jax.random.uniform(keys[7], (B,)) < p_rot).astype(jnp.float32)
            theta = (jax.random.uniform(keys[8], (B,)) * 2 - 1) * math.pi * cfg.rotate_max * w
            G = _rot2d(-theta) @ G
        if cfg.aniso > 0:
            w = _bernoulli(keys[9], cfg.aniso * p, (B,))
            s = jnp.exp2(jax.random.normal(keys[10], (B,)) * cfg.aniso_std * w)
            G = _scale2d(s, 1.0 / s) @ G
        if cfg.rotate > 0:
            kw, kt = jax.random.split(jax.random.fold_in(keys[7], 1))
            w = (jax.random.uniform(kw, (B,)) < p_rot).astype(jnp.float32)
            theta = (jax.random.uniform(kt, (B,)) * 2 - 1) * math.pi * cfg.rotate_max * w
            G = _rot2d(-theta) @ G
    if cfg.xfrac > 0:
        w = _bernoulli(keys[11], cfg.xfrac * p, (B, 1))  # one gate, both axes
        t = jax.random.normal(keys[12], (B, 2)) * cfg.xfrac_std * w
        G = _translate2d(t[:, 0], t[:, 1]) @ G
    return G


def _sample_affine(images: jax.Array, A: jax.Array, Ho: int, Wo: int) -> jax.Array:
    """Bilinear-sample `images` on an [Ho,Wo] output grid through the per-image
    inverse matrix A (output normalized coords -> input normalized coords,
    align_corners=False, zeros padding).

    Dense sampling (N == Ho*Wo), so the quad-table form of the gather is the
    fast one — 8x fwd / 16x fwd+input-bwd vs the 4-corner gather at the D-input
    scale (ops/grid_sample.py grid_sample_2d_quad; the input-gradient transpose
    is the G-loss/R1 hot path, PERF.md ADA section)."""
    B = images.shape[0]
    ys = (jnp.arange(Ho) * 2.0 + 1.0) / Ho - 1.0
    xs = (jnp.arange(Wo) * 2.0 + 1.0) / Wo - 1.0
    gx, gy = jnp.meshgrid(xs, ys)
    grid = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1).reshape(1, Ho * Wo, 3)
    src = jnp.einsum("bij,bnj->bni", A, jnp.broadcast_to(grid, (B, Ho * Wo, 3)))
    # coords_grad=False: the warp grid is a parameter-free function of the
    # sampled augmentation transform — only image gradients are needed.
    out = grid_sample_2d_quad(images, src[..., :2], align_corners=False,
                              coords_grad=False)
    return out.reshape(B, Ho, Wo, images.shape[-1])


def _apply_warp(images: jax.Array, G: jax.Array,
                cfg: Optional[AugmentConfig] = None) -> jax.Array:
    """Execute the inverse warp once (bilinear, zeros padding); with
    cfg.wavelet_aa, wrap it in the reference's sym6 up/down filtering."""
    B, H, W, C = images.shape
    Ginv = jnp.linalg.inv(G)
    if cfg is not None and cfg.wavelet_aa:
        return _apply_warp_wavelet(images, Ginv, cfg)
    return _sample_affine(images, Ginv, H, W)


def _apply_warp_wavelet(images: jax.Array, Ginv: jax.Array,
                        cfg: AugmentConfig) -> jax.Array:
    """Reference AA execution (training/augment.py:276-306): reflect pad,
    2x sym6 upsample, bilinear warp on the [(H+2*hz)*2] grid, sym6 downsample
    with a crop back to HxW. All matrix adjustments follow the reference's
    centered-pixel algebra; `Ginv` arrives in the [-1,1] normalized coordinates
    _geometry_matrix uses, so it is conjugated into centered pixels first.

    MEMORY NOTE: executed per-image under `lax.map`. The 2x-upsampled D-input
    batch is [2B, ~1306, ~1306, 25ch] at the flagship shape, and a 25-lane
    bf16 tensor pads 5.1x in the TPU tiled layout — the quad-table warp's four
    roll intermediates alone hit 4 x 3.25 GB and the whole-batch form OOM'd
    HBM at compile (16.3 G / 15.75 G, round-4 wavelet bench attempt). Mapping
    over the batch divides every intermediate by 2B for identical numerics;
    the serialization is acceptable on the opt-in parity path."""
    B, H, W, C = images.shape
    f = setup_filter(WAVELET_SYM6)
    hz = len(WAVELET_SYM6) // 4  # Hz_pad (augment.py:277)
    m = int(np.ceil(cfg.wavelet_margin * max(H, W))) + 2 * hz
    m = min(m, min(H, W) - 1)  # reflect-pad limit == the reference's clamp

    def diag3(a, b):
        return jnp.diag(jnp.asarray([a, b, 1.0], jnp.float32))[None]

    def one(args):
        img1, Ginv1 = args  # [1, H, W, C], [1, 3, 3]
        x = jnp.pad(img1, ((0, 0), (m, m), (m, m), (0, 0)), mode="reflect")
        x = upsample2d(x, f, up=2)  # [(H+2m)*2, (W+2m)*2]
        # normalized -> centered-pixel conjugation on the original HxW grid
        # (align_corners=False: x_norm = x_centered_px * 2/W)
        G1 = diag3(W / 2.0, H / 2.0) @ Ginv1 @ diag3(2.0 / W, 2.0 / H)
        # upsample adjustment (augment.py:295-297): scale then half-pixel shift
        G1 = diag3(2.0, 2.0) @ G1 @ diag3(0.5, 0.5)
        t = jnp.full((1,), -0.5, jnp.float32)
        Tm = _translate2d(t, t)
        G1 = Tm @ G1 @ _translate2d(-t, -t)
        # execute on the [(H+2*hz)*2] output grid vs the padded upsampled input
        Ho, Wo = (H + 2 * hz) * 2, (W + 2 * hz) * 2
        Hi, Wi = x.shape[1], x.shape[2]
        A = diag3(2.0 / Wi, 2.0 / Hi) @ G1 @ diag3(Wo / 2.0, Ho / 2.0)
        y = _sample_affine(x, A, Ho, Wo)
        # downsample and crop (augment.py:306)
        return downsample2d(y, f, down=2, padding=-hz * 2, flip_filter=True)

    out = jax.lax.map(one, (images[:, None], Ginv[:, None]))
    return out.reshape((B,) + out.shape[2:])


def _color_matrix(keys, p, cfg: AugmentConfig, B: int) -> jax.Array:
    """Per-image 4x4 color matrix (augment.py:290-350)."""
    Cm = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))
    v = jnp.asarray([1, 1, 1, 0], jnp.float32) / math.sqrt(3)  # luma axis

    if cfg.brightness > 0:
        w = _bernoulli(keys[13], cfg.brightness * p, (B,))
        b = jax.random.normal(jax.random.fold_in(keys[13], 1), (B,)) * cfg.brightness_std * w
        M = jnp.broadcast_to(jnp.eye(4), (B, 4, 4)).at[:, :3, 3].add(b[:, None])
        Cm = M @ Cm
    if cfg.contrast > 0:
        w = _bernoulli(keys[14], cfg.contrast * p, (B,))
        cs = jnp.exp2(jax.random.normal(jax.random.fold_in(keys[14], 1), (B,)) * cfg.contrast_std * w)
        M = jax.vmap(jnp.diag)(jnp.concatenate([jnp.repeat(cs[:, None], 3, 1), jnp.ones((B, 1))], 1))
        Cm = M @ Cm
    if cfg.lumaflip > 0:
        w = _bernoulli(keys[15], cfg.lumaflip * p, (B,))
        householder = jnp.eye(4)[None] - 2.0 * jnp.outer(v, v)[None] * w[:, None, None]
        Cm = householder @ Cm
    if cfg.hue > 0:
        kh = jax.random.fold_in(keys[15], 7)
        w = _bernoulli(kh, cfg.hue * p, (B,))
        theta = (jax.random.uniform(jax.random.fold_in(kh, 1), (B,)) * 2 - 1) * math.pi * cfg.hue_max * w
        # Rodrigues rotation around the luma axis
        vv = v[:3]
        Km = jnp.array([[0, -vv[2], vv[1]], [vv[2], 0, -vv[0]], [-vv[1], vv[0], 0]])
        R3 = (
            jnp.eye(3)[None]
            + jnp.sin(theta)[:, None, None] * Km[None]
            + (1 - jnp.cos(theta))[:, None, None] * (Km @ Km)[None]
        )
        M = jnp.broadcast_to(jnp.eye(4), (B, 4, 4)).at[:, :3, :3].set(R3)
        Cm = M @ Cm
    if cfg.saturation > 0:
        ks = jax.random.fold_in(keys[15], 13)
        w = _bernoulli(ks, cfg.saturation * p, (B,))
        s = jnp.exp2(jax.random.normal(jax.random.fold_in(ks, 1), (B,)) * cfg.saturation_std * w)
        vvT = jnp.outer(v, v)[None]
        M = vvT + (jnp.eye(4)[None] - vvT) * s[:, None, None]
        Cm = M @ Cm
    return Cm


def _apply_color(images: jax.Array, Cm: jax.Array) -> jax.Array:
    """Apply the 4x4 color matrix to a 3-channel image stack."""
    B, H, W, C = images.shape
    assert C == 3
    x = images.reshape(B, H * W, 3)
    x = jnp.einsum("bij,bnj->bni", Cm[:, :3, :3], x) + Cm[:, None, :3, 3]
    return x.reshape(B, H, W, 3)


def _cutout_mask(key, p, cfg: AugmentConfig, B: int, H: int, W: int) -> jax.Array:
    """Per-image cutout keep-mask [B,H,W] (augment.py:405-418)."""
    w = _bernoulli(key, cfg.cutout * p, (B,))
    center = jax.random.uniform(jax.random.fold_in(key, 1), (B, 2))
    size = cfg.cutout_size
    ys_n = jnp.linspace(0, 1, H)[None, :, None]
    xs_n = jnp.linspace(0, 1, W)[None, None, :]
    mask_y = (jnp.abs(ys_n - center[:, 0, None, None]) >= size / 2).astype(jnp.float32)
    mask_x = (jnp.abs(xs_n - center[:, 1, None, None]) >= size / 2).astype(jnp.float32)
    return jnp.maximum(jnp.maximum(mask_y, mask_x), 1.0 - w[:, None, None])


def augment_pipe(
    key: jax.Array,
    images: jax.Array,  # [B, H, W, C] in [-1, 1]
    p: jax.Array,  # scalar global probability
    cfg: AugmentConfig = AugmentConfig(),
) -> jax.Array:
    """Apply the ADA pipe at probability p (contract: training/augment.py:186-420)."""
    B, H, W, C = images.shape
    keys = jax.random.split(key, 16)
    images = _apply_warp(images, _geometry_matrix(keys, p, cfg, B, W, H), cfg)
    if C == 3:
        images = _apply_color(images, _color_matrix(keys, p, cfg, B))
    if cfg.cutout > 0:
        mask = _cutout_mask(jax.random.fold_in(keys[15], 23), p, cfg, B, H, W)
        images = images * mask[..., None]
    return images


def augment_d_input(
    key: jax.Array,
    img: jax.Array,      # [B, R, R, 3]  final RGB in [-1, 1]
    img_raw: jax.Array,  # [B, R, R, 3]  upsampled raw-render RGB
    seg: jax.Array,      # [B, R, R, S]  semantic channels (one-hot*2-1)
    p: jax.Array,
    cfg: AugmentConfig = AugmentConfig(),
):
    """ADA for the dual-branch seg-conditioned D input.

    The SAME per-sample geometric warp is applied to all three stacks (so D's seg
    input stays aligned with its RGB input — the round-1 leak the VERDICT flagged),
    the SAME per-sample color matrix to both RGB stacks only, and the same cutout
    mask to everything — matching the reference semantics of one AugmentPipe call
    on the full D input (training/augment.py:186). Called inside the jitted D/G
    loss for BOTH real and fake inputs with independent keys.
    """
    B, H, W, _ = img.shape
    dt = jnp.dtype(cfg.compute_dtype)
    keys = jax.random.split(key, 16)
    G = _geometry_matrix(keys, p, cfg, B, W, H)
    stack = jnp.concatenate(
        [img.astype(dt), img_raw.astype(dt), seg.astype(dt)], axis=-1)
    stack = _apply_warp(stack, G, cfg)
    img, img_raw, seg = stack[..., :3], stack[..., 3:6], stack[..., 6:]
    Cm = _color_matrix(keys, p, cfg, B).astype(dt)
    img = _apply_color(img, Cm)
    img_raw = _apply_color(img_raw, Cm)
    if cfg.cutout > 0:
        mask = _cutout_mask(jax.random.fold_in(keys[15], 23), p, cfg, B, H, W)[..., None]
        img, img_raw, seg = (img * mask.astype(dt), img_raw * mask.astype(dt),
                             seg * mask.astype(dt))
    return img, img_raw, seg


class AdaState(NamedTuple):
    """Adaptive-p controller state (the reference trains this outside the pipe;
    heuristic: rt = E[sign(D(real))] targeted at `target`, p nudged by
    batch/(kimg*1000) per step).

    Pure HOST state (Python floats): the controller is training-loop control
    flow, and the original jnp-array form cost a handful of eager tunneled
    device dispatches per update boundary for trivial arithmetic (PERF.md
    round 5 loop-vs-step accounting). Device arrays are accepted and coerced.
    """

    p: float  # scalar
    rt_accum: tuple  # (sum_sign, count)


def ada_init() -> AdaState:
    return AdaState(p=0.0, rt_accum=(0.0, 0.0))


def ada_accumulate(state: AdaState, sign_mean, n) -> AdaState:
    """Accumulate the PER-SAMPLE sign statistic.

    sign_mean: mean over samples of sign(D(real)) for one batch — the training
    step computes this inside jit (train/gan.py stats['real_signs']) so the
    heuristic sees E[sign(logit)] per sample, not sign(E[logit]) (the round-1 bug
    the VERDICT flagged; reference semantics: stylegan2-ada 'ada_target' loop).
    n: number of samples the mean covers.
    """
    a = np.asarray(state.rt_accum, np.float64)
    return state._replace(
        rt_accum=(float(a[0]) + float(sign_mean) * n, float(a[1]) + float(n)))


def ada_update(state: AdaState, batch_size: int, target: float = 0.6,
               speed_kimg: float = 500.0, p_max: float = 1.0) -> AdaState:
    """p_max extends the reference controller: when D fully memorizes a small
    dataset, rt pins at 1.0 > target and p integrates upward without bound,
    eventually collapsing G (measured: FID 82->127 as p passed ~0.6 on a
    1k-image run, TRAINING.md). Capping p bounds the leak while keeping the
    adaptive behavior below the cap."""
    a = np.asarray(state.rt_accum, np.float64)
    rt = float(a[0]) / max(float(a[1]), 1.0)
    sgn = (rt > target) - (rt < target)  # matches jnp.sign incl. the 0 case
    adjust = sgn * batch_size / (speed_kimg * 1000.0)
    p = min(max(float(state.p) + adjust, 0.0), p_max)
    return AdaState(p=p, rt_accum=(0.0, 0.0))
