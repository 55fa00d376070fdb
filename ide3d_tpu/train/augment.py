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
(ops/grid_sample.py), colors into a single 4x4 matrix -> one einsum. The reference's
wavelet-based anti-aliasing for large rotations is intentionally replaced by
bilinear resampling (documented deviation; the FFHQ config 'bgc' uses blit+geom+color
where the difference is minor).
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.grid_sample import grid_sample_2d


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


def augment_pipe(
    key: jax.Array,
    images: jax.Array,  # [B, H, W, C] in [-1, 1]
    p: jax.Array,  # scalar global probability
    cfg: AugmentConfig = AugmentConfig(),
) -> jax.Array:
    """Apply the ADA pipe at probability p (contract: training/augment.py:186-420)."""
    B, H, W, C = images.shape
    keys = jax.random.split(key, 16)
    G = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))  # forward geometry (image coords in [-1,1])

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
        w = _bernoulli(keys[3], cfg.xint * p, (B, 2))
        t = (jax.random.uniform(keys[4], (B, 2)) * 2 - 1) * cfg.xint_max * w
        t = jnp.round(t * jnp.asarray([W, H]) / 2.0) * 2.0 / jnp.asarray([W, H])
        G = _translate2d(t[:, 0], t[:, 1]) @ G
    if cfg.scale > 0:
        w = _bernoulli(keys[5], cfg.scale * p, (B,))
        s = jnp.exp2(jax.random.normal(keys[6], (B,)) * cfg.scale_std * w)
        G = _scale2d(s, s) @ G
    if cfg.rotate > 0:
        w = _bernoulli(keys[7], cfg.rotate * p, (B,))
        theta = (jax.random.uniform(keys[8], (B,)) * 2 - 1) * math.pi * cfg.rotate_max * w
        G = _rot2d(-theta) @ G
    if cfg.aniso > 0:
        w = _bernoulli(keys[9], cfg.aniso * p, (B,))
        s = jnp.exp2(jax.random.normal(keys[10], (B,)) * cfg.aniso_std * w)
        G = _scale2d(s, 1.0 / s) @ G
    if cfg.xfrac > 0:
        w = _bernoulli(keys[11], cfg.xfrac * p, (B, 2))
        t = jax.random.normal(keys[12], (B, 2)) * cfg.xfrac_std * w
        G = _translate2d(t[:, 0], t[:, 1]) @ G

    # Execute the inverse warp once (bilinear, zeros padding).
    Ginv = jnp.linalg.inv(G)
    # pixel centers in align_corners=False convention -> identity matrix == identity warp
    ys = (jnp.arange(H) * 2.0 + 1.0) / H - 1.0
    xs = (jnp.arange(W) * 2.0 + 1.0) / W - 1.0
    gx, gy = jnp.meshgrid(xs, ys)
    grid = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1).reshape(1, H * W, 3)
    src = jnp.einsum("bij,bnj->bni", Ginv, jnp.broadcast_to(grid, (B, H * W, 3)))
    images = grid_sample_2d(images, src[..., :2], align_corners=False).reshape(B, H, W, C)

    # ---- color transforms as one 4x4 matrix (augment.py:290-350)
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
    if cfg.hue > 0 and C > 1:
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
    if cfg.saturation > 0 and C > 1:
        ks = jax.random.fold_in(keys[15], 13)
        w = _bernoulli(ks, cfg.saturation * p, (B,))
        s = jnp.exp2(jax.random.normal(jax.random.fold_in(ks, 1), (B,)) * cfg.saturation_std * w)
        vvT = jnp.outer(v, v)[None]
        M = vvT + (jnp.eye(4)[None] - vvT) * s[:, None, None]
        Cm = M @ Cm

    if C == 3:
        x = images.reshape(B, H * W, 3)
        x = jnp.einsum("bij,bnj->bni", Cm[:, :3, :3], x) + Cm[:, None, :3, 3]
        images = x.reshape(B, H, W, 3)

    # ---- cutout (augment.py:405-418)
    if cfg.cutout > 0:
        kc = jax.random.fold_in(keys[15], 23)
        w = _bernoulli(kc, cfg.cutout * p, (B,))
        center = jax.random.uniform(jax.random.fold_in(kc, 1), (B, 2))
        size = cfg.cutout_size
        ys_n = jnp.linspace(0, 1, H)[None, :, None]
        xs_n = jnp.linspace(0, 1, W)[None, None, :]
        mask_y = (jnp.abs(ys_n - center[:, 0, None, None]) >= size / 2).astype(jnp.float32)
        mask_x = (jnp.abs(xs_n - center[:, 1, None, None]) >= size / 2).astype(jnp.float32)
        mask = jnp.maximum(jnp.maximum(mask_y, mask_x), 1.0 - w[:, None, None])
        images = images * mask[..., None]

    return images


class AdaState(NamedTuple):
    """Adaptive-p controller state (the reference trains this outside the pipe;
    heuristic: rt = E[sign(D(real))] targeted at `target`, p nudged by
    batch/(kimg*1000) per step)."""

    p: jax.Array  # scalar
    rt_accum: jax.Array  # (sum_sign, count)


def ada_init() -> AdaState:
    return AdaState(p=jnp.zeros(()), rt_accum=jnp.zeros((2,)))


def ada_accumulate(state: AdaState, real_logits: jax.Array) -> AdaState:
    s = jnp.stack([jnp.sign(real_logits).sum(), jnp.asarray(real_logits.size, jnp.float32)])
    return state._replace(rt_accum=state.rt_accum + s)


def ada_update(state: AdaState, batch_size: int, target: float = 0.6,
               speed_kimg: float = 500.0) -> AdaState:
    rt = state.rt_accum[0] / jnp.maximum(state.rt_accum[1], 1.0)
    adjust = jnp.sign(rt - target) * batch_size / (speed_kimg * 1000.0)
    p = jnp.clip(state.p + adjust, 0.0, 1.0)
    return AdaState(p=p, rt_accum=jnp.zeros((2,)))
