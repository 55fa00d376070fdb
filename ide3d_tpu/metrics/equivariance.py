"""Equivariance metrics EQ-T / EQ-R (contract: metrics/equivariance.py:192-260).

The reference (StyleGAN3-lineage) measures PSNR between transforming the
generator's input coordinates and transforming its output image. Adapted to the
3D generator: the input-side transform acts on the CAMERA —
  * EQ-T: principal-point shift by an integer number of render pixels
    (RenderParams.pixel_offset) vs. rolling the rendered image,
  * EQ-R: rolling the camera about its view axis vs. rotating the image.
PSNR is computed over the valid overlap region, in dB, matching the reference's
`10 log10(4 / mse)` convention for [-1,1] images (equivariance.py:250).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from .. import render as R
from ..render.renderer import RenderParams
from .metric_utils import MetricOptions


def _psnr(a: jax.Array, b: jax.Array) -> jax.Array:
    mse = jnp.mean(jnp.square(a - b))
    return 10.0 * jnp.log10(4.0 / jnp.maximum(mse, 1e-10))


def _roll_matrix(theta: float) -> jnp.ndarray:
    c, s = math.cos(theta), math.sin(theta)
    m = np.eye(4, dtype=np.float32)
    m[0, 0], m[0, 1], m[1, 0], m[1, 1] = c, -s, s, c
    return jnp.asarray(m)


def compute_eqt(opts: MetricOptions, shift_px: int = 4) -> float:
    """Translation equivariance of the neural render (integer-pixel variant)."""
    G, params = opts.G, opts.g_params
    S = G.synthesis
    rs = np.random.RandomState(opts.seed)
    render_size = G.cfg.render_size
    ndc_per_px = 2.0 / (render_size - 1)
    rp0 = G.cfg.render
    rp1 = dataclasses.replace(rp0, pixel_offset=(shift_px * ndc_per_px, 0.0))

    @jax.jit
    def pair(params, z, c):
        ws = G.mapping(params["mapping"], z, c)
        out0 = S(params["synthesis"], ws, c, render_params=rp0, return_raw=True)[1]
        out1 = S(params["synthesis"], ws, c, render_params=rp1, return_raw=True)[1]
        # shifting the image plane by +dx NDC shows content that lies dx to the
        # right -> out1 == out0 shifted left by shift_px
        ref = jnp.roll(out0, -shift_px, axis=2)
        valid0 = ref[:, :, : render_size - shift_px]
        valid1 = out1[:, :, : render_size - shift_px]
        return _psnr(valid0, valid1)

    scores = []
    done = 0
    while done < opts.num_items:
        z = jnp.asarray(rs.randn(1, G.cfg.z_dim), jnp.float32)
        c = jnp.asarray(R.CANONICAL_POSE_25)[None]
        scores.append(float(pair(params, z, c)))
        done += 1
    return float(np.mean(scores))


def compute_eqr(opts: MetricOptions, angle: float = math.pi / 12) -> float:
    """Rotation equivariance: camera roll vs. image rotation (center disc)."""
    G, params = opts.G, opts.g_params
    S = G.synthesis
    rs = np.random.RandomState(opts.seed)
    rsz = G.cfg.render_size
    roll = _roll_matrix(angle)

    # rotation grid for the image-side rotation (bilinear, about center)
    ys = (np.arange(rsz) * 2 + 1) / rsz - 1
    xs = (np.arange(rsz) * 2 + 1) / rsz - 1
    gx, gy = np.meshgrid(xs, ys)
    ca, sa = math.cos(angle), math.sin(angle)
    # image y axis points down; camera roll by +a rotates content by -a on screen
    sx = ca * gx - sa * gy
    sy = sa * gx + ca * gy
    grid = jnp.asarray(np.stack([sx, sy], -1).reshape(1, -1, 2), jnp.float32)
    disc = jnp.asarray((gx**2 + gy**2 <= 0.8**2).astype(np.float32))[None, :, :, None]

    from ..ops.grid_sample import grid_sample_2d

    @jax.jit
    def pair(params, z, c):
        ws = G.mapping(params["mapping"], z, c)
        _, out0 = S(params["synthesis"], ws, c, return_raw=True)
        c2w = c[:, :16].reshape(-1, 4, 4)
        c_roll = R.make_label_25((c2w @ roll))
        _, out1 = S(params["synthesis"], ws, c_roll, return_raw=True)
        ref = grid_sample_2d(out0, grid, align_corners=False).reshape(out0.shape)
        return _psnr(ref * disc, out1 * disc)

    scores = []
    for i in range(opts.num_items):
        z = jnp.asarray(rs.randn(1, G.cfg.z_dim), jnp.float32)
        c = jnp.asarray(R.CANONICAL_POSE_25)[None]
        scores.append(float(pair(params, z, c)))
    return float(np.mean(scores))
