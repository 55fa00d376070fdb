"""Inversion encoders: Encoder, HybridEncoder, MultiViewHybridEncoder.

Reference contracts (inversion/networks.py):
  * EncoderResBlock (:1508-1521): conv3x3 -> conv3x3/down2 + 1x1/down2 skip, /sqrt(2),
  * Encoder (:1560-1601): 1x1 stem -> resblock pyramid to 4^2 -> 4x4 valid conv
    projector emitting n_latents * w_dim,
  * HybridEncoder (:1605-1665): TWO parallel pyramids — image (3ch) -> 10 appearance
    ws, segmentation (19ch) -> 8 geometry ws; output concat is SEG-FIRST
    (geometry rows 0..7, appearance rows 8..17; networks.py:1658),
  * MultiViewHybridEncoder (:1669-1773): pyramids to 1x1 + MLP projectors, with a
    sigma-weighted multi-view fusion module (:1765-1773).

The channel schedule {4:512, ..., 512:32} matches networks.py:1564-1574.
Encoders run in the configured compute dtype; projections return fp32 ws.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from .layers import Conv2dLayer, FullyConnectedLayer

_CHANNELS = {4: 512, 8: 512, 16: 512, 32: 512, 64: 256, 128: 128, 256: 64, 512: 32, 1024: 16}


@dataclasses.dataclass(frozen=True)
class EncoderResBlock:
    in_channels: int
    out_channels: int

    def _layers(self):
        conv1 = Conv2dLayer(self.in_channels, self.in_channels, 3, activation="lrelu")
        conv2 = Conv2dLayer(self.in_channels, self.out_channels, 3, down=2, activation="lrelu")
        skip = Conv2dLayer(self.in_channels, self.out_channels, 1, down=2, bias=False)
        return conv1, conv2, skip

    def init(self, key: jax.Array) -> dict:
        conv1, conv2, skip = self._layers()
        k1, k2, k3 = jax.random.split(key, 3)
        return {"conv1": conv1.init(k1), "conv2": conv2.init(k2), "skip": skip.init(k3)}

    def __call__(self, params: dict, x: jax.Array) -> jax.Array:
        conv1, conv2, skip = self._layers()
        out = conv1(params["conv1"], x)
        out = conv2(params["conv2"], out)
        sk = skip(params["skip"], x)
        return (out + sk) / math.sqrt(2.0)


@dataclasses.dataclass(frozen=True)
class _ConvPyramid:
    """1x1 stem + resblocks from `size` down to 4^2 + 4x4 valid-conv projector."""

    size: int
    input_dim: int
    out_dim: int  # n_latents * w_dim
    dtype: str = "float32"

    def _blocks(self):
        stem = Conv2dLayer(self.input_dim, _CHANNELS[self.size], 1)
        blocks = []
        in_ch = _CHANNELS[self.size]
        for i in range(int(math.log2(self.size)), 2, -1):
            out_ch = _CHANNELS[2 ** (i - 1)]
            blocks.append(EncoderResBlock(in_ch, out_ch))
            in_ch = out_ch
        return stem, blocks, in_ch

    def init(self, key: jax.Array) -> dict:
        stem, blocks, in_ch = self._blocks()
        keys = jax.random.split(key, len(blocks) + 2)
        p = {"stem": stem.init(keys[0])}
        for i, b in enumerate(blocks):
            p[f"block{i}"] = b.init(keys[i + 1])
        # EqualConv2d 4x4, padding 0, no bias (networks.py:1590).
        p["projector"] = {
            "weight": jax.random.normal(keys[-1], (4, 4, in_ch, self.out_dim), jnp.float32)
        }
        return p

    def __call__(self, params: dict, x: jax.Array) -> jax.Array:
        stem, blocks, in_ch = self._blocks()
        x = x.astype(jnp.dtype(self.dtype))
        x = stem(params["stem"], x)
        for i, b in enumerate(blocks):
            x = b(params[f"block{i}"], x)  # -> [B, 4, 4, in_ch]
        scale = 1.0 / math.sqrt(in_ch * 16)
        w = params["projector"]["weight"].astype(x.dtype) * scale
        out = jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype,
        )  # [B, 1, 1, out_dim]
        return out.reshape(x.shape[0], self.out_dim).astype(jnp.float32)


@dataclasses.dataclass(frozen=True)
class Encoder:
    """Single-stream encoder (contract: inversion/networks.py:1560-1601)."""

    size: int
    n_latents: int
    w_dim: int = 512
    input_dim: int = 3
    dtype: str = "float32"

    def _pyramid(self):
        return _ConvPyramid(self.size, self.input_dim, self.n_latents * self.w_dim, self.dtype)

    def init(self, key: jax.Array) -> dict:
        return self._pyramid().init(key)

    def __call__(self, params: dict, x: jax.Array) -> jax.Array:
        out = self._pyramid()(params, x)
        return out.reshape(x.shape[0], self.n_latents, self.w_dim)


@dataclasses.dataclass(frozen=True)
class HybridEncoder:
    """Dual-stream (image + seg) encoder (contract: inversion/networks.py:1605-1665).

    __call__(params, img [B,R,R,3], seg [B,R,R,19]) -> ws [B, geo+app, w_dim], rows
    ordered seg/geometry first (networks.py:1658) to align with the generator's
    latent layout.
    """

    size: int = 512
    n_latents_app: int = 10
    n_latents_geo: int = 8
    w_dim: int = 512
    input_img_dim: int = 3
    input_seg_dim: int = 19
    dtype: str = "float32"

    def _pyramids(self):
        img = _ConvPyramid(self.size, self.input_img_dim, self.n_latents_app * self.w_dim, self.dtype)
        seg = _ConvPyramid(self.size, self.input_seg_dim, self.n_latents_geo * self.w_dim, self.dtype)
        return img, seg

    def init(self, key: jax.Array) -> dict:
        img, seg = self._pyramids()
        ki, ks = jax.random.split(key)
        return {"img": img.init(ki), "seg": seg.init(ks)}

    def __call__(self, params: dict, img: jax.Array, seg: jax.Array) -> jax.Array:
        pimg, pseg = self._pyramids()
        B = img.shape[0]
        out_img = pimg(params["img"], img).reshape(B, self.n_latents_app, self.w_dim)
        out_seg = pseg(params["seg"], seg).reshape(B, self.n_latents_geo, self.w_dim)
        return jnp.concatenate([out_seg, out_img], axis=1)


@dataclasses.dataclass(frozen=True)
class MultiViewHybridEncoder:
    """Multi-view variant with sigma-weighted fusion
    (contract: inversion/networks.py:1669-1773).

    Inputs are stacked views: img [V*B, R, R, 3]; views of the same sample are
    `batch` apart (reference convention, networks.py:1766). Each pyramid output is
    split into (sigma, feature) halves; features are fused across views weighted by
    normalized sigmas (:1765-1773), then projected by a 4-layer MLP.
    """

    size: int = 512
    n_latents_app: int = 10
    n_latents_geo: int = 8
    w_dim: int = 512
    input_img_dim: int = 3
    input_seg_dim: int = 19
    num_view: int = 3
    dtype: str = "float32"

    # Width of the fused (sigma | feature) vector at 1x1 resolution
    # (reference channels[1] = 1024, networks.py:1674).
    fusion_channels: int = 1024

    def _stream(self, input_dim: int, n_latents: int):
        # Pyramid to 4^2, then the 4x4 valid-conv projector produces the 1x1
        # (sigma | feature) vector that the fusion module consumes.
        pyramid = _ConvPyramid(self.size, input_dim, self.fusion_channels, self.dtype)
        mlp = [
            FullyConnectedLayer(self.fusion_channels // 2, 256),
            FullyConnectedLayer(256, 256),
            FullyConnectedLayer(256, 256),
            FullyConnectedLayer(256, n_latents * self.w_dim),
        ]
        return pyramid, mlp

    def init(self, key: jax.Array) -> dict:
        p = {}
        for idx, (name, dim, nl) in enumerate((
            ("img", self.input_img_dim, self.n_latents_app),
            ("seg", self.input_seg_dim, self.n_latents_geo),
        )):
            pyramid, mlp = self._stream(dim, nl)
            keys = jax.random.split(jax.random.fold_in(key, idx), len(mlp) + 1)
            p[name] = {"pyramid": pyramid.init(keys[0])}
            for i, fc in enumerate(mlp):
                p[name][f"fc{i}"] = fc.init(keys[i + 1])
        return p

    def _fuse(self, feats: jax.Array, batch: int) -> jax.Array:
        """sigma-weighted view fusion (networks.py:1765-1773).

        feats: [V*B, F] pyramid outputs; first half of F = sigma, second = feature.
        """
        V = self.num_view
        F = feats.shape[-1]
        x = feats.reshape(V, batch, F)
        sigma, feat = x[..., : F // 2], x[..., F // 2 :]
        denom = sigma.sum(axis=0, keepdims=True)
        denom = jnp.where(denom == 0, 1e-4, denom)
        w = sigma / denom
        # Weight features by the per-view sigma field (flattened spatially).
        fused = (feat * w).sum(axis=0)  # [B, F//2]
        return fused

    def __call__(
        self, params: dict, img: jax.Array, seg: jax.Array, num_view: Optional[int] = None
    ) -> jax.Array:
        V = self.num_view if num_view is None else num_view
        B = img.shape[0] // V

        outs = {}
        for name, x, nl in (
            ("img", img, self.n_latents_app),
            ("seg", seg, self.n_latents_geo),
        ):
            pyramid, mlp = self._stream(
                self.input_img_dim if name == "img" else self.input_seg_dim, nl
            )
            feats = pyramid(params[name]["pyramid"], x)  # [V*B, fusion_channels]
            if V > 1:
                fused = self._fuse(feats, B)
            else:
                # single view: use the feature half directly (networks.py:1740)
                fused = feats[:, feats.shape[-1] // 2 :]
            h = fused
            for i, fc in enumerate(mlp):
                h = fc(params[name][f"fc{i}"], h)
            outs[name] = h.reshape(B, nl, self.w_dim)

        return jnp.concatenate([outs["seg"], outs["img"]], axis=1)
