"""Synthesis blocks: the 2D superresolution block and the dual-path tri-plane block.

Reference contracts:
  * `SynthesisBlock` (inversion/networks.py:718-858): skip architecture — two
    modulated convs (first upsamples), accumulated RGB skip branch upsampled with the
    FIR filter,
  * `SegSynthesisBlock` / pickled `vb{res}` blocks (inversion/networks.py:966-1139 +
    call sites extract_shapes.py:127-129): signature
    `(x, img_v, ws, condition_img=seg_v) -> (x, img_v, seg_v)` — a dual ToRGB/ToSEG
    head sharing one w row, with the TEXTURE path conditioned on the SEMANTIC path
    (IDE-3D paper Sec. 3.1; realized here as SPADE-style spatial modulation of the
    texture features by the incoming semantic planes).

The exact interior of the pickled vb block is not recoverable from the reference tree
(the class lives only inside the checkpoint pickle — see SURVEY.md "Critical repo
fact"). Two interiors are provided:

  * the default clean-room design (single w-consuming conv + SPADE conditioning, so
    that 7 plane blocks + 1 shared plane-head w = the 8 geometry rows that
    Painter/run_UI.py:198 and HybridEncoder(n_latents_geo=8) pin down), and
  * `ref_compat=True`: the repo-visible `SegSynthesisBlock` interior
    (inversion/networks.py:1008-1139) — conv0 (upsampling) + conv1, dual
    ToRGB/ToSEG heads sharing one w row, skip planes upsampled with the FIR filter,
    condition_img accepted-but-unused (the repo-visible layer swallows it via
    **unused_kwargs, networks.py:347). This variant can HOST reference checkpoint
    weights 1:1 (io/torch_import.import_generator) — the round-2 parity gate.

Blocks run in a configurable compute dtype (bf16 on TPU); accumulated plane/RGB
outputs stay fp32, mirroring the reference's fp16/fp32 split (networks.py:856-857).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.upfirdn2d import setup_filter, upsample2d
from .layers import Conv2dLayer, SynthesisLayer, ToRGBLayer, DEFAULT_RESAMPLE_FILTER


@dataclasses.dataclass(frozen=True)
class SynthesisBlock:
    """StyleGAN2 skip-architecture block (superres stack).

    Consumes ws rows (w_conv0, w_conv1, w_torgb); when `up == 1` the block refines at
    constant resolution (used for the first superres block at render_size).
    """

    in_channels: int
    out_channels: int
    w_dim: int
    resolution: int
    img_channels: int
    up: int = 2
    resample_filter: tuple = DEFAULT_RESAMPLE_FILTER
    conv_clamp: Optional[float] = 256.0
    dtype: str = "float32"

    def _layers(self):
        conv0 = SynthesisLayer(
            self.in_channels, self.out_channels, self.w_dim, self.resolution,
            up=self.up, resample_filter=self.resample_filter, conv_clamp=self.conv_clamp,
        )
        conv1 = SynthesisLayer(
            self.out_channels, self.out_channels, self.w_dim, self.resolution,
            conv_clamp=self.conv_clamp,
        )
        torgb = ToRGBLayer(self.out_channels, self.img_channels, self.w_dim,
                           conv_clamp=self.conv_clamp)
        return conv0, conv1, torgb

    def init(self, key: jax.Array) -> dict:
        conv0, conv1, torgb = self._layers()
        k0, k1, k2 = jax.random.split(key, 3)
        return {"conv0": conv0.init(k0), "conv1": conv1.init(k1), "torgb": torgb.init(k2)}

    def __call__(
        self,
        params: dict,
        x: jax.Array,  # [B, r/up, r/up, in_channels]
        img: Optional[jax.Array],  # [B, r/up, r/up, img_channels] fp32 skip, or None
        ws3: jax.Array,  # [B, 3, w_dim]
        noise_mode: str = "const",
        noise_key: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        conv0, conv1, torgb = self._layers()
        dtype = jnp.dtype(self.dtype)
        x = x.astype(dtype)

        nk0 = nk1 = None
        if noise_key is not None:
            nk0, nk1 = jax.random.split(noise_key)
        x = conv0(params["conv0"], x, ws3[:, 0], noise_mode=noise_mode, noise_key=nk0)
        x = conv1(params["conv1"], x, ws3[:, 1], noise_mode=noise_mode, noise_key=nk1)

        if img is not None and self.up > 1:
            img = upsample2d(img, setup_filter(self.resample_filter), up=self.up)
        y = torgb(params["torgb"], x, ws3[:, 2]).astype(jnp.float32)
        img = y if img is None else img + y
        return x, img


@dataclasses.dataclass(frozen=True)
class SegSynthesisBlock:
    """Dual-path tri-plane block `vb{res}`.

    forward(params, x, img_v, ws2, condition_img=seg_v_prev) -> (x, img_v, seg_v)
      x        [B, r, r, C]        backbone features (bf16-capable),
      img_v    [B, r, r, 3*Cf]     texture plane stack (fp32 skip accumulation),
      seg_v    [B, r, r, 3*Cs]     semantic plane stack (fp32 skip accumulation),
      ws2      [B, 2, w_dim]       (w_conv, w_planes) — w_planes is the SHARED head
                                   row (geometry row 7) across all vb blocks.

    Texture-on-semantics conditioning: gamma/beta 1x1 convs of the (upsampled)
    incoming seg planes spatially modulate the features feeding the texture head
    only; the semantic head sees the unconditioned features. This keeps geometry
    editable independently of appearance — the property the Painter edit loop
    exploits (Painter/run_UI.py:167-206).
    """

    in_channels: int  # 0 = first block (learned const input)
    out_channels: int
    w_dim: int
    resolution: int
    img_plane_channels: int  # 3 * feature_channels
    seg_plane_channels: int  # 3 * seg_channels
    up: int = 2
    resample_filter: tuple = DEFAULT_RESAMPLE_FILTER
    conv_clamp: Optional[float] = 256.0
    dtype: str = "float32"
    # ref_compat=True switches to the reference two-conv interior (see module
    # docstring); param names then mirror the torch state_dict (conv0/conv1).
    ref_compat: bool = False

    @property
    def num_conv(self) -> int:
        """w rows consumed by convs (reference `num_conv`, networks.py:997-1030)."""
        if not self.ref_compat:
            return 1
        return 1 if self.in_channels == 0 else 2

    @property
    def num_ws_rows(self) -> int:
        """w rows this block READS (num_conv + 1 shared ToRGB/ToSEG row)."""
        return self.num_conv + 1

    def _ref_layers(self):
        conv0 = None
        if self.in_channels != 0:
            conv0 = SynthesisLayer(
                self.in_channels, self.out_channels, self.w_dim, self.resolution,
                up=self.up, resample_filter=self.resample_filter,
                conv_clamp=self.conv_clamp,
            )
        conv1 = SynthesisLayer(
            self.out_channels, self.out_channels, self.w_dim, self.resolution,
            conv_clamp=self.conv_clamp,
        )
        torgb = ToRGBLayer(self.out_channels, self.img_plane_channels, self.w_dim,
                           conv_clamp=self.conv_clamp)
        toseg = ToRGBLayer(self.out_channels, self.seg_plane_channels, self.w_dim,
                           conv_clamp=self.conv_clamp)
        return conv0, conv1, torgb, toseg

    def _layers(self):
        conv = SynthesisLayer(
            self.in_channels if self.in_channels else self.out_channels,
            self.out_channels,
            self.w_dim,
            self.resolution,
            up=self.up if self.in_channels else 1,
            resample_filter=self.resample_filter,
            conv_clamp=self.conv_clamp,
        )
        torgb = ToRGBLayer(self.out_channels, self.img_plane_channels, self.w_dim,
                           conv_clamp=self.conv_clamp)
        toseg = ToRGBLayer(self.out_channels, self.seg_plane_channels, self.w_dim,
                           conv_clamp=self.conv_clamp)
        spade_gamma = Conv2dLayer(self.seg_plane_channels, self.out_channels, 1,
                                  activation="linear")
        spade_beta = Conv2dLayer(self.seg_plane_channels, self.out_channels, 1,
                                 activation="linear")
        return conv, torgb, toseg, spade_gamma, spade_beta

    def init(self, key: jax.Array) -> dict:
        if self.ref_compat:
            conv0, conv1, torgb, toseg = self._ref_layers()
            keys = jax.random.split(key, 5)
            p = {
                "conv1": conv1.init(keys[1]),
                "torgb": torgb.init(keys[2]),
                "toseg": toseg.init(keys[3]),
            }
            if conv0 is not None:
                p["conv0"] = conv0.init(keys[0])
            if self.in_channels == 0:
                p["const"] = jax.random.normal(
                    keys[4], (self.resolution, self.resolution, self.out_channels),
                    jnp.float32,
                )
            return p
        conv, torgb, toseg, sg, sb = self._layers()
        keys = jax.random.split(key, 6)
        p = {
            "conv": conv.init(keys[0]),
            "torgb": torgb.init(keys[1]),
            "toseg": toseg.init(keys[2]),
            "spade_gamma": sg.init(keys[3]),
            "spade_beta": sb.init(keys[4]),
        }
        if self.in_channels == 0:
            p["const"] = jax.random.normal(
                keys[5], (self.resolution, self.resolution, self.out_channels), jnp.float32
            )
        return p

    def _call_ref(
        self,
        params: dict,
        x: Optional[jax.Array],
        img_v: Optional[jax.Array],
        ws: jax.Array,  # [B, num_conv + 1, w_dim]
        condition_img: Optional[jax.Array],
        noise_mode: str,
        noise_key: Optional[jax.Array],
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Reference interior (inversion/networks.py:1053-1139): conv0(up) -> conv1
        -> shared-w ToRGB/ToSEG; incoming skip planes upsampled with the FIR filter;
        condition_img ignored (reference layer swallows it, networks.py:347)."""
        conv0, conv1, torgb, toseg = self._ref_layers()
        dtype = jnp.dtype(self.dtype)
        f = setup_filter(self.resample_filter)
        seg_v = condition_img

        nk0 = nk1 = None
        if noise_key is not None:
            nk0, nk1 = jax.random.split(noise_key)

        wi = 0
        if self.in_channels == 0:
            B = ws.shape[0]
            x = jnp.broadcast_to(params["const"].astype(dtype)[None], (B,) + params["const"].shape)
        else:
            x = x.astype(dtype)
            x = conv0(params["conv0"], x, ws[:, wi], noise_mode=noise_mode, noise_key=nk0)
            wi += 1
        x = conv1(params["conv1"], x, ws[:, wi], noise_mode=noise_mode, noise_key=nk1)
        w_shared = ws[:, wi + 1]

        if img_v is not None and img_v.shape[1] * 2 == x.shape[1]:
            img_v = upsample2d(img_v, f, up=2)
        if seg_v is not None and seg_v.shape[1] * 2 == x.shape[1]:
            seg_v = upsample2d(seg_v, f, up=2)

        y = torgb(params["torgb"], x, w_shared).astype(jnp.float32)
        img_v = y if img_v is None else img_v + y
        y_seg = toseg(params["toseg"], x, w_shared).astype(jnp.float32)
        seg_v = y_seg if seg_v is None else seg_v + y_seg
        return x, img_v, seg_v

    def __call__(
        self,
        params: dict,
        x: Optional[jax.Array],
        img_v: Optional[jax.Array],
        ws2: jax.Array,
        condition_img: Optional[jax.Array] = None,  # previous seg_v planes
        noise_mode: str = "const",
        noise_key: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        if self.ref_compat:
            return self._call_ref(
                params, x, img_v, ws2, condition_img, noise_mode, noise_key
            )
        conv, torgb, toseg, spade_gamma, spade_beta = self._layers()
        dtype = jnp.dtype(self.dtype)
        f = setup_filter(self.resample_filter)

        if self.in_channels == 0:
            B = ws2.shape[0]
            x = jnp.broadcast_to(params["const"].astype(dtype)[None], (B,) + params["const"].shape)
        else:
            x = x.astype(dtype)

        x = conv(params["conv"], x, ws2[:, 0], noise_mode=noise_mode, noise_key=noise_key)

        # Upsample incoming skip planes.
        if img_v is not None and self.up > 1 and self.in_channels != 0:
            img_v = upsample2d(img_v, f, up=self.up)
        if condition_img is not None and self.up > 1 and self.in_channels != 0:
            condition_img = upsample2d(condition_img, f, up=self.up)

        # Semantic head first (unconditioned features).
        y_seg = toseg(params["toseg"], x, ws2[:, 1]).astype(jnp.float32)
        seg_v = y_seg if condition_img is None else condition_img + y_seg

        # Texture head conditioned on the accumulated semantic planes (SPADE-style).
        sv = seg_v.astype(dtype)
        gamma = spade_gamma(params["spade_gamma"], sv)
        beta = spade_beta(params["spade_beta"], sv)
        x_tex = x * (1.0 + gamma) + beta
        y_img = torgb(params["torgb"], x_tex, ws2[:, 1]).astype(jnp.float32)
        img_v = y_img if img_v is None else img_v + y_img

        return x, img_v, seg_v
