"""Plain 2D StyleGAN2 generator (skip architecture).

This is the network class TF1-era legacy pickles convert into
(`/root/reference/legacy.py:143-245` builds `networks_stylegan2.Generator` from
the TF variable dict). IDE-3D itself never instantiates it — its generator is
the hybrid tri-plane one (models/generator.py) — but the reference's pkl loader
accepts TF-legacy StyleGAN2 checkpoints, so the framework needs a host network
for them (io/tf_legacy.py builds the state dict; import_stylegan2_generator
below hosts it).

Everything is composed from the layer family the superres stack already uses
(models/layers.py SynthesisLayer/ToRGBLayer, models/blocks.py SynthesisBlock,
models/mapping.py MappingNetwork), so TF-legacy checkpoints exercise the same
parity-tested primitives as native ones. Layout: NHWC activations, HWIO conv
weights, per repo convention.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .blocks import SynthesisBlock
from .layers import SynthesisLayer, ToRGBLayer
from .mapping import MappingNetwork


@dataclasses.dataclass(frozen=True)
class StyleGan2Config:
    """Mirrors the kwarg surface legacy.py:150-181 recovers from TF pickles."""

    z_dim: int = 512
    c_dim: int = 0
    w_dim: int = 512
    img_resolution: int = 1024
    img_channels: int = 3
    channel_base: int = 32768  # fmap_base * 2 (legacy.py:163)
    channel_max: int = 512
    conv_clamp: Optional[float] = 256.0
    mapping_num_layers: int = 8
    mapping_embed_features: Optional[int] = None
    w_avg_beta: float = 0.995
    # compute dtype of the synthesis blocks (the reference's num_fp16_res
    # becomes a single bf16 switch on TPU: fp16 block-splitting is a CUDA
    # memory tactic, not a numerics contract)
    dtype: str = "float32"
    # 'skip' (StyleGAN2 default: per-resolution ToRGB summed into an upsampled
    # running image) or 'orig' (progressive-era: ONE ToRGB on the final block;
    # what TF ToRGB_lod checkpoints convert into, legacy.py:196-200 — torch
    # SynthesisBlock architecture='orig' semantics: intermediate blocks emit
    # no image and hold no skip/torgb weights)
    architecture: str = "skip"


@dataclasses.dataclass(frozen=True)
class StyleGan2Generator:
    cfg: StyleGan2Config

    @property
    def block_resolutions(self):
        import math

        log2 = int(math.log2(self.cfg.img_resolution))
        return tuple(2 ** i for i in range(2, log2 + 1))  # 4, 8, ..., R

    def _channels(self, res: int) -> int:
        return min(self.cfg.channel_base // res, self.cfg.channel_max)

    @property
    def num_ws(self) -> int:
        # b4 consumes (conv1, torgb) = 2 rows; each upsampling block 3 rows,
        # with the torgb row shared with the next block's conv0 (StyleGAN2
        # convention: num_ws counts conv rows + 1)
        return 2 * len(self.block_resolutions)

    def _mapping(self) -> MappingNetwork:
        return MappingNetwork(
            z_dim=self.cfg.z_dim,
            c_dim=self.cfg.c_dim,
            w_dim=self.cfg.w_dim,
            num_ws=self.num_ws,
            num_layers=self.cfg.mapping_num_layers,
            embed_features=self.cfg.mapping_embed_features,
            w_avg_beta=self.cfg.w_avg_beta,
        )

    def _b4_layers(self):
        ch = self._channels(4)
        conv1 = SynthesisLayer(ch, ch, self.cfg.w_dim, 4,
                               conv_clamp=self.cfg.conv_clamp)
        torgb = ToRGBLayer(ch, self.cfg.img_channels, self.cfg.w_dim,
                           conv_clamp=self.cfg.conv_clamp)
        return conv1, torgb

    def _block(self, res: int) -> SynthesisBlock:
        return SynthesisBlock(
            in_channels=self._channels(res // 2),
            out_channels=self._channels(res),
            w_dim=self.cfg.w_dim,
            resolution=res,
            img_channels=self.cfg.img_channels,
            up=2,
            conv_clamp=self.cfg.conv_clamp,
            dtype=self.cfg.dtype,
        )

    def _final_torgb(self):
        return ToRGBLayer(self._channels(self.cfg.img_resolution),
                          self.cfg.img_channels, self.cfg.w_dim,
                          conv_clamp=self.cfg.conv_clamp)

    def init(self, key: jax.Array) -> dict:
        km, kc, k1, k2, *kb = jax.random.split(key, 4 + len(self.block_resolutions))
        conv1, torgb = self._b4_layers()
        orig = self.cfg.architecture == "orig"
        last_res = self.block_resolutions[-1]
        b4 = {
            "const": jax.random.normal(kc, (4, 4, self._channels(4)), jnp.float32),
            "conv1": conv1.init(k1),
        }
        if not orig or last_res == 4:
            b4["torgb"] = torgb.init(k2)
        synthesis = {"b4": b4}
        for res, k in zip(self.block_resolutions[1:], kb):
            bp = self._block(res).init(k)
            if orig and res != last_res:
                bp.pop("torgb", None)
            synthesis[f"b{res}"] = bp
        return {"mapping": self._mapping().init(km), "synthesis": synthesis}

    def mapping(self, params, z, c=None, truncation_psi: float = 1.0,
                broadcast: bool = True):
        ws = self._mapping()(params["mapping"], z, c, broadcast=broadcast)
        if truncation_psi != 1.0:
            ws = params["mapping"]["w_avg"] + truncation_psi * (
                ws - params["mapping"]["w_avg"])
        return ws

    def synthesis(self, params, ws, noise_mode: str = "const",
                  rng: Optional[jax.Array] = None) -> jax.Array:
        """ws: [B, num_ws, w_dim] -> img [B, R, R, img_channels] in [-1, 1]."""
        p = params["synthesis"]
        dtype = jnp.dtype(self.cfg.dtype)
        B = ws.shape[0]
        conv1, torgb = self._b4_layers()
        x = jnp.broadcast_to(p["b4"]["const"][None], (B,) + p["b4"]["const"].shape)
        nk = None
        if noise_mode == "random":
            assert rng is not None
            rng, nk = jax.random.split(rng)
        x = conv1(p["b4"]["conv1"], x.astype(dtype), ws[:, 0], noise_mode=noise_mode,
                  noise_key=nk)
        if self.cfg.architecture == "orig":
            # progressive-era semantics: conv stacks only; ONE ToRGB at the end
            # (torch SynthesisBlock architecture='orig': is_last emits the
            # image, intermediate blocks return img=None)
            w_i = 1
            for res in self.block_resolutions[1:]:
                nk0 = nk1 = None
                if noise_mode == "random":
                    rng, nk0 = jax.random.split(rng)
                    rng, nk1 = jax.random.split(rng)
                conv0, conv1u, _ = self._block(res)._layers()
                bp = p[f"b{res}"]
                x = conv0(bp["conv0"], x.astype(dtype), ws[:, w_i],
                          noise_mode=noise_mode, noise_key=nk0)
                x = conv1u(bp["conv1"], x, ws[:, w_i + 1],
                           noise_mode=noise_mode, noise_key=nk1)
                w_i += 2
            last = self.block_resolutions[-1]
            tp = p["b4"]["torgb"] if last == 4 else p[f"b{last}"]["torgb"]
            final_torgb = torgb if last == 4 else self._final_torgb()
            return final_torgb(tp, x, ws[:, w_i]).astype(jnp.float32)
        img = torgb(p["b4"]["torgb"], x, ws[:, 1]).astype(jnp.float32)
        w_i = 1  # torgb row w is shared with the next conv0 (StyleGAN2 row plan)
        for res in self.block_resolutions[1:]:
            nk = None
            if noise_mode == "random":
                rng, nk = jax.random.split(rng)
            x, img = self._block(res)(
                params["synthesis"][f"b{res}"], x, img, ws[:, w_i:w_i + 3],
                noise_mode=noise_mode, noise_key=nk)
            w_i += 2
        return img

    def __call__(self, params, z, c=None, truncation_psi: float = 1.0,
                 noise_mode: str = "const", rng: Optional[jax.Array] = None):
        ws = self.mapping(params, z, c, truncation_psi=truncation_psi)
        return self.synthesis(params, ws, noise_mode=noise_mode, rng=rng)
