"""StyleGAN2 discriminator family, including the IDE-3D dual-branch variant.

Reference contracts: DiscriminatorBlock (inversion/networks.py:1271-1355),
MinibatchStdLayer (:1360-1381), DiscriminatorEpilogue (:1386-1441),
Discriminator (:1446-1502). The IDE-3D D consumes the 512^2 RGB concatenated with
the (upsampled) 64^2 raw neural render — commented call at
apps/train_hybrid_encoder.py:302 `D(cat([img, img_raw], 1), c)` — and, per the paper,
optionally the semantic mask; `img_channels` covers all variants (6 = RGB+raw,
25 = RGB+raw+seg).

TPU notes: resnet blocks run in the configured compute dtype; the epilogue runs fp32.
Minibatch-std uses the per-device batch (under pjit DP sharding this matches the
reference's per-GPU group semantics).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .layers import Conv2dLayer, FullyConnectedLayer
from .mapping import MappingNetwork


@dataclasses.dataclass(frozen=True)
class DiscriminatorBlock:
    in_channels: int  # 0 = first block (fromrgb)
    tmp_channels: int
    out_channels: int
    resolution: int
    img_channels: int
    activation: str = "lrelu"
    conv_clamp: Optional[float] = 256.0
    dtype: str = "float32"

    def _layers(self):
        fromrgb = (
            Conv2dLayer(self.img_channels, self.tmp_channels, 1, activation=self.activation,
                        conv_clamp=self.conv_clamp)
            if self.in_channels == 0
            else None
        )
        conv0 = Conv2dLayer(self.tmp_channels, self.tmp_channels, 3,
                            activation=self.activation, conv_clamp=self.conv_clamp)
        conv1 = Conv2dLayer(self.tmp_channels, self.out_channels, 3, down=2,
                            activation=self.activation, conv_clamp=self.conv_clamp)
        skip = Conv2dLayer(self.tmp_channels, self.out_channels, 1, bias=False, down=2)
        return fromrgb, conv0, conv1, skip

    def init(self, key: jax.Array) -> dict:
        fromrgb, conv0, conv1, skip = self._layers()
        keys = jax.random.split(key, 4)
        p = {"conv0": conv0.init(keys[0]), "conv1": conv1.init(keys[1]), "skip": skip.init(keys[2])}
        if fromrgb is not None:
            p["fromrgb"] = fromrgb.init(keys[3])
        return p

    def __call__(self, params: dict, x: Optional[jax.Array], img: Optional[jax.Array]):
        fromrgb, conv0, conv1, skip = self._layers()
        dtype = jnp.dtype(self.dtype)
        if x is not None:
            x = x.astype(dtype)
        if fromrgb is not None:
            y = fromrgb(params["fromrgb"], img.astype(dtype))
            x = y if x is None else x + y
        y = skip(params["skip"], x, gain=np.sqrt(0.5))
        x = conv0(params["conv0"], x)
        x = conv1(params["conv1"], x, gain=np.sqrt(0.5))
        return y + x


def minibatch_stddev(x: jax.Array, group_size: int = 4, num_channels: int = 1) -> jax.Array:
    """Contract: inversion/networks.py:1360-1381 (NHWC).

    Reference semantics: groups are STRIDED — after `x.reshape(G, n, ...)`
    sample s belongs to group s mod n, and the `y.repeat(G, 1, H, W)`
    scatter-back tiles the n-axis so out[s] = y[s mod n]
    (inversion/networks.py:1378-1379; pinned against a torch oracle at
    N > group_size in tests/test_import_parity.py).

    TPU formulation: the group mean/variance are computed with a replicated
    [N, N] group-membership matmul over a flat [N, H*W*C] view instead of the
    reference's rank-6 reshape. Identical two-pass math (center, then average
    the squares over the group), but the batch axis is never folded into a
    group axis — under data-parallel pjit the reshape form forced SPMD into
    "involuntary full rematerialization" resharding on the rank-6
    intermediates inside R1's grad-of-grad (round-3 MULTICHIP artifact),
    while the matmul form lowers to one small all-gather + MXU matmuls.
    Every sample row directly receives its own group's statistic, so no
    scatter-back is needed at all.
    """
    N, H, W, C = x.shape
    G = min(group_size, N) if group_size is not None else N
    F = num_channels
    c = C // F
    n = N // G
    idx = jnp.arange(N)
    same_group = (idx[:, None] % n) == (idx[None, :] % n)
    M = same_group.astype(jnp.float32) / G  # row s averages over group(s)
    xf = x.reshape(N, H * W * C).astype(jnp.float32)
    mean_g = M @ xf
    var_g = M @ jnp.square(xf - mean_g)
    std = jnp.sqrt(var_g + 1e-8)  # [N, HWC]; identical rows within a group
    y = std.reshape(N, H, W, F, c).mean(axis=(1, 2, 4))  # [N, F]
    y = jnp.broadcast_to(y[:, None, None, :], (N, H, W, F)).astype(x.dtype)
    return jnp.concatenate([x, y], axis=-1)


@dataclasses.dataclass(frozen=True)
class DiscriminatorEpilogue:
    in_channels: int
    cmap_dim: int
    resolution: int = 4
    activation: str = "lrelu"
    mbstd_group_size: int = 4
    mbstd_num_channels: int = 1
    conv_clamp: Optional[float] = 256.0

    def _layers(self):
        conv = Conv2dLayer(self.in_channels + self.mbstd_num_channels, self.in_channels, 3,
                           activation=self.activation, conv_clamp=self.conv_clamp)
        fc = FullyConnectedLayer(self.in_channels * self.resolution**2, self.in_channels,
                                 activation=self.activation)
        out = FullyConnectedLayer(self.in_channels, 1 if self.cmap_dim == 0 else self.cmap_dim)
        return conv, fc, out

    def init(self, key: jax.Array) -> dict:
        conv, fc, out = self._layers()
        k0, k1, k2 = jax.random.split(key, 3)
        return {"conv": conv.init(k0), "fc": fc.init(k1), "out": out.init(k2)}

    def __call__(self, params: dict, x: jax.Array, cmap: Optional[jax.Array]):
        conv, fc, out = self._layers()
        x = x.astype(jnp.float32)
        if self.mbstd_num_channels > 0:
            x = minibatch_stddev(x, self.mbstd_group_size, self.mbstd_num_channels)
        x = conv(params["conv"], x)
        x = fc(params["fc"], x.reshape(x.shape[0], -1))
        x = out(params["out"], x)
        if self.cmap_dim > 0:
            x = jnp.sum(x * cmap, axis=1, keepdims=True) * (1.0 / np.sqrt(self.cmap_dim))
        return x


@dataclasses.dataclass(frozen=True)
class DiscriminatorConfig:
    c_dim: int = 25
    img_resolution: int = 512
    img_channels: int = 6  # RGB ++ upsampled raw render; 25 adds the semantic mask
    channel_base: int = 32768
    channel_max: int = 512
    cmap_dim: Optional[int] = None
    mapping_num_layers: int = 8  # conditioning-mapping depth (networks.py:1487)
    dtype: str = "bfloat16"


@dataclasses.dataclass(frozen=True)
class Discriminator:
    cfg: DiscriminatorConfig

    @property
    def block_resolutions(self):
        import math

        log2 = int(math.log2(self.cfg.img_resolution))
        return tuple(2**i for i in range(log2, 2, -1))

    def _channels(self, res: int) -> int:
        return min(self.cfg.channel_base // res, self.cfg.channel_max)

    @property
    def cmap_dim(self) -> int:
        if self.cfg.c_dim == 0:
            return 0
        return self._channels(4) if self.cfg.cmap_dim is None else self.cfg.cmap_dim

    def _block(self, res: int) -> DiscriminatorBlock:
        return DiscriminatorBlock(
            in_channels=self._channels(res) if res < self.cfg.img_resolution else 0,
            tmp_channels=self._channels(res),
            out_channels=self._channels(res // 2),
            resolution=res,
            img_channels=self.cfg.img_channels,
            dtype=self.cfg.dtype,
        )

    def _mapping(self) -> Optional[MappingNetwork]:
        if self.cfg.c_dim == 0:
            return None
        return MappingNetwork(
            z_dim=0, c_dim=self.cfg.c_dim, w_dim=self.cmap_dim, num_ws=None,
            w_avg_beta=None, num_layers=self.cfg.mapping_num_layers,
        )

    def _epilogue(self) -> DiscriminatorEpilogue:
        return DiscriminatorEpilogue(self._channels(4), cmap_dim=self.cmap_dim)

    def init(self, key: jax.Array) -> dict:
        resolutions = self.block_resolutions
        keys = jax.random.split(key, len(resolutions) + 2)
        p = {f"b{res}": self._block(res).init(k) for res, k in zip(resolutions, keys)}
        m = self._mapping()
        if m is not None:
            mp = m.init(keys[-2])
            mp.pop("w_avg", None)
            p["mapping"] = mp
        p["b4"] = self._epilogue().init(keys[-1])
        return p

    def __call__(self, params: dict, img: jax.Array, c: Optional[jax.Array]) -> jax.Array:
        """img: [B, R, R, img_channels] NHWC. Returns logits [B, 1]."""
        x = None
        for res in self.block_resolutions:
            x = self._block(res)(params[f"b{res}"], x, img if res == self.cfg.img_resolution else None)
        cmap = None
        m = self._mapping()
        if m is not None:
            mparams = dict(params["mapping"])
            mparams.setdefault("w_avg", jnp.zeros((self.cmap_dim,), jnp.float32))
            cmap = m(mparams, None, c, broadcast=False)
        return self._epilogue()(params["b4"], x, cmap)
