"""VolumeGAN-style 3D feature volume (the hybrid tri-plane/voxel representation).

Reference: inversion/networks.py:1853-1917 (FeatureVolume) + InstanceNormLayer3d
(:1827-1850) + the conv3d helper (:44-50). IDE-3D's paper describes a hybrid
tri-plane/voxel NeRF representation; the repo-visible FeatureVolume is the voxel
branch: a learned 4^3 constant upsampled through 3D convs with per-stage
(scale, shift) modulation from a latent mapping.

TPU notes: volumes are channels-last [B, D, H, W, C]; 3D convs via
`lax.conv_general_dilated` with NDHWC/DHWIO dimension numbers; trilinear
upsampling via jax.image.resize (align_corners semantics are irrelevant for the
x2 const-volume growth here). Sampling the result uses ops.grid_sample_3d.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .layers import FullyConnectedLayer


def conv3d(x: jax.Array, w: jax.Array, padding="SAME") -> jax.Array:
    """x [B, D, H, W, Cin], w [kd, kh, kw, Cin, Cout]."""
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype,
    )


def instance_norm_3d(x: jax.Array, scale=None, shift=None, eps: float = 1e-8) -> jax.Array:
    """Contract: networks.py:1839-1850 (normalize over spatial dims)."""
    x = x - x.mean(axis=(1, 2, 3), keepdims=True)
    x = x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=(1, 2, 3), keepdims=True) + eps)
    if scale is not None:
        x = x * scale[:, None, None, None, :] + shift[:, None, None, None, :]
    return x


@dataclasses.dataclass(frozen=True)
class FeatureVolume:
    """Learned const volume -> 3D conv pyramid with latent-modulated instance norm
    (contract: networks.py:1853-1917)."""

    feat_res: int = 32
    init_res: int = 4
    base_channels: int = 256
    output_channels: int = 32
    z_dim: int = 256
    use_mapping: bool = True

    @property
    def num_stages(self) -> int:
        return int(np.log2(self.feat_res // self.init_res)) + 1

    def stage_channels(self) -> list:
        chans, inp, out = [], self.base_channels, self.base_channels
        for i in range(self.num_stages):
            chans.append(out)
            inp = out
            out = max(out // 2, self.output_channels)
            if i == self.num_stages - 2:
                out = self.output_channels
        return chans

    def _mapping(self) -> FullyConnectedLayer:
        return FullyConnectedLayer(self.z_dim, 2 * sum(self.stage_channels()))

    def init(self, key: jax.Array) -> dict:
        chans = self.stage_channels()
        keys = jax.random.split(key, self.num_stages + 1)
        p = {
            "const": jnp.ones(
                (1, self.init_res, self.init_res, self.init_res, self.base_channels)
            )
        }
        in_ch = self.base_channels
        for i, out_ch in enumerate(chans):
            p[f"layer{i}"] = {
                "weight": jax.random.normal(keys[i], (3, 3, 3, in_ch, out_ch))
                * (1.0 / np.sqrt(in_ch * 27)),
                "bias": jnp.zeros((out_ch,)),
            }
            in_ch = out_ch
        if self.use_mapping:
            p["mapping"] = self._mapping().init(keys[-1])
        return p

    def __call__(self, params: dict, z: jax.Array) -> jax.Array:
        """z [B, z_dim] -> volume [B, feat_res, feat_res, feat_res, C_last]."""
        B = z.shape[0]
        chans = self.stage_channels()
        scales = shifts = None
        if self.use_mapping:
            mod = self._mapping()(params["mapping"], z)
            scales, shifts = jnp.split(mod, 2, axis=-1)

        x = jnp.broadcast_to(params["const"], (B,) + params["const"].shape[1:])
        off = 0
        for i, out_ch in enumerate(chans):
            if i != 0:
                B_, D, H, W, C = x.shape
                x = jax.image.resize(x, (B_, D * 2, H * 2, W * 2, C), "trilinear")
            p = params[f"layer{i}"]
            x = conv3d(x, p["weight"]) + p["bias"]
            if self.use_mapping:
                sc = scales[:, off : off + out_ch]
                sh = shifts[:, off : off + out_ch]
                x = instance_norm_3d(x, sc, sh)
            else:
                x = instance_norm_3d(x, jnp.ones((B, out_ch)), jnp.zeros((B, out_ch)))
            x = jax.nn.leaky_relu(x, 0.2)
            off += out_ch
        return x
