"""LPIPS perceptual distance (VGG16 backbone + learned linear calibration).

Reference dependency: inversion/criteria/lpips/ (≈190 LoC torch) used by PTI
tuning (base_coach.py) and evaluation (apps/calc_losses_on_images.py:19). This is
the standard LPIPS formulation:

    d(x, y) = sum_l  mean_hw || w_l ⊙ (phi_l(x)^ - phi_l(y)^) ||^2

with unit-normalized channel activations phi^ at the 5 VGG16 relu tap points and
per-channel calibration weights w_l. The `lin` weights import from the published
lpips state_dict (keys lin0..lin4.model.1.weight) via io/torch_import; random
init gives an UNCALIBRATED perceptual distance that is still a valid training
signal (used until real weights are provided).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .features import VGG16Features

# channel widths at the 5 LPIPS tap points of VGG16
_TAP_CHANNELS = (64, 128, 256, 512, 512)

# ImageNet normalization baked into the official LPIPS ("scaling layer")
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


@dataclasses.dataclass(frozen=True)
class LPIPS:
    def init(self, key: jax.Array) -> dict:
        kv, kl = jax.random.split(key)
        p = {"vgg": VGG16Features().init(kv)}
        for i, c in enumerate(_TAP_CHANNELS):
            p[f"lin{i}"] = {
                "weight": jnp.abs(jax.random.normal(jax.random.fold_in(kl, i), (c,))) * 0.1
            }
        return p

    def _taps(self, params, x):
        """VGG16 relu taps on LPIPS-normalized input.

        LPIPS convention: v = (x - shift) / scale on [-1,1] inputs, fed to the VGG
        trunk directly. VGG16Features.feature_maps applies (in+1)*127.5 internally
        (the projector's 0..255 convention), so invert that here."""
        vgg = VGG16Features()
        v = (x - jnp.asarray(_SHIFT, x.dtype)) / jnp.asarray(_SCALE, x.dtype)
        return vgg.feature_maps(params["vgg"], v / 127.5 - 1.0)

    def __call__(self, params: dict, x: jax.Array, y: jax.Array) -> jax.Array:
        """x, y [B, H, W, 3] in [-1, 1] -> distances [B]."""
        fx = self._taps(params, x)
        fy = self._taps(params, y)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
            b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
            w = params[f"lin{i}"]["weight"]
            d = jnp.square(a - b) * w[None, None, None, : a.shape[-1]]
            total = total + d.sum(axis=-1).mean(axis=(1, 2))
        return total

    def mean(self, params: dict, x: jax.Array, y: jax.Array) -> jax.Array:
        return jnp.mean(self(params, x, y))
