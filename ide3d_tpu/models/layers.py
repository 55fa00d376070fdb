"""Base layer family (StyleGAN2 conventions), functional-pytree style.

Every module is a frozen dataclass of static hyperparameters with
  init(key) -> params        (a flat dict of jnp arrays)
  __call__(params, x, ...)   (pure function, jit/pjit/vmap friendly)

Reference contracts: FullyConnectedLayer (inversion/networks.py:136-165),
Conv2dLayer (:169-226), SynthesisLayer (:330-514, 'default' upsample mode — the one
the shipped model family uses), ToRGBLayer (:669-713). Equalized learning rate is
preserved exactly: parameters are stored unit-variance and scaled by static gains at
call time.

Layouts: activations NHWC, conv weights HWIO, FC weights [in, out].
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.bias_act import activation_funcs, bias_act
from ..ops.modulated_conv import modulated_conv2d
from ..ops.conv2d_resample import conv2d_resample
from ..ops.upfirdn2d import setup_filter


DEFAULT_RESAMPLE_FILTER = (1, 3, 3, 1)


@dataclasses.dataclass(frozen=True)
class FullyConnectedLayer:
    in_features: int
    out_features: int
    bias: bool = True
    activation: str = "linear"
    lr_multiplier: float = 1.0
    bias_init: float = 0.0

    def init(self, key: jax.Array) -> dict:
        p = {
            "weight": jax.random.normal(
                key, (self.in_features, self.out_features), dtype=jnp.float32
            )
            / self.lr_multiplier
        }
        if self.bias:
            p["bias"] = jnp.full((self.out_features,), float(self.bias_init), jnp.float32)
        return p

    def __call__(self, params: dict, x: jax.Array) -> jax.Array:
        gain = self.lr_multiplier / np.sqrt(self.in_features)
        w = params["weight"].astype(x.dtype) * jnp.asarray(gain, x.dtype)
        x = x @ w
        b = params.get("bias")
        if b is not None and self.lr_multiplier != 1:
            b = b * self.lr_multiplier
        return bias_act(x, None if b is None else b.astype(x.dtype), act=self.activation)


@dataclasses.dataclass(frozen=True)
class Conv2dLayer:
    in_channels: int
    out_channels: int
    kernel_size: int
    bias: bool = True
    activation: str = "linear"
    up: int = 1
    down: int = 1
    resample_filter: tuple = DEFAULT_RESAMPLE_FILTER
    conv_clamp: Optional[float] = None

    def init(self, key: jax.Array) -> dict:
        p = {
            "weight": jax.random.normal(
                key,
                (self.kernel_size, self.kernel_size, self.in_channels, self.out_channels),
                dtype=jnp.float32,
            )
        }
        if self.bias:
            p["bias"] = jnp.zeros((self.out_channels,), jnp.float32)
        return p

    def __call__(self, params: dict, x: jax.Array, gain: float = 1.0) -> jax.Array:
        weight_gain = 1.0 / np.sqrt(self.in_channels * self.kernel_size**2)
        w = params["weight"].astype(x.dtype) * jnp.asarray(weight_gain, x.dtype)
        f = setup_filter(self.resample_filter) if (self.up > 1 or self.down > 1) else None
        x = conv2d_resample(
            x,
            w,
            f=f,
            up=self.up,
            down=self.down,
            padding=self.kernel_size // 2,
            flip_weight=(self.up == 1),
        )
        act_gain = activation_funcs[self.activation].def_gain * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        b = params.get("bias")
        return bias_act(
            x,
            None if b is None else b.astype(x.dtype),
            act=self.activation,
            gain=act_gain,
            clamp=act_clamp,
        )


@dataclasses.dataclass(frozen=True)
class SynthesisLayer:
    """Modulated conv + noise + bias/act (contract: inversion/networks.py:330-514,
    upsample_mode='default'). The style affine is part of the layer."""

    in_channels: int
    out_channels: int
    w_dim: int
    resolution: int  # output resolution of this layer
    kernel_size: int = 3
    up: int = 1
    use_noise: bool = True
    activation: str = "lrelu"
    resample_filter: tuple = DEFAULT_RESAMPLE_FILTER
    conv_clamp: Optional[float] = 256.0

    def init(self, key: jax.Array) -> dict:
        k_w, k_a, k_n = jax.random.split(key, 3)
        affine = self.affine_layer()
        p = {
            "weight": jax.random.normal(
                k_w,
                (self.kernel_size, self.kernel_size, self.in_channels, self.out_channels),
                dtype=jnp.float32,
            ),
            "bias": jnp.zeros((self.out_channels,), jnp.float32),
            "affine": affine.init(k_a),
        }
        if self.use_noise:
            p["noise_const"] = jax.random.normal(
                k_n, (self.resolution, self.resolution), dtype=jnp.float32
            )
            p["noise_strength"] = jnp.zeros((), jnp.float32)
        return p

    def affine_layer(self) -> FullyConnectedLayer:
        return FullyConnectedLayer(self.w_dim, self.in_channels, bias_init=1.0)

    def __call__(
        self,
        params: dict,
        x: jax.Array,
        w: jax.Array,  # [B, w_dim]
        noise_mode: str = "const",  # 'random' | 'const' | 'none'
        noise_key: Optional[jax.Array] = None,
        gain: float = 1.0,
    ) -> jax.Array:
        assert noise_mode in ("random", "const", "none")
        styles = self.affine_layer()(params["affine"], w.astype(jnp.float32))

        noise = None
        if self.use_noise and noise_mode != "none":
            if noise_mode == "random":
                assert noise_key is not None, "noise_mode='random' needs a PRNG key"
                noise = (
                    jax.random.normal(
                        noise_key, (x.shape[0], self.resolution, self.resolution, 1)
                    )
                    * params["noise_strength"]
                )
            else:
                noise = (params["noise_const"] * params["noise_strength"])[None, :, :, None]

        weight_gain = 1.0  # StyleGAN2 modulated conv uses unit weight gain (demod normalizes)
        w_conv = params["weight"].astype(x.dtype) * jnp.asarray(weight_gain, x.dtype)
        f = setup_filter(self.resample_filter) if self.up > 1 else None
        x = modulated_conv2d(
            x,
            w_conv,
            styles,
            noise=noise,
            up=self.up,
            padding=self.kernel_size // 2,
            resample_filter=f,
            flip_weight=(self.up == 1),
        )

        act_gain = activation_funcs[self.activation].def_gain * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(
            x, params["bias"].astype(x.dtype), act=self.activation, gain=act_gain, clamp=act_clamp
        )


@dataclasses.dataclass(frozen=True)
class ToRGBLayer:
    """Style-modulated 1x1 projection without demodulation
    (contract: inversion/networks.py:669-713)."""

    in_channels: int
    out_channels: int
    w_dim: int
    kernel_size: int = 1
    conv_clamp: Optional[float] = 256.0

    def init(self, key: jax.Array) -> dict:
        k_w, k_a = jax.random.split(key)
        return {
            "weight": jax.random.normal(
                k_w,
                (self.kernel_size, self.kernel_size, self.in_channels, self.out_channels),
                dtype=jnp.float32,
            ),
            "bias": jnp.zeros((self.out_channels,), jnp.float32),
            "affine": self.affine_layer().init(k_a),
        }

    def affine_layer(self) -> FullyConnectedLayer:
        return FullyConnectedLayer(self.w_dim, self.in_channels, bias_init=1.0)

    def __call__(self, params: dict, x: jax.Array, w: jax.Array) -> jax.Array:
        weight_gain = 1.0 / np.sqrt(self.in_channels * self.kernel_size**2)
        styles = self.affine_layer()(params["affine"], w.astype(jnp.float32)) * weight_gain
        x = modulated_conv2d(
            x, params["weight"].astype(x.dtype), styles, demodulate=False, padding=self.kernel_size // 2
        )
        return bias_act(x, params["bias"].astype(x.dtype), clamp=self.conv_clamp)
