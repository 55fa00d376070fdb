"""Fused bias + activation (+ gain + clamp).

TPU-native replacement for the reference CUDA op `bias_act`
(reference: torch_utils/ops/bias_act.{cu,cpp,py}; spec table at bias_act.py:25-33,
wrapper contract at bias_act.py:52-123).

On TPU there is no reason for a hand-written elementwise kernel here: XLA fuses the
bias-add, activation, gain and clamp into the producing matmul/conv epilogue. What we
keep from the reference is the *semantics* — the activation registry with per-activation
default gains (StyleGAN2's sqrt(2) lrelu gain etc.) and the add-bias -> act -> gain ->
clamp order, which the whole layer family depends on.

Layout note: this framework is channels-last (NHWC); the bias axis defaults to -1.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ActivationSpec:
    func: Callable
    def_alpha: float
    def_gain: float


activation_funcs: dict[str, ActivationSpec] = {
    "linear": ActivationSpec(lambda x, alpha: x, 0.0, 1.0),
    "relu": ActivationSpec(lambda x, alpha: jax.nn.relu(x), 0.0, math.sqrt(2.0)),
    "lrelu": ActivationSpec(
        lambda x, alpha: jax.nn.leaky_relu(x, negative_slope=alpha), 0.2, math.sqrt(2.0)
    ),
    "tanh": ActivationSpec(lambda x, alpha: jnp.tanh(x), 0.0, 1.0),
    "sigmoid": ActivationSpec(lambda x, alpha: jax.nn.sigmoid(x), 0.0, 1.0),
    "elu": ActivationSpec(lambda x, alpha: jax.nn.elu(x), 0.0, 1.0),
    "selu": ActivationSpec(lambda x, alpha: jax.nn.selu(x), 0.0, 1.0),
    "softplus": ActivationSpec(lambda x, alpha: jax.nn.softplus(x), 0.0, 1.0),
    "swish": ActivationSpec(lambda x, alpha: jax.nn.sigmoid(x) * x, 0.0, math.sqrt(2.0)),
}


def bias_act(
    x: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    axis: int = -1,
    act: str = "linear",
    alpha: Optional[float] = None,
    gain: Optional[float] = None,
    clamp: Optional[float] = None,
) -> jax.Array:
    """Add bias `b` along `axis`, apply activation `act`, scale by `gain`, clamp.

    Mirrors the reference contract (torch_utils/ops/bias_act.py:52): each step is
    optional; `gain`/`alpha` default to the activation's spec values; `clamp=None`
    disables clamping. Output has the dtype of `x` (computation stays in x.dtype —
    the callers pre-cast to bf16/fp32 as the block policy dictates).
    """
    spec = activation_funcs[act]
    alpha = float(spec.def_alpha if alpha is None else alpha)
    gain = float(spec.def_gain if gain is None else gain)

    if b is not None:
        if b.ndim != 1:
            raise ValueError(f"bias must be 1-D, got shape {b.shape}")
        ax = axis % x.ndim
        if b.shape[0] != x.shape[ax]:
            raise ValueError(f"bias dim {b.shape[0]} != x.shape[{ax}] = {x.shape[ax]}")
        shape = [1] * x.ndim
        shape[ax] = -1
        x = x + b.astype(x.dtype).reshape(shape)

    x = spec.func(x, alpha)
    if gain != 1.0:
        x = x * jnp.asarray(gain, dtype=x.dtype)
    if clamp is not None:
        if clamp < 0:
            raise ValueError("clamp must be non-negative")
        x = jnp.clip(x, -clamp, clamp)
    return x
