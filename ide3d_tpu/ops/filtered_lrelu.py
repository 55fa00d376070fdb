"""Filtered leaky ReLU (StyleGAN3 alias-free nonlinearity).

TPU-native equivalent of the reference CUDA op `filtered_lrelu`
(reference: torch_utils/ops/filtered_lrelu.{cu,cpp,py}; semantics at
filtered_lrelu.py:56-155): bias -> FIR upsample (gain up^2) -> leaky ReLU
(+gain+clamp) -> FIR downsample.

Both FIR stages compile to single depthwise convolutions (see upfirdn2d.py); the
bias/lrelu/clamp in between fuse into their epilogues under XLA, so the whole op is
two conv HLOs — no custom kernel needed. Only the SG3 layer variant of the network
family uses this (inversion/networks.py:519); the shipped FFHQ generator is SG2-style.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import numpy as np

from .bias_act import bias_act
from .upfirdn2d import upfirdn2d


def filtered_lrelu(
    x: jax.Array,  # [N, H, W, C]
    fu: Optional[np.ndarray] = None,
    fd: Optional[np.ndarray] = None,
    b: Optional[jax.Array] = None,
    up: int = 1,
    down: int = 1,
    padding=0,
    gain: float = math.sqrt(2.0),
    slope: float = 0.2,
    clamp: Optional[float] = None,
    flip_filter: bool = False,
) -> jax.Array:
    assert x.ndim == 4
    x = bias_act(x, b)
    x = upfirdn2d(x, fu, up=up, padding=padding, gain=up**2, flip_filter=flip_filter)
    x = bias_act(x, act="lrelu", alpha=slope, gain=gain, clamp=clamp)
    x = upfirdn2d(x, fd, down=down, flip_filter=flip_filter)
    return x
