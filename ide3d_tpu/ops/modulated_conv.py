"""Style-modulated convolution, the core StyleGAN2 op, redesigned for the MXU.

Reference contract: `modulated_conv2d` at inversion/networks.py:55-130. The reference
"fused" path materialises per-sample weights and runs a grouped convolution with
`groups=batch` — a CUDA-friendly trick that is hostile to the TPU MXU (it fragments
one big matmul into `batch` small ones and materialises a [B,O,I,k,k] tensor).

TPU design: we always use the mathematically-identical input/output-scaling form
(the reference's own `fused_modconv=False` branch, used by it during training):

    y = conv(x * styles, W) * dcoefs (+ noise)

with the demodulation coefficients computed WITHOUT materialising per-sample weights:

    dcoef[b,o] = rsqrt( sum_i styles[b,i]^2 * wsq[i,o] + eps ),
    wsq[i,o]   = sum_{kh,kw} W[kh,kw,i,o]^2

i.e. one [B,I]x[I,O] matmul. The convolution stays a single batched NHWC conv that
XLA tiles straight onto the systolic array; the pre/post scales fuse into its
prologue/epilogue.

bf16 note: the reference pre-normalises weights/styles for fp16 overflow
(inversion/networks.py:77-80). bf16 has fp32's exponent range, so no
pre-normalisation is needed on TPU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .conv2d_resample import conv2d_resample


def modulated_conv2d(
    x: jax.Array,  # [B, H, W, I] activations (NHWC)
    weight: jax.Array,  # [kh, kw, I, O] weight (HWIO)
    styles: jax.Array,  # [B, I] per-sample modulation
    noise: Optional[jax.Array] = None,  # broadcastable to the output, added at the end
    up: int = 1,
    down: int = 1,
    padding: int = 0,
    resample_filter: Optional[np.ndarray] = None,
    demodulate: bool = True,
    flip_weight: bool = True,
) -> jax.Array:
    """Modulated conv2d (contract: inversion/networks.py:55); NHWC/HWIO layouts."""
    assert x.ndim == 4 and weight.ndim == 4 and styles.ndim == 2
    in_channels = x.shape[-1]
    assert weight.shape[2] == in_channels and styles.shape[1] == in_channels

    dtype = x.dtype
    s = styles.astype(dtype)[:, None, None, :]
    x = x * s
    x = conv2d_resample(
        x,
        weight,
        f=resample_filter,
        up=up,
        down=down,
        padding=padding,
        flip_weight=flip_weight,
    )

    if demodulate:
        # dcoef via one small matmul in fp32 for stability.
        w32 = weight.astype(jnp.float32)
        wsq = jnp.sum(jnp.square(w32), axis=(0, 1))  # [I, O]
        ssq = jnp.square(styles.astype(jnp.float32))  # [B, I]
        denom = ssq @ wsq + 1e-8  # [B, O]
        dcoefs = jax.lax.rsqrt(denom).astype(dtype)
        x = x * dcoefs[:, None, None, :]

    if noise is not None:
        x = x + noise.astype(dtype)
    return x
