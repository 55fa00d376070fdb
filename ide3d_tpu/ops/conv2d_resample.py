"""2D convolution with optional FIR up/downsampling (NHWC / HWIO).

TPU-native equivalent of the reference `conv2d_resample`
(reference: torch_utils/ops/conv2d_resample.py:46-143). The reference dispatches
between five CUDA fast paths; on TPU we keep only the algebra that matters and let
XLA choose the schedule:

  * up==down==1  -> one `lax.conv_general_dilated` with symmetric padding,
  * up>1         -> zero-insert + FIR via `upfirdn2d` (single dilated depthwise conv,
                    gain up^2), then the main conv — mathematically identical to the
                    reference's transpose-conv+FIR ordering because all stages are LTI,
  * down>1       -> FIR low-pass via `upfirdn2d`, then a strided conv.

Weights are HWIO `[kh, kw, in, out]` (native layout for NHWC convs on the MXU).
`flip_weight=True` means correlation (the default throughout StyleGAN2);
`flip_weight=False` flips the kernel spatially (true convolution).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .upfirdn2d import _parse_padding, get_filter_size, upfirdn2d


def _conv2d(
    x: jax.Array,
    w: jax.Array,
    *,
    stride: int = 1,
    padding=((0, 0), (0, 0)),
    groups: int = 1,
    flip_weight: bool = True,
) -> jax.Array:
    if not flip_weight:
        w = w[::-1, ::-1]
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=x.dtype,
    )


def conv2d_resample(
    x: jax.Array,
    w: jax.Array,
    f: Optional[np.ndarray] = None,
    up: int = 1,
    down: int = 1,
    padding=0,
    groups: int = 1,
    flip_weight: bool = True,
    flip_filter: bool = False,
) -> jax.Array:
    """Convolve NHWC `x` with HWIO `w`, resampling by `up`/`down` with FIR `f`.

    Padding is specified w.r.t. the upsampled image, exactly as in the reference
    (torch_utils/ops/conv2d_resample.py:60-67).
    """
    assert x.ndim == 4 and w.ndim == 4
    kh, kw = int(w.shape[0]), int(w.shape[1])
    fw, fh = get_filter_size(f)
    px0, px1, py0, py1 = _parse_padding(padding)

    # Adjust padding to account for up/downsampling (conv2d_resample.py:83-93).
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    # Fast path: plain convolution.
    if up == 1 and down == 1:
        return _conv2d(
            x, w, padding=((py0, py1), (px0, px1)), groups=groups, flip_weight=flip_weight
        )

    # Downsampling: FIR low-pass, then strided conv.
    if down > 1 and up == 1:
        x = upfirdn2d(x, f, padding=(px0, px1, py0, py1), flip_filter=flip_filter)
        return _conv2d(x, w, stride=down, groups=groups, flip_weight=flip_weight)

    # Upsampling (optionally followed by downsampling): zero-insert + FIR in one
    # dilated depthwise conv, then the main conv.
    x = upfirdn2d(
        x,
        f if up > 1 else None,
        up=up,
        padding=(px0, px1, py0, py1),
        gain=up**2,
        flip_filter=flip_filter,
    )
    x = _conv2d(x, w, groups=groups, flip_weight=flip_weight)
    if down > 1:
        x = upfirdn2d(x, f, down=down, flip_filter=flip_filter)
    return x
