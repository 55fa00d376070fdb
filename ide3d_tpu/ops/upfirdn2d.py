"""Pad -> upsample -> FIR filter -> downsample, fused into one XLA convolution.

TPU-native replacement for the reference CUDA op `upfirdn2d`
(reference: torch_utils/ops/upfirdn2d.{cu,cpp,py}; semantics documented at
upfirdn2d.py:118-166, reference impl at upfirdn2d.py:167-208, wrappers
setup_filter/filter2d/upsample2d/downsample2d at upfirdn2d.py:70,277,313,352).

Design: the whole pipeline (zero-insertion upsample, asymmetric pad/crop, FIR
convolution, strided downsample) is expressed as a single depthwise
`lax.conv_general_dilated` call — `lhs_dilation` performs the zero-insertion,
explicit (possibly negative) padding performs pad/crop, `window_strides` performs
the downsample. XLA lowers depthwise convs onto the VPU with the channel axis on
the 128-lane dimension (we run NHWC throughout). Separable filters use two 1-D
passes, halving FLOPs for the large Kaiser filters of the alias-free layers.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

FilterArg = Union[None, Sequence[float], np.ndarray]


def _parse_scaling(scaling) -> tuple[int, int]:
    if isinstance(scaling, int):
        scaling = [scaling, scaling]
    sx, sy = scaling
    assert sx >= 1 and sy >= 1
    return int(sx), int(sy)


def _parse_padding(padding) -> tuple[int, int, int, int]:
    if isinstance(padding, int):
        padding = [padding, padding]
    padding = list(padding)
    if len(padding) == 2:
        padx, pady = padding
        padding = [padx, padx, pady, pady]
    px0, px1, py0, py1 = padding
    return int(px0), int(px1), int(py0), int(py1)


def setup_filter(
    f: FilterArg,
    normalize: bool = True,
    flip_filter: bool = False,
    gain: float = 1.0,
    separable: Optional[bool] = None,
) -> np.ndarray:
    """Prepare a FIR filter for `upfirdn2d` (contract: torch_utils/ops/upfirdn2d.py:70).

    Returns a float32 numpy array: `[taps]` if separable else `[fh, fw]`.
    Filters are static network constants, so they live host-side as numpy and get
    baked into the jitted program.
    """
    if f is None:
        f = 1
    f = np.asarray(f, dtype=np.float32)
    assert f.ndim in (0, 1, 2) and f.size > 0
    if f.ndim == 0:
        f = f[np.newaxis]
    if separable is None:
        separable = f.ndim == 1 and f.size >= 8
    if f.ndim == 1 and not separable:
        f = np.outer(f, f)
    assert f.ndim == (1 if separable else 2)
    if normalize:
        f = f / f.sum()
    if flip_filter:
        f = f[::-1] if f.ndim == 1 else f[::-1, ::-1]
    f = f * (gain ** (f.ndim / 2))
    return np.ascontiguousarray(f)


def get_filter_size(f: FilterArg) -> tuple[int, int]:
    if f is None:
        return 1, 1
    f = np.asarray(f)
    if f.ndim == 1:
        return int(f.shape[0]), int(f.shape[0])
    return int(f.shape[1]), int(f.shape[0])


def _depthwise_conv(
    x: jax.Array,
    fker: np.ndarray,  # [fh, fw]
    *,
    lhs_dilation: tuple[int, int],
    padding: tuple[tuple[int, int], tuple[int, int]],
    strides: tuple[int, int],
) -> jax.Array:
    """One depthwise NHWC conv carrying the up/pad/filter/down pipeline."""
    n, h, w, c = x.shape
    kernel = jnp.asarray(fker, dtype=x.dtype)[:, :, None, None]
    kernel = jnp.broadcast_to(kernel, (fker.shape[0], fker.shape[1], 1, c))
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=strides,
        padding=padding,
        lhs_dilation=lhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=x.dtype,
    )


def upfirdn2d(
    x: jax.Array,
    f: FilterArg,
    up=1,
    down=1,
    padding=0,
    flip_filter: bool = False,
    gain: float = 1.0,
) -> jax.Array:
    """Pad, upsample, FIR-filter and downsample a batch of NHWC images.

    Same contract as the reference (torch_utils/ops/upfirdn2d.py:118) except the
    data layout is `[N, H, W, C]` (channels-last, TPU-native):
      1. zero-insertion upsample by `up`,
      2. pad (negative = crop) by `padding` w.r.t. the upsampled image,
      3. convolve with FIR filter `f` (flip_filter=False means true convolution),
      4. keep every `down`-th pixel.
    """
    return _upfirdn2d_impl(
        x,
        None if f is None else np.asarray(f, dtype=np.float32),
        up=_parse_scaling(up),
        down=_parse_scaling(down),
        padding=_parse_padding(padding),
        flip_filter=flip_filter,
        gain=float(gain),
    )


def _upfirdn2d_impl(x, f, *, up, down, padding, flip_filter, gain):
    assert x.ndim == 4, f"expected NHWC input, got shape {x.shape}"
    upx, upy = up
    downx, downy = down
    px0, px1, py0, py1 = padding

    if f is None:
        f = np.ones((1, 1), dtype=np.float32)
    assert f.ndim in (1, 2)
    separable = f.ndim == 1

    f = f * (gain ** (f.ndim / 2))
    if not flip_filter:
        f = f[::-1] if separable else f[::-1, ::-1]
    f = np.ascontiguousarray(f, dtype=np.float32)

    # lhs_dilation yields (in-1)*up+1 samples — the reference zero-insertion yields
    # in*up (with up-1 trailing zeros). Compensate by adding up-1 to the trailing pad.
    pad_y = (py0, py1 + upy - 1)
    pad_x = (px0, px1 + upx - 1)

    if separable:
        # Vertical pass: upsample+pad+filter+downsample along H only.
        x = _depthwise_conv(
            x,
            f[:, None],
            lhs_dilation=(upy, 1),
            padding=(pad_y, (0, 0)),
            strides=(downy, 1),
        )
        # Horizontal pass.
        x = _depthwise_conv(
            x,
            f[None, :],
            lhs_dilation=(1, upx),
            padding=((0, 0), pad_x),
            strides=(1, downx),
        )
        return x

    return _depthwise_conv(
        x,
        f,
        lhs_dilation=(upy, upx),
        padding=(pad_y, pad_x),
        strides=(downy, downx),
    )


def filter2d(x: jax.Array, f: FilterArg, padding=0, flip_filter=False, gain=1.0) -> jax.Array:
    """Same-size FIR filtering (contract: torch_utils/ops/upfirdn2d.py:277)."""
    px0, px1, py0, py1 = _parse_padding(padding)
    fw, fh = get_filter_size(f)
    p = (px0 + fw // 2, px1 + (fw - 1) // 2, py0 + fh // 2, py1 + (fh - 1) // 2)
    return upfirdn2d(x, f, padding=p, flip_filter=flip_filter, gain=gain)


def upsample2d(x: jax.Array, f: FilterArg, up=2, padding=0, flip_filter=False, gain=1.0) -> jax.Array:
    """FIR upsample by `up` (contract: torch_utils/ops/upfirdn2d.py:313)."""
    upx, upy = _parse_scaling(up)
    px0, px1, py0, py1 = _parse_padding(padding)
    fw, fh = get_filter_size(f)
    p = (
        px0 + (fw + upx - 1) // 2,
        px1 + (fw - upx) // 2,
        py0 + (fh + upy - 1) // 2,
        py1 + (fh - upy) // 2,
    )
    return upfirdn2d(x, f, up=up, padding=p, flip_filter=flip_filter, gain=gain * upx * upy)


def downsample2d(x: jax.Array, f: FilterArg, down=2, padding=0, flip_filter=False, gain=1.0) -> jax.Array:
    """FIR downsample by `down` (contract: torch_utils/ops/upfirdn2d.py:352)."""
    downx, downy = _parse_scaling(down)
    px0, px1, py0, py1 = _parse_padding(padding)
    fw, fh = get_filter_size(f)
    p = (
        px0 + (fw - downx + 1) // 2,
        px1 + (fw - downx) // 2,
        py0 + (fh - downy + 1) // 2,
        py1 + (fh - downy) // 2,
    )
    return upfirdn2d(x, f, down=down, padding=p, flip_filter=flip_filter, gain=gain)
