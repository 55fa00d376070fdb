"""StyleGAN3 alias-free synthesis layer (the reference's SynthesisLayer3 family).

Reference: inversion/networks.py:519-665 — modulated 1x1/3x3 conv followed by the
fused upsample -> bias -> leaky-ReLU -> downsample (`filtered_lrelu`), with Kaiser
low-pass filters designed per layer from (sampling_rate, cutoff, half_width)
schedules; SynthesisBlock3 at networks.py:863-961 stacks two such layers + ToRGB.
The shipped IDE-3D FFHQ checkpoint uses the SG2-style blocks, so this family
exists for parity/completeness and for alias-free experiments.

Filter design uses scipy.signal.firwin exactly like the reference (:634-655);
filters are static numpy constants baked into the jitted program.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.filtered_lrelu import filtered_lrelu
from ..ops.modulated_conv import modulated_conv2d
from .layers import FullyConnectedLayer


def design_lowpass_filter(
    numtaps: int, cutoff: float, width: float, fs: float, radial: bool = False
) -> Optional[np.ndarray]:
    """Kaiser (or radial jinc) low-pass design (contract: networks.py:634-655)."""
    import scipy.signal

    assert numtaps >= 1
    if numtaps == 1:
        return None
    if not radial:
        f = scipy.signal.firwin(numtaps=numtaps, cutoff=cutoff, width=width, fs=fs)
        return np.asarray(f, np.float32)
    import scipy.special

    x = (np.arange(numtaps) - (numtaps - 1) / 2) / fs
    r = np.hypot(*np.meshgrid(x, x))
    with np.errstate(divide="ignore", invalid="ignore"):
        f = scipy.special.j1(2 * cutoff * (np.pi * r)) / (np.pi * r)
    f[np.isnan(f)] = cutoff * 2  # limit at r=0
    beta = scipy.signal.kaiser_beta(scipy.signal.kaiser_atten(numtaps, width / (fs / 2)))
    w = np.kaiser(numtaps, beta)
    f *= np.outer(w, w)
    f /= np.sum(f)
    return np.asarray(f, np.float32)


@dataclasses.dataclass(frozen=True)
class SynthesisLayer3:
    """Alias-free layer (contract: networks.py:519-632). NHWC."""

    w_dim: int
    is_torgb: bool
    in_channels: int
    out_channels: int
    in_size: int
    out_size: int
    in_sampling_rate: float
    out_sampling_rate: float
    in_cutoff: float
    out_cutoff: float
    in_half_width: float
    out_half_width: float
    kernel_size: int = 3
    filter_size: int = 6
    lrelu_upsampling: int = 2
    use_radial_filters: bool = False
    conv_clamp: Optional[float] = 256.0

    @property
    def conv_kernel(self) -> int:
        return 1 if self.is_torgb else self.kernel_size

    @property
    def tmp_sampling_rate(self) -> float:
        return max(self.in_sampling_rate, self.out_sampling_rate) * (
            1 if self.is_torgb else self.lrelu_upsampling
        )

    def _filters(self):
        up_factor = int(np.rint(self.tmp_sampling_rate / self.in_sampling_rate))
        up_taps = self.filter_size * up_factor if up_factor > 1 and not self.is_torgb else 1
        up_filter = design_lowpass_filter(
            up_taps, self.in_cutoff, self.in_half_width * 2, self.tmp_sampling_rate
        )
        down_factor = int(np.rint(self.tmp_sampling_rate / self.out_sampling_rate))
        down_taps = self.filter_size * down_factor if down_factor > 1 and not self.is_torgb else 1
        down_filter = design_lowpass_filter(
            down_taps, self.out_cutoff, self.out_half_width * 2, self.tmp_sampling_rate,
            radial=self.use_radial_filters,
        )
        # padding w.r.t. the upsampled image (networks.py:591-597)
        pad_total = (self.out_size - 1) * down_factor + 1
        pad_total -= (self.in_size + self.conv_kernel - 1) * up_factor
        pad_total += up_taps + down_taps - 2
        pad_lo = (pad_total + up_factor) // 2
        pad_hi = pad_total - pad_lo
        return up_factor, up_filter, down_factor, down_filter, (pad_lo, pad_hi, pad_lo, pad_hi)

    def init(self, key: jax.Array) -> dict:
        k_w, k_a = jax.random.split(key)
        return {
            "weight": jax.random.normal(
                k_w, (self.conv_kernel, self.conv_kernel, self.in_channels, self.out_channels)
            ),
            "bias": jnp.zeros((self.out_channels,)),
            "affine": FullyConnectedLayer(self.w_dim, self.in_channels, bias_init=1.0).init(k_a),
            "magnitude_ema": jnp.ones(()),
        }

    def __call__(self, params: dict, x: jax.Array, w: jax.Array) -> jax.Array:
        affine = FullyConnectedLayer(self.w_dim, self.in_channels, bias_init=1.0)
        styles = affine(params["affine"], w.astype(jnp.float32))
        if self.is_torgb:
            styles = styles * (1.0 / np.sqrt(self.in_channels * self.conv_kernel**2))

        input_gain = jax.lax.rsqrt(params["magnitude_ema"])
        x = x * input_gain.astype(x.dtype)

        x = modulated_conv2d(
            x, params["weight"].astype(x.dtype), styles,
            padding=self.conv_kernel - 1, demodulate=not self.is_torgb,
        )

        up_factor, fu, down_factor, fd, padding = self._filters()
        gain = 1.0 if self.is_torgb else np.sqrt(2.0)
        slope = 1.0 if self.is_torgb else 0.2
        return filtered_lrelu(
            x, fu, fd, params["bias"].astype(x.dtype),
            up=up_factor, down=down_factor, padding=padding,
            gain=gain, slope=slope, clamp=self.conv_clamp,
        )

    def update_magnitude_ema(self, params: dict, x: jax.Array, beta: float = 0.999):
        mag = jax.lax.stop_gradient(jnp.mean(jnp.square(x.astype(jnp.float32))))
        return mag + (params["magnitude_ema"] - mag) * beta


def sg3_layer_schedule(
    num_layers: int = 14,
    img_resolution: int = 512,
    first_cutoff: float = 2.0,
    first_stopband: float = 2.0**2.1,
    last_stopband_rel: float = 2.0**0.3,
    margin_size: int = 10,
) -> dict:
    """The StyleGAN3 per-layer (size, sampling_rate, cutoff, half_width) schedule
    (stylegan3 lineage; consumed by SynthesisBlock3, networks.py:885-888)."""
    last_cutoff = img_resolution / 2
    last_stopband = last_cutoff * last_stopband_rel
    exponents = np.minimum(np.arange(num_layers + 1) / (num_layers - 1), 1)
    cutoffs = first_cutoff * (last_cutoff / first_cutoff) ** exponents
    stopbands = first_stopband * (last_stopband / first_stopband) ** exponents
    sampling_rates = np.exp2(np.ceil(np.log2(np.minimum(stopbands * 2, img_resolution))))
    half_widths = np.maximum(stopbands, sampling_rates / 2) - cutoffs
    sizes = sampling_rates + margin_size * 2
    sizes[-2:] = img_resolution
    return {
        "sizes": sizes, "sampling_rates": sampling_rates,
        "cutoffs": cutoffs, "half_widths": half_widths,
    }
