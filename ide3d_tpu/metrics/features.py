"""Feature extractors for evaluation metrics.

The reference downloads pickled InceptionV3/VGG16 detectors
(metrics/metric_utils.py:42-47); in this framework extractors are explicit modules
with importable torch weights (io/torch_import.py). Every metric is written against
the `FeatureExtractor` protocol so detectors are swappable (and testable with
random weights / trivial extractors in CI).

Provided:
  * `InceptionV3` — torchvision-architecture Inception v3 (the FID detector);
    param tree keys mirror the torch state_dict for mechanical import,
  * `VGG16Features` — conv-stack features (LPIPS/projector backbone,
    inversion/training/projectors/w_plus_projector_ide3d.py:68-76),
  * `pixel_features` — deterministic weightless fallback (downsampled pixels),
    keeps the metric machinery runnable without any pretrained weights.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Protocol

import jax
import jax.numpy as jnp
import numpy as np


class FeatureExtractor(Protocol):
    dim: int

    def __call__(self, params: dict, images: jax.Array) -> jax.Array:
        """images [B, H, W, 3] float in [-1, 1] -> features [B, dim]."""


# ------------------------------------------------------------------------ pixel


@dataclasses.dataclass(frozen=True)
class PixelFeatures:
    """Weightless stand-in detector: area-downsampled grayscale pixels. Only for
    smoke-testing the metric pipeline; NOT comparable with reference scores."""

    res: int = 32

    @property
    def dim(self) -> int:
        return self.res * self.res

    def init(self, key=None) -> dict:
        return {}

    def __call__(self, params: dict, images: jax.Array) -> jax.Array:
        B = images.shape[0]
        gray = images.mean(axis=-1, keepdims=True)
        small = jax.image.resize(gray, (B, self.res, self.res, 1), "linear")
        return small.reshape(B, -1)


pixel_features = PixelFeatures()


# ------------------------------------------------------------------------ VGG16


_VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"]
_VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512, 512, 512, "M",
              512, 512, 512, 512, "M"]


@dataclasses.dataclass(frozen=True)
class VGG16Features:
    """torchvision VGG16 conv features; returns the 4096-d fc1 embedding by default
    or multi-scale conv maps via `feature_maps`. Param keys mirror
    torchvision.models.vgg16().state_dict() ('features.0.weight', ...).
    Set cfg_name='vgg19' for the VGG19 trunk (the encoder-training perceptual
    backbone, apps/train_hybrid_encoder.py:120-152)."""

    dim: int = 4096
    cfg_name: str = "vgg16"

    @property
    def _cfg(self):
        return _VGG19_CFG if self.cfg_name == "vgg19" else _VGG16_CFG

    def init(self, key: jax.Array) -> dict:
        rs = np.random.RandomState(0)
        params = {"features": {}, "classifier": {}}
        in_ch = 3
        idx = 0
        for v in self._cfg:
            if v == "M":
                idx += 1
                continue
            params["features"][str(idx)] = {
                "weight": jnp.asarray(rs.randn(3, 3, in_ch, v).astype(np.float32) * 0.05),
                "bias": jnp.zeros((v,), jnp.float32),
            }
            in_ch = v
            idx += 2  # conv + relu
        params["classifier"]["0"] = {
            "weight": jnp.asarray(rs.randn(512 * 7 * 7, 4096).astype(np.float32) * 0.01),
            "bias": jnp.zeros((4096,), jnp.float32),
        }
        return params

    def feature_maps(self, params: dict, images: jax.Array) -> list:
        """Conv activations after each stage (the LPIPS tap points)."""
        x = (images + 1.0) * 127.5  # VGG expects 0..255-ish after torch normalize;
        # reference projector feeds raw 0..255 into the LPIPS-VGG16 pickle
        # (w_plus_projector_ide3d.py:72-76). Keep that convention.
        taps = []
        in_ch = 3
        idx = 0
        for v in self._cfg:
            if v == "M":
                taps.append(x)
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
                )
                idx += 1
                continue
            p = params["features"][str(idx)]
            x = jax.lax.conv_general_dilated(
                x, p["weight"], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + p["bias"]
            x = jax.nn.relu(x)
            idx += 2
        return taps

    def __call__(self, params: dict, images: jax.Array) -> jax.Array:
        B = images.shape[0]
        if images.shape[1] != 224:
            images = jax.image.resize(images, (B, 224, 224, 3), "linear")
        maps = self.feature_maps(params, images)
        x = maps[-1]
        x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        x = jax.image.resize(x, (B, 7, 7, x.shape[-1]), "linear")
        # NHWC -> torch's NCHW flatten order for weight-import compatibility
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(B, -1)
        p = params["classifier"]["0"]
        return x @ p["weight"] + p["bias"]


# -------------------------------------------------------------------- Inception


def _conv_bn(x, p, stride=1, padding="SAME"):
    x = jax.lax.conv_general_dilated(
        x, p["conv"]["weight"], (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    bn = p["bn"]
    scale = bn["weight"] * jax.lax.rsqrt(bn["running_var"] + 1e-3)
    return jax.nn.relu(x * scale + (bn["bias"] - bn["running_mean"] * scale))


def _pool(x, kind, ks, stride, padding="VALID"):
    if kind == "max":
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, ks, ks, 1), (1, stride, stride, 1), padding
        )
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, ks, ks, 1), (1, stride, stride, 1), padding
    )
    # torch F.avg_pool2d defaults count_include_pad=True (the torchvision
    # Inception branch_pool uses it): divide by the full window size, padding
    # zeros included.
    return s / float(ks * ks)


@dataclasses.dataclass(frozen=True)
class InceptionV3:
    """torchvision InceptionV3 feature trunk -> 2048-d pooled features (the FID
    detector). Param tree keys mirror torchvision.models.inception_v3 state_dict
    module names (Conv2d_1a_3x3, Mixed_5b, ...)."""

    dim: int = 2048

    # ----- random init for tests (real use: io.torch_import.state_dict_to_tree)

    def init(self, key=None) -> dict:
        rs = np.random.RandomState(0)

        def cb(ci, co, kh, kw):
            return {
                "conv": {"weight": jnp.asarray(rs.randn(kh, kw, ci, co).astype(np.float32) * 0.03)},
                "bn": {
                    "weight": jnp.ones((co,), jnp.float32),
                    "bias": jnp.zeros((co,), jnp.float32),
                    "running_mean": jnp.zeros((co,), jnp.float32),
                    "running_var": jnp.ones((co,), jnp.float32),
                },
            }

        p = {
            "Conv2d_1a_3x3": cb(3, 32, 3, 3),
            "Conv2d_2a_3x3": cb(32, 32, 3, 3),
            "Conv2d_2b_3x3": cb(32, 64, 3, 3),
            "Conv2d_3b_1x1": cb(64, 80, 1, 1),
            "Conv2d_4a_3x3": cb(80, 192, 3, 3),
        }

        def mixed_a(name, ci, pool_ch):
            p[name] = {
                "branch1x1": cb(ci, 64, 1, 1),
                "branch5x5_1": cb(ci, 48, 1, 1),
                "branch5x5_2": cb(48, 64, 5, 5),
                "branch3x3dbl_1": cb(ci, 64, 1, 1),
                "branch3x3dbl_2": cb(64, 96, 3, 3),
                "branch3x3dbl_3": cb(96, 96, 3, 3),
                "branch_pool": cb(ci, pool_ch, 1, 1),
            }

        mixed_a("Mixed_5b", 192, 32)
        mixed_a("Mixed_5c", 256, 64)
        mixed_a("Mixed_5d", 288, 64)
        p["Mixed_6a"] = {
            "branch3x3": cb(288, 384, 3, 3),
            "branch3x3dbl_1": cb(288, 64, 1, 1),
            "branch3x3dbl_2": cb(64, 96, 3, 3),
            "branch3x3dbl_3": cb(96, 96, 3, 3),
        }

        def mixed_c(name, c7):
            p[name] = {
                "branch1x1": cb(768, 192, 1, 1),
                "branch7x7_1": cb(768, c7, 1, 1),
                "branch7x7_2": cb(c7, c7, 1, 7),
                "branch7x7_3": cb(c7, 192, 7, 1),
                "branch7x7dbl_1": cb(768, c7, 1, 1),
                "branch7x7dbl_2": cb(c7, c7, 7, 1),
                "branch7x7dbl_3": cb(c7, c7, 1, 7),
                "branch7x7dbl_4": cb(c7, c7, 7, 1),
                "branch7x7dbl_5": cb(c7, 192, 1, 7),
                "branch_pool": cb(768, 192, 1, 1),
            }

        mixed_c("Mixed_6b", 128)
        mixed_c("Mixed_6c", 160)
        mixed_c("Mixed_6d", 160)
        mixed_c("Mixed_6e", 192)
        p["Mixed_7a"] = {
            "branch3x3_1": cb(768, 192, 1, 1),
            "branch3x3_2": cb(192, 320, 3, 3),
            "branch7x7x3_1": cb(768, 192, 1, 1),
            "branch7x7x3_2": cb(192, 192, 1, 7),
            "branch7x7x3_3": cb(192, 192, 7, 1),
            "branch7x7x3_4": cb(192, 192, 3, 3),
        }

        def mixed_e(name, ci):
            p[name] = {
                "branch1x1": cb(ci, 320, 1, 1),
                "branch3x3_1": cb(ci, 384, 1, 1),
                "branch3x3_2a": cb(384, 384, 1, 3),
                "branch3x3_2b": cb(384, 384, 3, 1),
                "branch3x3dbl_1": cb(ci, 448, 1, 1),
                "branch3x3dbl_2": cb(448, 384, 3, 3),
                "branch3x3dbl_3a": cb(384, 384, 1, 3),
                "branch3x3dbl_3b": cb(384, 384, 3, 1),
                "branch_pool": cb(ci, 192, 1, 1),
            }

        mixed_e("Mixed_7b", 1280)
        mixed_e("Mixed_7c", 2048)
        return p

    # --------------------------------------------------------------------- fwd

    def __call__(self, params: dict, images: jax.Array) -> jax.Array:
        B = images.shape[0]
        x = images
        if x.shape[1] != 299:
            x = jax.image.resize(x, (B, 299, 299, 3), "linear")
        # torchvision normalization of [-1,1] inputs is identity here: the FID
        # convention feeds [-1,1] directly (metric_utils convention).
        p = params
        x = _conv_bn(x, p["Conv2d_1a_3x3"], stride=2, padding="VALID")
        x = _conv_bn(x, p["Conv2d_2a_3x3"], padding="VALID")
        x = _conv_bn(x, p["Conv2d_2b_3x3"])
        x = _pool(x, "max", 3, 2)
        x = _conv_bn(x, p["Conv2d_3b_1x1"])
        x = _conv_bn(x, p["Conv2d_4a_3x3"], padding="VALID")
        x = _pool(x, "max", 3, 2)

        def mixed_a(x, q):
            b1 = _conv_bn(x, q["branch1x1"])
            b5 = _conv_bn(_conv_bn(x, q["branch5x5_1"]), q["branch5x5_2"])
            b3 = _conv_bn(
                _conv_bn(_conv_bn(x, q["branch3x3dbl_1"]), q["branch3x3dbl_2"]),
                q["branch3x3dbl_3"],
            )
            bp = _conv_bn(_pool(x, "avg", 3, 1, "SAME"), q["branch_pool"])
            return jnp.concatenate([b1, b5, b3, bp], axis=-1)

        x = mixed_a(x, p["Mixed_5b"])
        x = mixed_a(x, p["Mixed_5c"])
        x = mixed_a(x, p["Mixed_5d"])

        q = p["Mixed_6a"]
        b3 = _conv_bn(x, q["branch3x3"], stride=2, padding="VALID")
        bd = _conv_bn(_conv_bn(x, q["branch3x3dbl_1"]), q["branch3x3dbl_2"])
        bd = _conv_bn(bd, q["branch3x3dbl_3"], stride=2, padding="VALID")
        bp = _pool(x, "max", 3, 2)
        x = jnp.concatenate([b3, bd, bp], axis=-1)

        def mixed_c(x, q):
            b1 = _conv_bn(x, q["branch1x1"])
            b7 = _conv_bn(_conv_bn(_conv_bn(x, q["branch7x7_1"]), q["branch7x7_2"]), q["branch7x7_3"])
            bd = x
            for k in ("branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                      "branch7x7dbl_4", "branch7x7dbl_5"):
                bd = _conv_bn(bd, q[k])
            bp = _conv_bn(_pool(x, "avg", 3, 1, "SAME"), q["branch_pool"])
            return jnp.concatenate([b1, b7, bd, bp], axis=-1)

        for name in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
            x = mixed_c(x, p[name])

        q = p["Mixed_7a"]
        b3 = _conv_bn(_conv_bn(x, q["branch3x3_1"]), q["branch3x3_2"], stride=2, padding="VALID")
        b7 = _conv_bn(_conv_bn(_conv_bn(x, q["branch7x7x3_1"]), q["branch7x7x3_2"]), q["branch7x7x3_3"])
        b7 = _conv_bn(b7, q["branch7x7x3_4"], stride=2, padding="VALID")
        bp = _pool(x, "max", 3, 2)
        x = jnp.concatenate([b3, b7, bp], axis=-1)

        def mixed_e(x, q):
            b1 = _conv_bn(x, q["branch1x1"])
            b3 = _conv_bn(x, q["branch3x3_1"])
            b3 = jnp.concatenate(
                [_conv_bn(b3, q["branch3x3_2a"]), _conv_bn(b3, q["branch3x3_2b"])], axis=-1
            )
            bd = _conv_bn(_conv_bn(x, q["branch3x3dbl_1"]), q["branch3x3dbl_2"])
            bd = jnp.concatenate(
                [_conv_bn(bd, q["branch3x3dbl_3a"]), _conv_bn(bd, q["branch3x3dbl_3b"])], axis=-1
            )
            bp = _conv_bn(_pool(x, "avg", 3, 1, "SAME"), q["branch_pool"])
            return jnp.concatenate([b1, b3, bd, bp], axis=-1)

        x = mixed_e(x, p["Mixed_7b"])
        x = mixed_e(x, p["Mixed_7c"])
        return jnp.mean(x, axis=(1, 2))  # global average pool -> [B, 2048]


def make_detector(name: str, weights: "str | None" = None, seed: int = 0):
    """Construct a metric feature detector + params by name.

    The ONE place detector selection / weight loading lives (used by
    apps/calc_metrics.py and the train_gan in-training metric path): 'pixel'
    (weightless downsample features), 'inception' (InceptionV3, FID detector),
    'vgg16' (PPL/PR detector). `weights` is an optional torch state_dict path;
    without it, inception uses its deterministic init and vgg16 a seeded
    random init (relative-tracking only — the CLIs warn)."""
    def _stamp(det, prov):
        # Provenance rides on the detector object (frozen dataclass fields stay
        # hash/eq keys for jit) and is stamped into every JSONL metric record
        # (metric_main.calc_metric) — scores from random-init detectors must
        # never read as Inception-comparable downstream.
        import os

        object.__setattr__(det, "provenance", {
            "detector": name,
            "weights": os.path.abspath(weights) if weights else None,
            "source": prov,
        })
        return det

    if name == "pixel":
        return _stamp(PixelFeatures(), "weightless-pixel"), {}
    if name not in ("inception", "vgg16"):
        raise ValueError(f"unknown detector {name!r} (pixel | inception | vgg16)")
    det = InceptionV3() if name == "inception" else VGG16Features()
    if weights:
        from ..io.torch_import import load_torch_state_dict, state_dict_to_tree

        return _stamp(det, "torch-weights"), state_dict_to_tree(
            load_torch_state_dict(weights))
    if name == "inception":
        return _stamp(det, "random-init(deterministic)"), det.init()
    return _stamp(det, f"random-init(seed={seed})"), det.init(jax.random.PRNGKey(seed))
