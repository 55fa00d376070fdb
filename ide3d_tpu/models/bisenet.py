"""BiSeNet face parser (inference-only), the semantics oracle of the whole system.

Reference: inversion/BiSeNet.py:229 (BiSeNet), :91 (ContextPath), :179
(FeatureFusionModule), backed by a torchvision-style ResNet18 (inversion/resnet.py).
It supervises every semantic mask in the pipeline (pseudo-labels for encoder
training apps/train_hybrid_encoder.py:264, Painter's "parse random/real image"
Painter/run_UI.py:364-412, face animation driving masks).

Implementation: pure functional NHWC with explicit eval-mode BatchNorm
(gamma, beta, running_mean, running_var). Param tree keys mirror the torch
state_dict names 1:1 (dots -> nested dicts), so importing `segNet-20Class.pth`
is a mechanical OIHW->HWIO transpose (io/torch_import.py).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def conv2d(x, w, stride=1, padding=None):
    # torch convention: explicit symmetric k//2 padding. XLA "SAME" pads
    # asymmetrically (low side short) for stride>1 on even inputs, which shifts
    # every window by one pixel vs torch — measured 4.88 max abs diff on a
    # stride-2 7x7 stem (tests/test_cnn_import.py pins this).
    if padding is None:
        k = w.shape[0]
        padding = [(k // 2, k // 2), (w.shape[1] // 2, w.shape[1] // 2)]
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


def batch_norm(x, p, eps=1e-5):
    scale = p["weight"] * jax.lax.rsqrt(p["running_var"] + eps)
    return x * scale + (p["bias"] - p["running_mean"] * scale)


def conv_bn_relu(x, p, stride=1):
    x = conv2d(x, p["conv"]["weight"], stride)
    return jax.nn.relu(batch_norm(x, p["bn"]))


def _basic_block(x, p, stride):
    """torchvision BasicBlock: conv3x3-bn-relu, conv3x3-bn, (+downsample), relu."""
    identity = x
    out = conv2d(x, p["conv1"]["weight"], stride)
    out = jax.nn.relu(batch_norm(out, p["bn1"]))
    out = conv2d(out, p["conv2"]["weight"], 1)
    out = batch_norm(out, p["bn2"])
    if "downsample" in p:
        identity = conv2d(x, p["downsample"]["0"]["weight"], stride)
        identity = batch_norm(identity, p["downsample"]["1"])
    return jax.nn.relu(out + identity)


def resnet18_features(x, p) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (feat8 [H/8, 128ch? -> 256], feat16, feat32) like inversion/resnet.py.

    torchvision resnet18 channels: stem 64, layer1 64 /4, layer2 128 /8,
    layer3 256 /16, layer4 512 /32. BiSeNet's ContextPath consumes
    (feat8=layer2 out? ) — the reference Resnet18 returns feat8 (layer2, 128ch),
    feat16 (layer3, 256ch), feat32 (layer4, 512ch).
    """
    x = conv2d(x, p["conv1"]["weight"], 2)
    x = jax.nn.relu(batch_norm(x, p["bn1"]))
    # maxpool 3x3 stride 2, SAME-ish padding=1
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0))
    )
    for blk in ("0", "1"):
        x = _basic_block(x, p["layer1"][blk], 1)
    x = _basic_block(x, p["layer2"]["0"], 2)
    x = _basic_block(x, p["layer2"]["1"], 1)
    feat8 = x  # 128 ch, /8
    x = _basic_block(x, p["layer3"]["0"], 2)
    x = _basic_block(x, p["layer3"]["1"], 1)
    feat16 = x  # 256 ch, /16
    x = _basic_block(x, p["layer4"]["0"], 2)
    x = _basic_block(x, p["layer4"]["1"], 1)
    feat32 = x  # 512 ch, /32
    return feat8, feat16, feat32


def _global_avg(x):
    return jnp.mean(x, axis=(1, 2), keepdims=True)


def _arm(x, p):
    """AttentionRefinementModule (BiSeNet.py:66-82)."""
    feat = conv_bn_relu(x, p["conv"])
    atten = _global_avg(feat)
    atten = conv2d(atten, p["conv_atten"]["weight"])
    atten = jax.nn.sigmoid(batch_norm(atten, p["bn_atten"]))
    return feat * atten


def _resize_bilinear_ac(x, hw):
    # align_corners=True bilinear (torch F.interpolate in ContextPath)
    B, H, W, C = x.shape
    h, w = hw
    if (H, W) == (h, w):
        return x
    # Degenerate axes first (torch AC=True semantics): a 1-wide input axis
    # broadcasts; a 1-wide output axis samples input coordinate 0.
    if H == 1 and x.shape[1] != h:
        x = jnp.broadcast_to(x, (B, h, W, C))
    if W == 1 and x.shape[2] != w:
        x = jnp.broadcast_to(x, (B, x.shape[1], w, C))
    if h == 1 and x.shape[1] != 1:
        x = x[:, :1]
    if w == 1 and x.shape[2] != 1:
        x = x[:, :, :1]
    B, H, W, C = x.shape
    if (H, W) == (h, w):
        return x
    # jax.image.resize 'linear' is align_corners=False; emulate AC=True with
    # scale_and_translate, whose sample map is in = (o + 0.5 - t)/k - 0.5.
    # AC=True wants in = o * (H-1)/(h-1), so k = (h-1)/(H-1) and
    # t = 0.5 - 0.5/a with a = 1/k (torch-parity pinned in tests/test_e4e.py).
    a_h = (H - 1) / (h - 1) if h > 1 and H > 1 else 1.0
    a_w = (W - 1) / (w - 1) if w > 1 and W > 1 else 1.0
    out = jax.image.scale_and_translate(
        x,
        (B, h, w, C),
        spatial_dims=(1, 2),
        scale=jnp.array([1.0 / a_h, 1.0 / a_w]),
        translation=jnp.array([0.5 - 0.5 / a_h, 0.5 - 0.5 / a_w]),
        method="linear",
        antialias=False,
    )
    return out


def context_path(x, p):
    """BiSeNet.py:103-124."""
    feat8, feat16, feat32 = resnet18_features(x, p["resnet"])
    h16, w16 = feat16.shape[1:3]
    h8, w8 = feat8.shape[1:3]
    h32, w32 = feat32.shape[1:3]

    avg = _global_avg(feat32)
    avg = conv_bn_relu(avg, p["conv_avg"])
    avg_up = jnp.broadcast_to(avg, (avg.shape[0], h32, w32, avg.shape[-1]))

    feat32_arm = _arm(feat32, p["arm32"]) + avg_up
    feat32_up = _resize_bilinear_ac(feat32_arm, (h16, w16))
    feat32_up = conv_bn_relu(feat32_up, p["conv_head32"])

    feat16_arm = _arm(feat16, p["arm16"]) + feat32_up
    feat16_up = _resize_bilinear_ac(feat16_arm, (h8, w8))
    feat16_up = conv_bn_relu(feat16_up, p["conv_head16"])

    return feat8, feat16_up, feat32_up


def feature_fusion(fsp, fcp, p):
    """BiSeNet.py:199-209."""
    fcat = jnp.concatenate([fsp, fcp], axis=-1)
    feat = conv_bn_relu(fcat, p["convblk"])
    atten = _global_avg(feat)
    atten = jax.nn.relu(conv2d(atten, p["conv1"]["weight"]))
    atten = jax.nn.sigmoid(conv2d(atten, p["conv2"]["weight"]))
    return feat * atten + feat


def bisenet_output(x, p):
    x = conv_bn_relu(x, p["conv"])
    return conv2d(x, p["conv_out"]["weight"])


@dataclasses.dataclass(frozen=True)
class BiSeNet:
    """Inference face parser. __call__(params, img [B,H,W,3]) -> logits [B,H,W,n]."""

    n_classes: int = 20

    def __call__(self, params: Dict, x: jax.Array) -> jax.Array:
        H, W = x.shape[1:3]
        feat_res8, feat_cp8, _ = context_path(x, params["cp"])
        feat_fuse = feature_fusion(feat_res8, feat_cp8, params["ffm"])
        out = bisenet_output(feat_fuse, params["conv_out"])
        return _resize_bilinear_ac(out, (H, W))

    # random init (for tests without the pretrained .pth)
    def init(self, key: jax.Array) -> Dict:
        import numpy as np

        rs = np.random.RandomState(0)

        def conv(ci, co, k):
            return {"weight": jnp.asarray(rs.randn(k, k, ci, co).astype(np.float32) * 0.05)}

        def bn(c):
            return {
                "weight": jnp.ones((c,), jnp.float32),
                "bias": jnp.zeros((c,), jnp.float32),
                "running_mean": jnp.zeros((c,), jnp.float32),
                "running_var": jnp.ones((c,), jnp.float32),
            }

        def cbr(ci, co, k=3):
            return {"conv": conv(ci, co, k), "bn": bn(co)}

        def block(ci, co, down):
            p = {"conv1": conv(ci, co, 3), "bn1": bn(co), "conv2": conv(co, co, 3), "bn2": bn(co)}
            if down:
                p["downsample"] = {"0": conv(ci, co, 1), "1": bn(co)}
            return p

        resnet = {
            "conv1": conv(3, 64, 7),
            "bn1": bn(64),
            "layer1": {"0": block(64, 64, False), "1": block(64, 64, False)},
            "layer2": {"0": block(64, 128, True), "1": block(128, 128, False)},
            "layer3": {"0": block(128, 256, True), "1": block(256, 256, False)},
            "layer4": {"0": block(256, 512, True), "1": block(512, 512, False)},
        }
        cp = {
            "resnet": resnet,
            "arm16": {"conv": cbr(256, 128), "conv_atten": conv(128, 128, 1), "bn_atten": bn(128)},
            "arm32": {"conv": cbr(512, 128), "conv_atten": conv(128, 128, 1), "bn_atten": bn(128)},
            "conv_head32": cbr(128, 128),
            "conv_head16": cbr(128, 128),
            "conv_avg": cbr(512, 128, 1),
        }
        n = self.n_classes
        return {
            "cp": cp,
            "ffm": {
                "convblk": cbr(256, 256, 1),
                "conv1": conv(256, 64, 1),
                "conv2": conv(64, 256, 1),
            },
            "conv_out": {"conv": cbr(256, 256), "conv_out": conv(256, n, 1)},
        }
