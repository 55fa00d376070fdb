"""Deep3DFaceRecon coefficient network (ResNet-50 → 257 3DMM coefficients).

Reference: dataset_preprocessing/ffhq/preprocess_in_the_wild.py:25-29 runs the
Deep3DFaceRecon_pytorch submodule's `test.py` to regress per-image BFM
coefficients; 3dface2idr_mat.py + preprocess_cameras.py convert its
`angle`/`trans` outputs to 25-dim camera labels (that conversion already lives
in data/preprocess.face_recon_to_pose / convert_face_recon_mats). This module
provides the missing network so the whole in-the-wild pipeline is code-complete
and only the pretrained weights (epoch_20.pth) are gated.

Architecture (Deep3DFaceRecon_pytorch models/networks.py ReconNetWrapper with
use_last_fc=False): torchvision-style ResNet-50 trunk (conv1/bn1/maxpool,
layer1..4 of bottlenecks) to a [N,1,1,2048] feature, then seven 1×1-conv heads
concatenated to 257 channels:
    id 80 | exp 64 | tex 80 | angle 3 | gamma 27 | tx,ty 2 | tz 1.
State-dict keys mirror torch 1:1 (`backbone.*`, `final_layers.{0..6}.*`),
imported by the generic io.torch_import.state_dict_to_tree.

Input contract (test.py): 224×224 RGB in [0, 1].

TPU notes: NHWC/HWIO, explicit torch-convention k//2 padding on the stride-2
convs and the max-pool (XLA "SAME" shifts windows on even inputs —
tests/test_cnn_import.py pins this class of bug).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# (blocks, channels) per stage of ResNet-50
_STAGES = ((3, 256), (4, 512), (6, 1024), (3, 2048))
_HEAD_DIMS = (80, 64, 80, 3, 27, 2, 1)
COEFF_SLICES = {
    "id": (0, 80), "exp": (80, 144), "tex": (144, 224),
    "angle": (224, 227), "gamma": (227, 254), "trans": (254, 257),
}


def _conv(x, p, stride=1, k=None):
    w = p["weight"]
    k = w.shape[0] if k is None else k
    pad = k // 2
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "bias" in p:
        y = y + p["bias"]
    return y


def _bn(x, p, eps=1e-5):
    scale = p["weight"] * jax.lax.rsqrt(p["running_var"] + eps)
    return x * scale + (p["bias"] - p["running_mean"] * scale)


def _maxpool_3x3_s2_p1(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))


def _bottleneck(x, p, stride):
    out = jax.nn.relu(_bn(_conv(x, p["conv1"]), p["bn1"]))
    out = jax.nn.relu(_bn(_conv(out, p["conv2"], stride=stride), p["bn2"]))
    out = _bn(_conv(out, p["conv3"]), p["bn3"])
    if "downsample" in p:
        x = _bn(_conv(x, p["downsample"]["0"], stride=stride), p["downsample"]["1"])
    return jax.nn.relu(out + x)


@dataclasses.dataclass(frozen=True)
class FaceReconNet:
    """ResNet-50 trunk + 7 coefficient heads. Params mirror the torch
    state_dict of ReconNetWrapper (backbone.* / final_layers.*)."""

    def init(self, key: jax.Array) -> dict:
        ks = iter(jax.random.split(key, 256))

        def conv(kh, kw, ci, co, bias=False):
            p = {"weight": jax.random.normal(next(ks), (kh, kw, ci, co))
                 * (kh * kw * ci) ** -0.5}
            if bias:
                p["bias"] = jnp.zeros((co,))
            return p

        def bn(c):
            return {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,)),
                    "running_mean": jnp.zeros((c,)), "running_var": jnp.ones((c,))}

        backbone = {"conv1": conv(7, 7, 3, 64), "bn1": bn(64)}
        cin = 64
        for si, (blocks, cout) in enumerate(_STAGES):
            mid = cout // 4
            layer = {}
            for bi in range(blocks):
                p = {
                    "conv1": conv(1, 1, cin if bi == 0 else cout, mid),
                    "bn1": bn(mid),
                    "conv2": conv(3, 3, mid, mid),
                    "bn2": bn(mid),
                    "conv3": conv(1, 1, mid, cout),
                    "bn3": bn(cout),
                }
                if bi == 0:
                    p["downsample"] = {"0": conv(1, 1, cin, cout), "1": bn(cout)}
                layer[str(bi)] = p
            backbone[f"layer{si + 1}"] = layer
            cin = cout
        heads = {str(i): conv(1, 1, 2048, d, bias=True)
                 for i, d in enumerate(_HEAD_DIMS)}
        return {"backbone": backbone, "final_layers": heads}

    def __call__(self, params: dict, x: jax.Array) -> jax.Array:
        """x: [N, 224, 224, 3] RGB in [0, 1] -> coefficients [N, 257]."""
        b = params["backbone"]
        x = jax.nn.relu(_bn(_conv(x, b["conv1"], stride=2), b["bn1"]))
        x = _maxpool_3x3_s2_p1(x)
        for si, (blocks, _) in enumerate(_STAGES):
            layer = b[f"layer{si + 1}"]
            for bi in range(blocks):
                # torchvision: stage stride 1 for layer1, else 2, on block 0
                stride = 2 if (bi == 0 and si > 0) else 1
                x = _bottleneck(x, layer[str(bi)], stride)
        x = x.mean(axis=(1, 2), keepdims=True)  # adaptive avg pool to 1×1
        outs = [_conv(x, params["final_layers"][str(i)])
                for i in range(len(_HEAD_DIMS))]
        return jnp.concatenate(outs, axis=-1)[:, 0, 0, :]


def split_coeffs(coeffs: jax.Array) -> Dict[str, jax.Array]:
    """[N,257] -> named 3DMM groups (ReconNetWrapper's output layout)."""
    return {k: coeffs[:, a:b] for k, (a, b) in COEFF_SLICES.items()}


def import_face_recon(sd: dict) -> Tuple[FaceReconNet, dict]:
    """Deep3DFaceRecon epoch_*.pth state dict -> (net, params). Accepts both
    raw state dicts and the training checkpoint's {'net_recon': sd} nesting."""
    from ..io.torch_import import state_dict_to_tree

    if "net_recon" in sd and isinstance(sd["net_recon"], dict):
        sd = sd["net_recon"]
    sd = {k: np.asarray(v) for k, v in sd.items() if hasattr(v, "shape")}
    return FaceReconNet(), state_dict_to_tree(sd)


def coeffs_to_pose_label(coeffs: np.ndarray) -> np.ndarray:
    """Image coefficients -> 25-dim dataset label via the pose-convention
    pipeline (3dface2idr_mat.py + preprocess_cameras.py math in
    data/preprocess.py). coeffs: [257] or [N,257]."""
    from ..data.preprocess import face_recon_to_pose, fix_intrinsics, fix_pose_orig

    coeffs = np.atleast_2d(np.asarray(coeffs))
    groups = {k: coeffs[:, a:b] for k, (a, b) in COEFF_SLICES.items()}
    labels = []
    for angle, trans in zip(groups["angle"], groups["trans"]):
        pose = face_recon_to_pose(angle, trans)
        pose = fix_pose_orig(pose)
        K = fix_intrinsics(np.eye(3))
        labels.append(np.concatenate([pose.reshape(-1), K.reshape(-1)]))
    return np.stack(labels).astype(np.float32)
