"""ArcFace IR-SE50 identity backbone (inference-only).

Reference: inversion/criteria/id_loss.py:8-48 loads the pSp IR-SE50 backbone
(inversion/psp/models/encoders/model_irse.py) — input 112x112, [3,4,14,3]
bottleneck_IR_SE stages, SE ratio 16, output = BN -> flatten -> linear(512*7*7,
512) -> BN. Param tree keys mirror the torch `model_ir_se50.pth` state_dict
(input_layer.0.*, body.N.*, output_layer.*) for mechanical import via
io/torch_import.state_dict_to_tree.

The id-loss crop convention (rows 35:223 of a 256^2 aligned face, resized to 112)
is reproduced in `embed_faces` (id_loss.py:25-33).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# (in_channel, depth, stride) per bottleneck, stages [3, 4, 14, 3] (model_irse get_blocks(50))
def _blocks_50() -> List[Tuple[int, int, int]]:
    cfg = [(64, 64, 3), (64, 128, 4), (128, 256, 14), (256, 512, 3)]
    blocks = []
    for in_c, depth, n in cfg:
        blocks.append((in_c, depth, 2))
        for _ in range(n - 1):
            blocks.append((depth, depth, 1))
    return blocks


def _conv(x, w, stride=1, padding=None):
    # torch convention: explicit symmetric k//2 padding (XLA "SAME" shifts
    # windows for stride>1 — see models/bisenet.py conv2d note).
    if padding is None:
        k = w.shape[0]
        padding = [(k // 2, k // 2), (w.shape[1] // 2, w.shape[1] // 2)]
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


def _bn(x, p, eps=1e-5):
    scale = p["weight"] * jax.lax.rsqrt(p["running_var"] + eps)
    return x * scale + (p["bias"] - p["running_mean"] * scale)


def _prelu(x, p):
    a = p["weight"].reshape((1,) * (x.ndim - 1) + (-1,))
    return jnp.where(x >= 0, x, a * x)


@dataclasses.dataclass(frozen=True)
class ArcFaceIRSE50:
    embed_dim: int = 512

    def init(self, key=None) -> dict:
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

        def prelu(c):
            return {"weight": jnp.full((c,), 0.25, jnp.float32)}

        p = {
            "input_layer": {"0": conv(3, 64, 3), "1": bn(64), "2": prelu(64)},
            "body": {},
            "output_layer": {
                "0": bn(512),
                "3": {
                    "weight": jnp.asarray(
                        rs.randn(512 * 7 * 7, 512).astype(np.float32) * 0.01
                    ),
                    "bias": jnp.zeros((512,), jnp.float32),
                },
                "4": bn(512),
            },
        }
        for i, (ci, depth, stride) in enumerate(_blocks_50()):
            blk = {
                "res_layer": {
                    "0": bn(ci),
                    "1": conv(ci, depth, 3),
                    "2": prelu(depth),
                    "3": conv(depth, depth, 3),
                    "4": bn(depth),
                    # SE module (model_irse SEModule): fc1 down 1x1, fc2 up 1x1
                    "5": {
                        "fc1": conv(depth, depth // 16, 1),
                        "fc2": conv(depth // 16, depth, 1),
                    },
                },
            }
            # model_irse helpers: conv shortcut ONLY when channels change;
            # in_channel == depth uses MaxPool2d(1, stride) even at stride 2
            # (body.0 has NO shortcut params in the real model_ir_se50.pth).
            if ci != depth:
                blk["shortcut_layer"] = {"0": conv(ci, depth, 1), "1": bn(depth)}
            p["body"][str(i)] = blk
        return p

    def __call__(self, params: dict, x: jax.Array) -> jax.Array:
        """x [B, 112, 112, 3] in [-1, 1] -> L2-normalizable embeddings [B, 512]."""
        p = params["input_layer"]
        x = _conv(x, p["0"]["weight"])
        x = _prelu(_bn(x, p["1"]), p["2"])

        for i, (ci, depth, stride) in enumerate(_blocks_50()):
            bp = params["body"][str(i)]
            if "shortcut_layer" in bp:
                sc = _bn(_conv(x, bp["shortcut_layer"]["0"]["weight"], stride),
                         bp["shortcut_layer"]["1"])
            elif stride == 1:
                sc = x
            else:
                sc = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 1, 1, 1), (1, stride, stride, 1), "VALID"
                )
            r = bp["res_layer"]
            y = _bn(x, r["0"])
            y = _prelu(_conv(y, r["1"]["weight"]), r["2"])
            y = _bn(_conv(y, r["3"]["weight"], stride), r["4"])
            # SE
            s = jnp.mean(y, axis=(1, 2), keepdims=True)
            s = jax.nn.relu(_conv(s, r["5"]["fc1"]["weight"]))
            s = jax.nn.sigmoid(_conv(s, r["5"]["fc2"]["weight"]))
            x = y * s + sc

        o = params["output_layer"]
        x = _bn(x, o["0"])
        # torch flattens NCHW; transpose for weight-import parity
        B = x.shape[0]
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(B, -1)
        x = x @ o["3"]["weight"] + o["3"]["bias"]
        # final BatchNorm1d
        bn1 = o["4"]
        scale = bn1["weight"] * jax.lax.rsqrt(bn1["running_var"] + 1e-5)
        return x * scale + (bn1["bias"] - bn1["running_mean"] * scale)

    def embed_faces(self, params: dict, images: jax.Array) -> jax.Array:
        """Full ID-loss preprocessing (id_loss.py:25-33): crop the face region
        (relative box 35/256..223/256) and resize to 112^2, then embed."""
        B, H, W, C = images.shape
        y0, y1 = int(35 / 256 * H), int(223 / 256 * H)
        x0, x1 = int(32 / 256 * W), int(220 / 256 * W)
        crop = images[:, y0:y1, x0:x1, :]
        crop = jax.image.resize(crop, (B, 112, 112, C), "bilinear")
        return self(params, crop)
