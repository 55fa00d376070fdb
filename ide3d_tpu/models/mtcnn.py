"""MTCNN face detector (P-Net / R-Net / O-Net) — the landmark stage of the
in-the-wild preprocessing pipeline.

Reference: dataset_preprocessing/ffhq/batch_mtcnn.py:17-70 uses the `mtcnn`
package's detector to write 5 landmarks (left_eye, right_eye, nose, mouth_left,
mouth_right) per image; crop_images_in_the_wild.py + data/preprocess.align_crop
consume them. This module implements the three cascade CNNs in JAX (NHWC) plus
the standard pyramid/NMS cascade (Zhang et al. 2016, "Joint Face Detection and
Alignment Using Multitask Cascaded Convolutional Networks") so only the
pretrained weights are gated (import them from facenet-pytorch's
pnet.pt/rnet.pt/onet.pt state dicts via `import_mtcnn`).

Param trees mirror the torch state_dict keys 1:1 (conv1/prelu1/.../dense5_1,
converted by io.torch_import.state_dict_to_tree). The torch nets flatten
feature maps in (W, H, C) order before the dense layers (a quirk of the
original Caffe->torch port); the forwards here reproduce that exactly so
imported dense weights line up.

The cascade is host-side preprocessing (numpy control flow, jnp convs on CPU);
it is NOT part of any jitted training path.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ------------------------------------------------------------------ primitives


def _conv(x: jax.Array, p: dict, stride: int = 1) -> jax.Array:
    y = jax.lax.conv_general_dilated(
        x, p["weight"], (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["bias"]


def _prelu(x: jax.Array, p: dict) -> jax.Array:
    a = p["weight"]  # [C], broadcasts over NHWC
    return jnp.where(x >= 0, x, a * x)


def _maxpool_ceil(x: jax.Array, k: int, s: int) -> jax.Array:
    """torch MaxPool2d(k, s, ceil_mode=True): right/bottom-pad with -inf so the
    last (partial) window is kept."""
    H, W = x.shape[1], x.shape[2]

    def pad_for(n):
        out = -(-(n - k) // s) + 1  # ceil
        return max(0, (out - 1) * s + k - n)

    ph, pw = pad_for(H), pad_for(W)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1),
        ((0, 0), (0, ph), (0, pw), (0, 0)))


def _flatten_whc(x: jax.Array) -> jax.Array:
    """torch quirk: NCHW.permute(0,3,2,1).flatten == (W, H, C)-order flatten.
    From NHWC: transpose to [N, W, H, C] first."""
    x = jnp.transpose(x, (0, 2, 1, 3))
    return x.reshape(x.shape[0], -1)


def _dense(x: jax.Array, p: dict) -> jax.Array:
    return x @ p["weight"] + p["bias"]


# ---------------------------------------------------------------------- P-Net


@dataclasses.dataclass(frozen=True)
class PNet:
    """Proposal net: fully convolutional over any input ≥12×12.
    Returns (probs [N,h,w,2] softmax, reg [N,h,w,4])."""

    def init(self, key: jax.Array) -> dict:
        return _random_params(key, [
            ("conv1", 3, 3, 10), ("prelu1", 10),
            ("conv2", 3, 10, 16), ("prelu2", 16),
            ("conv3", 3, 16, 32), ("prelu3", 32),
            ("conv4_1", 1, 32, 2), ("conv4_2", 1, 32, 4),
        ])

    def __call__(self, params: dict, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        x = _prelu(_conv(x, params["conv1"]), params["prelu1"])
        x = _maxpool_ceil(x, 2, 2)
        x = _prelu(_conv(x, params["conv2"]), params["prelu2"])
        x = _prelu(_conv(x, params["conv3"]), params["prelu3"])
        probs = jax.nn.softmax(_conv(x, params["conv4_1"]), axis=-1)
        reg = _conv(x, params["conv4_2"])
        return probs, reg


@dataclasses.dataclass(frozen=True)
class RNet:
    """Refinement net over 24×24 crops. Returns (probs [N,2], reg [N,4])."""

    def init(self, key: jax.Array) -> dict:
        return _random_params(key, [
            ("conv1", 3, 3, 28), ("prelu1", 28),
            ("conv2", 3, 28, 48), ("prelu2", 48),
            ("conv3", 2, 48, 64), ("prelu3", 64),
            ("dense4", 576, 128), ("prelu4", 128),
            ("dense5_1", 128, 2), ("dense5_2", 128, 4),
        ])

    def __call__(self, params: dict, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        x = _prelu(_conv(x, params["conv1"]), params["prelu1"])
        x = _maxpool_ceil(x, 3, 2)
        x = _prelu(_conv(x, params["conv2"]), params["prelu2"])
        x = _maxpool_ceil(x, 3, 2)
        x = _prelu(_conv(x, params["conv3"]), params["prelu3"])
        x = _prelu(_dense(_flatten_whc(x), params["dense4"]), params["prelu4"])
        probs = jax.nn.softmax(_dense(x, params["dense5_1"]), axis=-1)
        reg = _dense(x, params["dense5_2"])
        return probs, reg


@dataclasses.dataclass(frozen=True)
class ONet:
    """Output net over 48×48 crops. Returns (probs [N,2], reg [N,4],
    landmarks [N,10] = 5×(x…x, y…y) normalized to the box)."""

    def init(self, key: jax.Array) -> dict:
        return _random_params(key, [
            ("conv1", 3, 3, 32), ("prelu1", 32),
            ("conv2", 3, 32, 64), ("prelu2", 64),
            ("conv3", 3, 64, 64), ("prelu3", 64),
            ("conv4", 2, 64, 128), ("prelu4", 128),
            ("dense5", 1152, 256), ("prelu5", 256),
            ("dense6_1", 256, 2), ("dense6_2", 256, 4), ("dense6_3", 256, 10),
        ])

    def __call__(self, params: dict, x: jax.Array):
        x = _prelu(_conv(x, params["conv1"]), params["prelu1"])
        x = _maxpool_ceil(x, 3, 2)
        x = _prelu(_conv(x, params["conv2"]), params["prelu2"])
        x = _maxpool_ceil(x, 3, 2)
        x = _prelu(_conv(x, params["conv3"]), params["prelu3"])
        x = _maxpool_ceil(x, 2, 2)
        x = _prelu(_conv(x, params["conv4"]), params["prelu4"])
        x = _prelu(_dense(_flatten_whc(x), params["dense5"]), params["prelu5"])
        probs = jax.nn.softmax(_dense(x, params["dense6_1"]), axis=-1)
        reg = _dense(x, params["dense6_2"])
        lmk = _dense(x, params["dense6_3"])
        return probs, reg, lmk


def _random_params(key: jax.Array, spec) -> dict:
    p = {}
    for i, entry in enumerate(spec):
        k = jax.random.fold_in(key, i)
        name = entry[0]
        if name.startswith("prelu"):
            p[name] = {"weight": jnp.full((entry[1],), 0.25)}
        elif name.startswith("dense"):
            _, fin, fout = entry
            p[name] = {"weight": jax.random.normal(k, (fin, fout)) * fin ** -0.5,
                       "bias": jnp.zeros((fout,))}
        else:
            _, ks, ci, co = entry
            p[name] = {"weight": jax.random.normal(k, (ks, ks, ci, co)) * (ks * ks * ci) ** -0.5,
                       "bias": jnp.zeros((co,))}
    return p


def import_mtcnn(pnet_sd: dict, rnet_sd: dict, onet_sd: dict) -> dict:
    """facenet-pytorch pnet/rnet/onet state dicts -> {'pnet','rnet','onet'} trees."""
    from ..io.torch_import import state_dict_to_tree

    def conv(sd):
        return state_dict_to_tree({k: np.asarray(v) for k, v in sd.items()})

    return {"pnet": conv(pnet_sd), "rnet": conv(rnet_sd), "onet": conv(onet_sd)}


# ------------------------------------------------------------- cascade (host)


def nms(boxes: np.ndarray, threshold: float, method: str = "union") -> np.ndarray:
    """Standard MTCNN NMS; boxes [N,5] = x1,y1,x2,y2,score. Returns kept indices."""
    if boxes.size == 0:
        return np.zeros((0,), np.int64)
    x1, y1, x2, y2, s = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3], boxes[:, 4]
    area = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = np.argsort(s)
    keep = []
    while order.size > 0:
        i = order[-1]
        keep.append(i)
        rest = order[:-1]
        xx1 = np.maximum(x1[i], x1[rest])
        yy1 = np.maximum(y1[i], y1[rest])
        xx2 = np.minimum(x2[i], x2[rest])
        yy2 = np.minimum(y2[i], y2[rest])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        if method == "min":
            o = inter / np.minimum(area[i], area[rest])
        else:
            o = inter / (area[i] + area[rest] - inter)
        order = rest[o <= threshold]
    return np.asarray(keep, np.int64)


def generate_bounding_boxes(probs: np.ndarray, reg: np.ndarray, scale: float,
                            threshold: float) -> np.ndarray:
    """P-Net feature map -> candidate boxes [N,9] (x1,y1,x2,y2,score,4 reg).
    stride 2, cell size 12 (the P-Net receptive-field geometry)."""
    stride, cell = 2, 12
    ys, xs = np.where(probs >= threshold)
    if ys.size == 0:
        return np.zeros((0, 9), np.float32)
    score = probs[ys, xs]
    r = reg[ys, xs]  # [N,4]
    q1 = np.stack([np.round((stride * xs + 1) / scale),
                   np.round((stride * ys + 1) / scale)], axis=1)
    q2 = np.stack([np.round((stride * xs + cell) / scale),
                   np.round((stride * ys + cell) / scale)], axis=1)
    return np.concatenate([q1, q2, score[:, None], r], axis=1).astype(np.float32)


def rerec(boxes: np.ndarray) -> np.ndarray:
    """Make boxes square around their center (the cascade's 'rerec')."""
    out = boxes.copy()
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    side = np.maximum(w, h)
    out[:, 0] = boxes[:, 0] + w * 0.5 - side * 0.5
    out[:, 1] = boxes[:, 1] + h * 0.5 - side * 0.5
    out[:, 2] = out[:, 0] + side
    out[:, 3] = out[:, 1] + side
    return out


def apply_regression(boxes: np.ndarray, reg: np.ndarray) -> np.ndarray:
    """Calibrate boxes by the regression offsets (relative to box size)."""
    out = boxes.copy()
    w = (boxes[:, 2] - boxes[:, 0] + 1)[:, None]
    h = (boxes[:, 3] - boxes[:, 1] + 1)[:, None]
    out[:, :4] = boxes[:, :4] + np.concatenate([w, h, w, h], axis=1) * reg
    return out


def _crop_resize(img: np.ndarray, boxes: np.ndarray, size: int) -> np.ndarray:
    """Crop each box (zero-padded at image borders) and bilinear-resize to
    size×size. img float [H,W,3]."""
    H, W = img.shape[:2]
    out = np.zeros((len(boxes), size, size, 3), np.float32)
    for i, b in enumerate(np.round(boxes[:, :4]).astype(np.int64)):
        x1, y1, x2, y2 = b
        pad = np.zeros((y2 - y1 + 1, x2 - x1 + 1, 3), np.float32)
        sx1, sy1 = max(x1, 0), max(y1, 0)
        sx2, sy2 = min(x2 + 1, W), min(y2 + 1, H)
        if sx2 <= sx1 or sy2 <= sy1:
            continue
        pad[sy1 - y1: sy2 - y1, sx1 - x1: sx2 - x1] = img[sy1:sy2, sx1:sx2]
        out[i] = np.asarray(jax.image.resize(
            jnp.asarray(pad), (size, size, 3), method="bilinear"))
    return out


KEYPOINT_NAMES = ("left_eye", "right_eye", "nose", "mouth_left", "mouth_right")


@dataclasses.dataclass
class MTCNN:
    """Cascade detector with the `mtcnn` package's detect_faces contract
    (batch_mtcnn.py:44-70): returns a list of
    {'box': [x, y, w, h], 'confidence': float, 'keypoints': {name: (x, y)}}."""

    params: dict
    min_face_size: int = 20
    scale_factor: float = 0.709
    steps_threshold: Tuple[float, float, float] = (0.6, 0.7, 0.7)

    def __post_init__(self):
        self._pnet, self._rnet, self._onet = PNet(), RNet(), ONet()
        self._pnet_jit = jax.jit(self._pnet)
        self._rnet_jit = jax.jit(self._rnet)
        self._onet_jit = jax.jit(self._onet)

    @staticmethod
    def _norm(x: np.ndarray) -> np.ndarray:
        return (x.astype(np.float32) - 127.5) * 0.0078125

    def detect_faces(self, img: np.ndarray) -> List[dict]:
        """img: uint8/float RGB [H, W, 3]."""
        img = np.asarray(img, np.float32)
        H, W = img.shape[:2]
        t1, t2, t3 = self.steps_threshold

        # ---- stage 1: image pyramid + P-Net proposals
        m = 12.0 / self.min_face_size
        min_side = min(H, W) * m
        scales, s = [], m
        while min_side >= 12:
            scales.append(s)
            s *= self.scale_factor
            min_side *= self.scale_factor
        total = []
        for scale in scales:
            hs, ws = int(np.ceil(H * scale)), int(np.ceil(W * scale))
            im = np.asarray(jax.image.resize(jnp.asarray(img), (hs, ws, 3), "bilinear"))
            probs, reg = self._pnet_jit(self.params["pnet"], self._norm(im)[None])
            boxes = generate_bounding_boxes(
                np.asarray(probs)[0, :, :, 1], np.asarray(reg)[0], scale, t1)
            if len(boxes):
                boxes = boxes[nms(boxes[:, :5], 0.5)]
                total.append(boxes)
        if not total:
            return []
        boxes = np.concatenate(total)
        boxes = boxes[nms(boxes[:, :5], 0.7)]
        boxes = rerec(apply_regression(boxes[:, :5], boxes[:, 5:9]))

        # ---- stage 2: R-Net refinement
        crops = _crop_resize(self._norm(img), boxes, 24)
        probs, reg = self._rnet_jit(self.params["rnet"], jnp.asarray(crops))
        probs, reg = np.asarray(probs)[:, 1], np.asarray(reg)
        keep = probs >= t2
        boxes, reg = boxes[keep], reg[keep]
        boxes[:, 4] = probs[keep]
        if not len(boxes):
            return []
        k = nms(boxes[:, :5], 0.7)
        boxes = rerec(apply_regression(boxes[k], reg[k]))

        # ---- stage 3: O-Net output + landmarks
        crops = _crop_resize(self._norm(img), boxes, 48)
        probs, reg, lmk = self._onet_jit(self.params["onet"], jnp.asarray(crops))
        probs, reg, lmk = np.asarray(probs)[:, 1], np.asarray(reg), np.asarray(lmk)
        keep = probs >= t3
        boxes, reg, lmk = boxes[keep], reg[keep], lmk[keep]
        boxes[:, 4] = probs[keep]
        if not len(boxes):
            return []
        w = boxes[:, 2] - boxes[:, 0] + 1
        h = boxes[:, 3] - boxes[:, 1] + 1
        pts_x = boxes[:, 0:1] + lmk[:, 0:5] * w[:, None] - 1
        pts_y = boxes[:, 1:2] + lmk[:, 5:10] * h[:, None] - 1
        boxes = apply_regression(boxes, reg)
        k = nms(boxes[:, :5], 0.7, method="min")
        boxes, pts_x, pts_y = boxes[k], pts_x[k], pts_y[k]

        out = []
        for b, px, py in zip(boxes, pts_x, pts_y):
            x1, y1, x2, y2 = b[:4]
            out.append({
                "box": [int(round(x1)), int(round(y1)),
                        int(round(x2 - x1)), int(round(y2 - y1))],
                "confidence": float(b[4]),
                "keypoints": {n: (float(px[i]), float(py[i]))
                              for i, n in enumerate(KEYPOINT_NAMES)},
            })
        return out


def write_detection(result: List[dict], path: str, min_confidence: float = 0.9) -> bool:
    """batch_mtcnn.py:44-70: pick the biggest face, write the 5 landmarks as
    'x y' lines (eye L, eye R, nose, mouth L, mouth R). Returns True if written."""
    if not result:
        return False
    idx = int(np.argmax([r["box"][2] + r["box"][3] for r in result]))
    r = result[idx]
    if r["confidence"] <= min_confidence:
        return False
    with open(path, "w") as f:
        for name in KEYPOINT_NAMES:
            x, y = r["keypoints"][name]
            f.write(f"{float(x)} {float(y)}\n")
    return True
