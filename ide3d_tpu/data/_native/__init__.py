"""Native host-ops extension: builds on first import (ninja-style cached rebuild,
the TPU-era analogue of the reference's custom_ops JIT builder,
torch_utils/custom_ops.py:59). Falls back to numpy implementations when a C++
toolchain is unavailable."""

from __future__ import annotations

import hashlib
import os
import subprocess
import sys
import sysconfig

import numpy as np

_here = os.path.dirname(__file__)
_mod = None
_build_error = None


def _build():
    """Compile host_ops.cpp into a cached shared object keyed by source hash."""
    src = os.path.join(_here, "host_ops.cpp")
    with open(src, "rb") as f:
        digest = hashlib.md5(f.read()).hexdigest()[:12]
    cache_dir = os.environ.get(
        "IDE3D_TPU_NATIVE_CACHE", os.path.expanduser("~/.cache/ide3d_tpu_native")
    )
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"host_ops_{digest}.so")
    if not os.path.exists(so_path):
        py_inc = sysconfig.get_paths()["include"]
        np_inc = np.get_include()
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
            f"-I{py_inc}", f"-I{np_inc}", src, "-o", so_path + ".tmp",
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(so_path + ".tmp", so_path)
    import importlib.util

    spec = importlib.util.spec_from_file_location("host_ops", so_path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def get():
    """Returns the native module or None (numpy fallback)."""
    global _mod, _build_error
    if _mod is None and _build_error is None:
        try:
            _mod = _build()
        except Exception as e:  # toolchain missing — callers fall back to numpy
            _build_error = e
    return _mod


# ------------------------------------------------------------- python fallbacks


def onehot_seg(mask: np.ndarray, num_classes: int = 19, flip: bool = False) -> np.ndarray:
    m = get()
    if m is not None:
        return m.onehot_seg(np.ascontiguousarray(mask, np.uint8), num_classes, flip)
    if flip:
        mask = mask[:, ::-1]
    out = np.full((*mask.shape, num_classes), -1.0, np.float32)
    np.put_along_axis(out, np.clip(mask, 0, num_classes - 1)[..., None].astype(np.int64),
                      1.0, axis=-1)
    return out


def normalize_img(img: np.ndarray, flip: bool = False) -> np.ndarray:
    m = get()
    if m is not None:
        return m.normalize_img(np.ascontiguousarray(img, np.uint8), flip)
    if flip:
        img = img[:, ::-1]
    return img.astype(np.float32) / 127.5 - 1.0


def batch_assemble(imgs, segs, xflips, num_classes: int = 19):
    m = get()
    if m is not None:
        return m.batch_assemble(
            [np.ascontiguousarray(i, np.uint8) for i in imgs],
            None if segs is None else [np.ascontiguousarray(s, np.uint8) for s in segs],
            list(xflips), num_classes,
        )
    img_b = np.stack([normalize_img(i, f) for i, f in zip(imgs, xflips)])
    seg_b = None
    if segs is not None:
        seg_b = np.stack([onehot_seg(s, num_classes, f) for s, f in zip(segs, xflips)])
    return img_b, seg_b
