"""FFHQ camera-pose preprocessing: Deep3DFaceRecon output -> 25-dim labels.

Reference pipeline (dataset_preprocessing/ffhq/): MTCNN detect -> Deep3DFaceRecon
(.mat per image, external git submodule) -> `3dface2idr_mat.py` pose conversion ->
`preprocess_cameras.py` normalization -> dataset.json. The face-recon stage needs
external pretrained models (gated offline); this module ports the pure pose math
so any (angle, trans) estimates become training labels:

  * `euler_to_rotation` — the BFM compute_rotation convention (X, Y, Z intrinsic,
    applied as R = (Rz Ry Rx)^T in the Deep3DFaceRecon code),
  * `face_recon_to_pose` — 3dface2idr_mat.py:34-70: camera at -R(angle)·(trans -
    [0,0,10]) scaled by 0.27 (+[0, 0.006, 0.161] crop offsets), OpenCV->OpenGL
    column flip,
  * `fix_pose` / `fix_pose_orig` / `fix_intrinsics` — preprocess_cameras.py:30-60
    radius-2.7 normalizations,
  * `make_dataset_labels` — cameras.json -> dataset.json 'labels' entries,
  * `flip_yaw` — the mirror-augmentation pose relabel.
"""

from __future__ import annotations

import json
from typing import Dict, Optional

import numpy as np

FFHQ_INTRINSICS_NORMALIZED = np.array(
    [[2985.29 / 700, 0, 0.5], [0, 2985.29 / 700, 0.5], [0, 0, 1]], dtype=np.float64
)


def euler_to_rotation(angles: np.ndarray) -> np.ndarray:
    """Deep3DFaceRecon `compute_rotation`: angles [3] (x, y, z) radians ->
    R = (Rz @ Ry @ Rx).T (the BFM convention)."""
    x, y, z = angles
    Rx = np.array([[1, 0, 0], [0, np.cos(x), -np.sin(x)], [0, np.sin(x), np.cos(x)]])
    Ry = np.array([[np.cos(y), 0, np.sin(y)], [0, 1, 0], [-np.sin(y), 0, np.cos(y)]])
    Rz = np.array([[np.cos(z), -np.sin(z), 0], [np.sin(z), np.cos(z), 0], [0, 0, 1]])
    return (Rz @ Ry @ Rx).T


def face_recon_to_pose(angle: np.ndarray, trans: np.ndarray) -> np.ndarray:
    """(angle [3], trans [3]) -> 4x4 cam2world (contract: 3dface2idr_mat.py:38-70)."""
    R = euler_to_rotation(np.asarray(angle, np.float64).reshape(3))
    trans = np.asarray(trans, np.float64).reshape(3).copy()
    trans[2] += -10.0
    c = -R @ trans
    c *= 0.27
    c[1] += 0.006
    c[2] += 0.161

    pose = np.eye(4)
    pose[:3, :3] = R @ np.diag([1.0, -1.0, -1.0])  # OpenCV -> OpenGL columns
    pose[:3, 3] = c
    return pose


def fix_pose(pose: np.ndarray, cor=np.array([0, 0, 0.175])) -> np.ndarray:
    """Recropped-image normalization (preprocess_cameras.py:44-50)."""
    pose = np.array(pose, np.float64).copy()
    location = pose[:3, 3]
    direction = (location - cor) / np.linalg.norm(location - cor)
    pose[:3, 3] = direction * 2.7 + cor
    return pose


def fix_pose_orig(pose: np.ndarray) -> np.ndarray:
    """Original-submission normalization (preprocess_cameras.py:53-57)."""
    pose = np.array(pose, np.float64).copy()
    radius = np.linalg.norm(pose[:3, 3])
    pose[:3, 3] = pose[:3, 3] / radius * 2.7
    return pose


def fix_intrinsics(intrinsics: np.ndarray) -> np.ndarray:
    """preprocess_cameras.py:30-42 — normalized FFHQ intrinsics."""
    k = np.array(intrinsics, np.float64).copy()
    assert k.shape == (3, 3)
    return FFHQ_INTRINSICS_NORMALIZED.copy()


def flip_yaw(pose: np.ndarray) -> np.ndarray:
    """Mirror-augmentation pose relabel (the matrix form of the dataset loader's
    label[[1,2,3,4,8]] *= -1, dataset_seg.py:387)."""
    flipped = np.array(pose, np.float64).copy()
    flipped[0, 1] *= -1
    flipped[0, 2] *= -1
    flipped[1, 0] *= -1
    flipped[2, 0] *= -1
    flipped[0, 3] *= -1
    return flipped


def make_dataset_labels(
    cameras: Dict[str, dict], mode: str = "cor", mirror: bool = False
) -> dict:
    """cameras.json dict -> {'labels': [[fname, 25-dim], ...]}
    (contract: preprocess_cameras.py:62-119)."""
    fixer = {"cor": fix_pose, "orig": fix_pose_orig}[mode]
    labels = []
    for fname, cam in cameras.items():
        pose = fixer(np.array(cam["pose"]))
        intr = fix_intrinsics(np.array(cam["intrinsics"]))
        labels.append([fname, np.concatenate([pose.reshape(-1), intr.reshape(-1)]).tolist()])
        if mirror:
            fpose = flip_yaw(pose)
            base, ext = fname.rsplit(".", 1)
            labels.append(
                [f"{base}_mirror.{ext}",
                 np.concatenate([fpose.reshape(-1), intr.reshape(-1)]).tolist()]
            )
    return {"labels": labels}


def convert_face_recon_mats(in_root: str, out_path: Optional[str] = None) -> dict:
    """Directory of Deep3DFaceRecon .mat files -> cameras.json
    (3dface2idr_mat.py main loop)."""
    import os

    import scipy.io

    out = {}
    for f in sorted(os.listdir(in_root)):
        if not f.endswith(".mat"):
            continue
        m = scipy.io.loadmat(os.path.join(in_root, f))
        pose = face_recon_to_pose(m["angle"], m["trans"][0])
        K = np.eye(3)
        K[0, 0] = K[1, 1] = 2985.29
        K[0, 2] = K[1, 2] = 512.0
        out[f.replace(".mat", ".jpg")] = {"pose": pose.tolist(), "intrinsics": K.tolist()}
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(out, fh)
    return out
