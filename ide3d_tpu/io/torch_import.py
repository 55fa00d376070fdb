"""Torch checkpoint import: reference .pth/.pt/.pkl weights -> ide3d_tpu pytrees.

The reference ships four torch CNNs the rebuild depends on (BiSeNet face parser,
VGG16/VGG19 perceptual nets, ArcFace ID net, InceptionV3 metrics net) plus the
pickled generator/discriminator/encoder checkpoints (legacy.py:22-96). This module
provides:

  * `load_torch_state_dict(path)` — torch.load on CPU, returning {name: np.ndarray},
  * `state_dict_to_tree(sd)` — dotted names -> nested dicts with layout conversion
    (conv OIHW -> HWIO, linear [out,in] -> [in,out], everything else verbatim),
  * `import_bisenet(path)` — ready-to-use params for models/bisenet.py (whose tree
    keys mirror the torch state_dict 1:1 by construction).

Generator .pkl import note: reference G checkpoints are source-embedding pickles
(torch_utils/persistence.py:35-132) whose classes exist only inside the pickle; a
faithful tensor-level import requires executing that embedded source, which this
framework intentionally does not do. `load_pickle_tensors` extracts the raw tensor
payload (names + arrays) via a stubbed unpickler for offline inspection/mapping.
"""

from __future__ import annotations

import io as _io
import pickle
from typing import Dict

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if isinstance(obj, dict) and "state_dict" in obj and isinstance(obj["state_dict"], dict):
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
    return out


def _convert_leaf(name: str, arr: np.ndarray) -> np.ndarray:
    last = name.rsplit(".", 1)[-1]
    if last == "weight" and arr.ndim == 4:
        # conv OIHW -> HWIO
        return np.ascontiguousarray(np.transpose(arr, (2, 3, 1, 0)))
    if last == "weight" and arr.ndim == 2:
        # linear [out, in] -> [in, out]
        return np.ascontiguousarray(arr.T)
    if last == "weight" and arr.ndim == 5:
        # conv3d OIDHW -> DHWIO
        return np.ascontiguousarray(np.transpose(arr, (2, 3, 4, 1, 0)))
    return arr


def state_dict_to_tree(sd: Dict[str, np.ndarray], convert: bool = True) -> dict:
    tree: dict = {}
    for name, arr in sd.items():
        if name.endswith("num_batches_tracked"):
            continue
        leaf = _convert_leaf(name, arr) if convert else arr
        parts = name.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf
    return tree


def import_bisenet(path: str) -> dict:
    """segNet-20Class.pth -> params for models/bisenet.BiSeNet (keys match 1:1)."""
    return state_dict_to_tree(load_torch_state_dict(path))


# ------------------------------------------------------------------ pkl inspection


class _TensorStubUnpickler(pickle.Unpickler):
    """Unpickler that stubs every unknown class so the tensor payload of a
    source-embedding reference .pkl (legacy.py:101) can be walked without executing
    embedded code."""

    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except Exception:
            class _Stub(dict):
                _module, _name = module, name

                def __setstate__(self, state):
                    if isinstance(state, dict):
                        self.update(state)

            _Stub.__name__ = name
            return _Stub

    def persistent_load(self, pid):
        return pid


def load_pickle_tensors(path: str) -> dict:
    """Best-effort raw object graph of a reference .pkl (for name-mapping work)."""
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=False)
    except Exception:
        with open(path, "rb") as f:
            return _TensorStubUnpickler(f).load()
