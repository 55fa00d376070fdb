"""Native checkpointing: config + weights, explicitly NOT source-embedding pickles.

The reference serialises network *source code* inside its .pkl checkpoints
(torch_utils/persistence.py:35-132) and reconstructs classes at load time — a
design we deliberately replace (SURVEY.md §5 checkpoint/resume): here a checkpoint
is (a) a JSON-able config dict and (b) a flat pytree of arrays, stored via orbax
(preferred, async-capable, sharding-aware) with an npz fallback for tiny artifacts.

The torch-pickle weight importer (for consuming reference `.pkl`s read-only) lives
in io/torch_import.py.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import jax
import numpy as np


def _config_to_jsonable(cfg: Any):
    if dataclasses.is_dataclass(cfg):
        return {
            "__dataclass__": type(cfg).__name__,
            **{f.name: _config_to_jsonable(getattr(cfg, f.name)) for f in dataclasses.fields(cfg)},
        }
    if isinstance(cfg, (list, tuple)):
        return [_config_to_jsonable(v) for v in cfg]
    if isinstance(cfg, dict):
        return {k: _config_to_jsonable(v) for k, v in cfg.items()}
    return cfg


def config_from_jsonable(obj: Any, registry: Optional[dict] = None):
    """Inverse of the config serialization: '__dataclass__'-tagged dicts are
    reconstructed via the registry (defaults cover the framework's config types)."""
    if registry is None:
        from ..models.generator import GeneratorConfig
        from ..models.discriminator import DiscriminatorConfig
        from ..render.renderer import RenderParams

        registry = {
            "GeneratorConfig": GeneratorConfig,
            "DiscriminatorConfig": DiscriminatorConfig,
            "RenderParams": RenderParams,
        }
    if isinstance(obj, dict) and "__dataclass__" in obj:
        cls = registry.get(obj["__dataclass__"])
        fields = {k: config_from_jsonable(v, registry) for k, v in obj.items()
                  if k != "__dataclass__"}
        if cls is None:
            return fields
        valid = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in fields.items() if k in valid}
        # json round-trips tuples as lists; dataclass fields that expect tuples
        # (resample filters, pixel offsets) need them hashable again
        kwargs = {k: tuple(v) if isinstance(v, list) else v for k, v in kwargs.items()}
        return cls(**kwargs)
    if isinstance(obj, dict):
        return {k: config_from_jsonable(v, registry) for k, v in obj.items()}
    if isinstance(obj, list):
        return [config_from_jsonable(v, registry) for v in obj]
    return obj


def save_checkpoint(path: str, params, config: Any = None, step: Optional[int] = None,
                    **extra_meta):
    """Save params (+config json + any extra scalar metadata) under `path/`
    using orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.join(path, "params"), params, force=True)
    meta = {"step": step, **extra_meta}
    if config is not None:
        meta["config"] = _config_to_jsonable(config)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2, default=str)


def load_checkpoint(path: str, template=None):
    """Returns (params, meta_dict).

    `template`: a pytree with the EXACT structure the checkpoint was saved with
    (same dict keys, NamedTuple/tuple types). Required when the tree contains
    non-dict nodes — orbax restores optax optimizer states (NamedTuples) as
    plain dicts/lists otherwise, which breaks `opt.update` on resume
    (apps/train_gan.py / train_hybrid_encoder.py pass their freshly-initialized
    state as the template)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    if template is not None:
        params = ckptr.restore(os.path.join(path, "params"), item=template)
    else:
        params = ckptr.restore(os.path.join(path, "params"))
    meta = {}
    meta_path = os.path.join(path, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return params, meta


# --------------------------------------------------------------- small flat files


def save_pytree_npz(path: str, tree):
    """Single-file npz for small artifacts (latents, pivots — the reference's
    0.pt / rec_ws.pt equivalents, inversion/scripts coaches)."""
    from ..utils.misc import named_params

    flat = {name: np.asarray(leaf) for name, leaf in named_params(tree)}
    np.savez(path, **flat)


def load_pytree_npz(path: str) -> dict:
    data = np.load(path)
    tree: dict = {}
    for name in data.files:
        parts = name.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[name]
    return tree
