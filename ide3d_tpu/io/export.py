"""AOT serving artifacts: serialized StableHLO programs for deployment.

The reference has no deployment story beyond pickled torch modules (persistence
pkls re-execute embedded source at load time — legacy.py:22-96). A production
TPU serving path wants the opposite: a frozen, code-free artifact that any JAX
runtime can execute without the model code or a Python class registry.

`jax.export` gives exactly that: the jitted program is lowered to StableHLO once
(weights embedded as constants), serialized to bytes, and `deserialize(...).call`
runs it AOT — no tracing, no framework code, no pickle execution. This module
packages the flagship generator as such an artifact directory:

    frame.bin     exported synthesis frame: (ws [B,18,512], c [B,25]) -> img
                  [, seg] — the gen_images/Painter render contract
    mapping.bin   exported mapping: (z [B,512], c [B,25]) -> ws (truncation
                  baked in at export time, like a deployed .engine)
    meta.json     shapes, dtypes, truncation, render params, target platforms

Multi-platform: pass platforms=("tpu", "cpu") to emit a single artifact that
runs on both (jax.export lowering_platforms); default is the current backend.

Typical use:
    art = export_generator(G, params, out_dir, truncation_psi=0.7)
    frame = load_artifact(out_dir)
    img, seg = frame.render(frame.map_z(z, c), c)
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def _export_fn(fn, args, platforms):
    from jax import export as jexport

    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    exp = jexport.export(jax.jit(fn), **kwargs)(*args)
    return exp.serialize()


def export_generator(
    G,
    params,
    out_dir: str,
    batch: int = 1,
    truncation_psi: float = 1.0,
    return_seg: bool = True,
    render_params=None,
    platforms: Optional[Sequence[str]] = None,
) -> dict:
    """Write a self-contained serving artifact for `G` (weights embedded).

    Returns the meta dict. The synthesis program uses the deterministic
    interactive contract (noise_mode='const'), matching gen_images/Painter.
    """
    os.makedirs(out_dir, exist_ok=True)
    rp = render_params or G.cfg.render
    S = G.synthesis
    map_params = params["mapping"]
    syn_params = params["synthesis"]

    def mapping_fn(z, c):
        return G.mapping(map_params, z, c, truncation_psi=truncation_psi)

    def frame_fn(ws, c):
        # (img, seg) when return_seg else img — the gen_images render contract
        return S(syn_params, ws, c, render_params=rp, return_seg=return_seg)

    z_spec = jax.ShapeDtypeStruct((batch, G.cfg.z_dim), jnp.float32)
    c_spec = jax.ShapeDtypeStruct((batch, G.cfg.c_dim), jnp.float32)
    ws_spec = jax.ShapeDtypeStruct((batch, G.num_ws, G.cfg.w_dim), jnp.float32)

    with open(os.path.join(out_dir, "mapping.bin"), "wb") as f:
        f.write(_export_fn(mapping_fn, (z_spec, c_spec), platforms))
    with open(os.path.join(out_dir, "frame.bin"), "wb") as f:
        f.write(_export_fn(frame_fn, (ws_spec, c_spec), platforms))

    meta = {
        "format": "ide3d_tpu.export/1",
        "batch": batch,
        "z_dim": G.cfg.z_dim,
        "c_dim": G.cfg.c_dim,
        "w_dim": G.cfg.w_dim,
        "num_ws": G.num_ws,
        "img_resolution": G.cfg.img_resolution,
        "truncation_psi": truncation_psi,
        "return_seg": return_seg,
        "render": {
            "img_size": rp.img_size,
            "num_steps": rp.num_steps,
            "fine_steps": rp.fine_steps,
        },
        "platforms": list(platforms) if platforms is not None else None,
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


@dataclasses.dataclass(frozen=True)
class GeneratorArtifact:
    """Loaded serving artifact. `map_z` and `render` execute the AOT programs
    (no model code, no tracing)."""

    meta: dict
    _mapping: object
    _frame: object

    def map_z(self, z: jax.Array, c: jax.Array) -> jax.Array:
        return self._mapping.call(z, c)

    def render(self, ws: jax.Array, c: jax.Array):
        return self._frame.call(ws, c)


def load_artifact(out_dir: str) -> GeneratorArtifact:
    from jax import export as jexport

    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    if meta.get("format") != "ide3d_tpu.export/1":
        raise ValueError(f"not an ide3d_tpu export artifact: {out_dir}")
    with open(os.path.join(out_dir, "mapping.bin"), "rb") as f:
        mapping = jexport.deserialize(f.read())
    with open(os.path.join(out_dir, "frame.bin"), "rb") as f:
        frame = jexport.deserialize(f.read())
    return GeneratorArtifact(meta=meta, _mapping=mapping, _frame=frame)
