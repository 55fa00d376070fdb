"""Latent editing: GANSpace PCA, InterFaceGAN directions, StyleCLIP-style mapper.

Reference contracts:
  * GANSpace (inversion/editings/ganspace.py:1-21): per-direction
    (component_idx, start_layer, end_layer, strength) edits — project the latent
    onto a PCA component and shift the chosen w+ rows,
  * InterFaceGAN (inversion/editings/latent_editor.py:9-23): ws + alpha * direction,
  * StyleCLIP LevelsMapper (used by inversion/scripts/pti_styleclip.py:7-57):
    three 4-layer MLP mappers over the coarse(0:4)/medium(4:8)/fine(8:) w+ groups,
    ws' = ws + 0.1 * mapper(ws). The mapper is trained against CLIP; here the
    architecture + weight import are provided (training it requires a CLIP
    embedder, pluggable when weights are available — zero-egress environments gate
    it).
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.layers import FullyConnectedLayer
from ..models.mapping import normalize_2nd_moment


# --------------------------------------------------------------------- GANSpace


def compute_ganspace_pca(
    G, g_params, n_samples: int = 10000, key=None, n_components: int = 80
):
    """PCA of the w distribution (the GANSpace procedure). Returns dict with
    'comp' [n_components, w_dim], 'mean' [w_dim], 'std' [n_components]."""
    from .. import render

    key = jax.random.PRNGKey(0) if key is None else key
    z = jax.random.normal(key, (n_samples, G.cfg.z_dim))
    c = jnp.broadcast_to(jnp.asarray(render.CANONICAL_POSE_25), (n_samples, 25))
    ws = np.asarray(G.mapping(g_params["mapping"], z, c, broadcast=False))
    mean = ws.mean(axis=0)
    x = ws - mean
    u, s, vt = np.linalg.svd(x, full_matrices=False)
    comp = vt[:n_components]
    std = s[:n_components] / np.sqrt(len(ws) - 1)
    return {"comp": comp, "mean": mean, "std": std}


def apply_ganspace_edit(
    latents: jax.Array,  # [B, num_ws, w_dim]
    pca: dict,
    edit_directions: Sequence[Tuple[int, int, int, float]],
) -> jax.Array:
    """Contract: inversion/editings/ganspace.py:4-21 — for each
    (pca_idx, start, end, strength): w_centered = w - mean; delta along component
    scaled by strength, applied to rows [start:end)."""
    edit = jnp.zeros_like(latents)
    comp = jnp.asarray(pca["comp"])
    mean = jnp.asarray(pca["mean"])
    for pca_idx, start, end, strength in edit_directions:
        direction = comp[pca_idx]
        delta = direction[None, None, :] * strength
        mask = jnp.zeros((latents.shape[1],)).at[start:end].set(1.0)
        edit = edit + delta * mask[None, :, None]
    return latents + edit


# ----------------------------------------------------------------- InterFaceGAN


def apply_interfacegan(latents: jax.Array, direction: jax.Array, factor: float = 1.0):
    """Contract: inversion/editings/latent_editor.py:13-16."""
    return latents + factor * direction


def interfacegan_factor_range(latents, direction, factor_range):
    """Range variant (latent_editor.py:17-23): returns list over factors."""
    return [latents + f * direction for f in range(*factor_range)]


# -------------------------------------------------------------------- StyleCLIP


@dataclasses.dataclass(frozen=True)
class LevelsMapper:
    """StyleCLIP LevelsMapper: independent 4-layer (PixelNorm+FC-lrelu) mappers for
    coarse (rows 0:4), medium (4:8), fine (8:) w+ groups; edit = w + 0.1*mapper(w)."""

    w_dim: int = 512
    num_ws: int = 18
    use_coarse: bool = True
    use_medium: bool = True
    use_fine: bool = True

    def _mlp(self):
        return [
            FullyConnectedLayer(self.w_dim, self.w_dim, activation="lrelu", lr_multiplier=0.01)
            for _ in range(4)
        ]

    def init(self, key: jax.Array) -> dict:
        p = {}
        for i, name in enumerate(("course", "medium", "fine")):  # sic: StyleCLIP key name
            keys = jax.random.split(jax.random.fold_in(key, i), 4)
            p[name] = {f"fc{j}": fc.init(keys[j]) for j, fc in enumerate(self._mlp())}
        return p

    def _run(self, params, x):
        # StyleCLIP's PixelNorm normalizes dim=1 (model.py:15-16) — for the
        # mapper's [B, n_rows, 512] input that is the ROW axis, not channels.
        # Kept verbatim for pretrained-mapper parity.
        x = normalize_2nd_moment(x, axis=1)
        for j, fc in enumerate(self._mlp()):
            x = fc(params[f"fc{j}"], x)
        return x

    def __call__(self, params: dict, ws: jax.Array) -> jax.Array:
        """ws [B, num_ws, w_dim] -> delta [B, num_ws, w_dim]."""
        coarse, medium, fine = ws[:, :4], ws[:, 4:8], ws[:, 8:]
        coarse = self._run(params["course"], coarse) if self.use_coarse else jnp.zeros_like(coarse)
        medium = self._run(params["medium"], medium) if self.use_medium else jnp.zeros_like(medium)
        fine = self._run(params["fine"], fine) if self.use_fine else jnp.zeros_like(fine)
        return jnp.concatenate([coarse, medium, fine], axis=1)

    def edit(self, params: dict, ws: jax.Array, strength: float = 0.1) -> jax.Array:
        return ws + strength * self(params, ws)


# The 14 named attribute edits the reference ships pretrained mappers for
# (inversion/scripts/pti_styleclip.py:7-23): edit name -> (mapper checkpoint id,
# no_coarse, no_medium, no_fine).
STYLECLIP_EDITS = {
    "afro": ("afro", False, False, True),
    "angry": ("angry", False, False, True),
    "Beyonce": ("beyonce", False, False, False),
    "bobcut": ("bobcut", False, False, True),
    "bowlcut": ("bowlcut", False, False, True),
    "curly hair": ("curly_hair", False, False, True),
    "Hilary Clinton": ("hilary_clinton", False, False, False),
    "Jhonny Depp": ("depp", False, False, False),
    "mohawk": ("mohawk", False, False, True),
    "purple hair": ("purple_hair", False, False, False),
    "surprised": ("surprised", False, False, True),
    "Taylor Swift": ("taylor_swift", False, False, False),
    "trump": ("trump", False, False, False),
    "Mark Zuckerberg": ("zuckerberg", False, False, False),
}


def levels_mapper_for_edit(edit_name: str, num_ws: int = 18) -> LevelsMapper:
    """LevelsMapper configured like pti_styleclip.py does for a named edit."""
    _, no_coarse, no_medium, no_fine = STYLECLIP_EDITS[edit_name]
    return LevelsMapper(num_ws=num_ws, use_coarse=not no_coarse,
                        use_medium=not no_medium, use_fine=not no_fine)


def import_levels_mapper(sd: dict, num_ws: int = 18):
    """Pretrained StyleCLIP mapper checkpoint -> (LevelsMapper, params).

    Torch layout (StyleCLIP latent_mappers.py: Mapper = PixelNorm +
    4 × EqualLinear(512, 512, lr_mul=0.01, 'fused_lrelu')): keys
    `[mapper.]{course,medium,fine}_mapping.mapping.{1..4}.{weight,bias}`.
    EqualLinear's stored-unit-variance weight/lr_mul bias scheme is identical
    to FullyConnectedLayer's equalized-lr scheme, so tensors map 1:1 with a
    [out,in]->[in,out] transpose.
    """
    import numpy as np

    sd = {k: np.asarray(v) for k, v in sd.items() if hasattr(v, "shape")}
    if any(k.startswith("mapper.") for k in sd):
        sd = {k[len("mapper."):]: v for k, v in sd.items() if k.startswith("mapper.")}
    groups = sorted({k.split("_mapping.")[0] for k in sd})
    params = {}
    for g in groups:
        params[g] = {
            f"fc{i - 1}": {
                "weight": jnp.asarray(sd[f"{g}_mapping.mapping.{i}.weight"].T),
                "bias": jnp.asarray(sd[f"{g}_mapping.mapping.{i}.bias"]),
            }
            for i in range(1, 5)
        }
    mapper = LevelsMapper(
        num_ws=num_ws,
        use_coarse="course" in params,
        use_medium="medium" in params,
        use_fine="fine" in params,
    )
    return mapper, params
