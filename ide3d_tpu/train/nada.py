"""NADA-style text-guided domain adaptation of the generator.

The reference ships `ide3d-nada` as an EMPTY git submodule (README.md:157-165
describes usage: adapt G toward a text prompt with CLIP guidance). This module
implements the StyleGAN-NADA training step natively:

    L = 1 - cos( E_img(G_train(w)) - E_img(G_frozen(w)),
                 E_txt(target) - E_txt(source) )

with a pluggable `embed_image` / text-direction — any CLIP-compatible embedder
works (the actual CLIP weights are unavailable in zero-egress environments; tests
use a stand-in embedder). Only the appearance rows' pathway trains by default
(adaptive layer freezing: geometry rows frozen keeps the 3D structure editable).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..models.generator import Ide3dGenerator


@dataclasses.dataclass(frozen=True)
class NadaConfig:
    lr: float = 2e-3
    betas: tuple = (0.0, 0.99)
    freeze_geometry: bool = True  # keep vb blocks + renderer frozen


class NadaState(NamedTuple):
    step: jax.Array
    params_train: dict
    opt: object


def _trainable_mask(params_synthesis: dict, freeze_geometry: bool) -> dict:
    def mask_for(name):
        if not freeze_geometry:
            return True
        # everything that shapes the rendered volume counts as geometry: the
        # vb plane blocks, the renderer decoder, AND the hybrid voxel branch
        # (generator.py use_feature_volume feeds it straight into the render)
        return not (name.startswith("vb")
                    or name in ("renderer", "feature_volume"))

    return {k: jax.tree_util.tree_map(lambda _: mask_for(k), v)
            for k, v in params_synthesis.items()}


def init_nada_state(G: Ide3dGenerator, g_params: dict, cfg: NadaConfig) -> NadaState:
    opt = optax.adam(cfg.lr, b1=cfg.betas[0], b2=cfg.betas[1])
    params = jax.tree_util.tree_map(jnp.copy, g_params)
    return NadaState(jnp.zeros((), jnp.int32), params, opt.init(params["synthesis"]))


def make_nada_step(
    G: Ide3dGenerator,
    g_frozen: dict,
    embed_image: Callable[[jax.Array], jax.Array],  # [B,H,W,3] -> [B,D]
    text_direction: jax.Array,  # [D] = E_txt(target) - E_txt(source), normalized
    cfg: NadaConfig = NadaConfig(),
):
    opt = optax.adam(cfg.lr, b1=cfg.betas[0], b2=cfg.betas[1])
    tdir = text_direction / (jnp.linalg.norm(text_direction) + 1e-8)

    def loss_fn(params_train, z, c, rng):
        ws = G.mapping(g_frozen["mapping"], z, c)
        img_t = G.synthesis(params_train["synthesis"], ws, c, noise_mode="random", rng=rng)
        img_f = jax.lax.stop_gradient(
            G.synthesis(g_frozen["synthesis"], ws, c, noise_mode="random", rng=rng)
        )
        e_t = embed_image(img_t)
        e_f = jax.lax.stop_gradient(embed_image(img_f))
        d = e_t - e_f
        d = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-8)
        return jnp.mean(1.0 - d @ tdir)

    mask_cache = {}

    def step(state: NadaState, z, c, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.params_train, z, c, rng)
        syn_grads = grads["synthesis"]
        if cfg.freeze_geometry:
            if not mask_cache:
                mask_cache["m"] = _trainable_mask(state.params_train["synthesis"], True)
            syn_grads = jax.tree_util.tree_map(
                lambda g, m: g * m, syn_grads,
                jax.tree_util.tree_map(lambda b: jnp.asarray(1.0 if b else 0.0),
                                       mask_cache["m"]),
            )
        updates, opt_state = opt.update(syn_grads, state.opt, state.params_train["synthesis"])
        syn = optax.apply_updates(state.params_train["synthesis"], updates)
        new_params = {**state.params_train, "synthesis": syn}
        return NadaState(state.step + 1, new_params, opt_state), loss

    return jax.jit(step, donate_argnums=(0,))
