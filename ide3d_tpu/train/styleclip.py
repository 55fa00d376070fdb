"""StyleCLIP LevelsMapper training — text-driven latent mapper over a frozen G.

Reference: inversion/models/StyleCLIP/mapper/training/coach.py —
  w_hat = w + 0.1 * mapper(w); x = G(w); x_hat = G(w_hat)
  L = id_lambda * IDLoss(x_hat, x) + clip_lambda * CLIPLoss(x_hat, text)
      + latent_l2_lambda * MSE(w_hat, w)
with defaults lr 0.5, id 0.1, clip 1.0, latent_l2 0.8, batch 2
(mapper/options/train_options.py:27-32). The reference optimizer is Ranger
(Adam is its supported alternative, coach.configure_optimizers); we use Adam.
Latents come from G.mapping at truncation 0.7 when no dataset is given
(coach.py:164-186).

The decoder here is the IDE-3D generator (3D-aware), so renders are conditioned
on a camera; training renders at the canonical front pose like the Painter loop.
Everything (2×G + mapper + CLIP + ArcFace) runs as ONE jitted step.

CLIP weights are required (zero-egress environments gate them; tests use a
tiny randomly-initialized CLIP — the step only needs a differentiable embedder).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.clip import CLIP, clip_similarity_loss
from ..editing.latent_editor import LevelsMapper
from .. import render


@dataclasses.dataclass(frozen=True)
class StyleClipConfig:
    description: str = "a face with purple hair"
    lr: float = 0.5
    id_lambda: float = 0.1
    clip_lambda: float = 1.0
    latent_l2_lambda: float = 0.8
    batch_size: int = 2
    max_steps: int = 50_000
    truncation_psi: float = 0.7
    edit_strength: float = 0.1  # styleclip_mapper.py: x + 0.1 * mapper(x)


class StyleClipState(NamedTuple):
    step: jax.Array
    mapper_params: dict
    opt: object


def sample_latents(G, g_params: dict, n: int, key: jax.Array,
                   truncation_psi: float = 0.7) -> jax.Array:
    """The coach's 'no latents given' path (coach.py:164-186): sample the
    decoder's own latent distribution with truncation."""
    z = jax.random.normal(key, (n, G.cfg.z_dim))
    c = jnp.broadcast_to(jnp.asarray(render.CANONICAL_POSE_25), (n, 25))
    return G.mapping(g_params["mapping"], z, c, truncation_psi=truncation_psi)


def init_styleclip_state(mapper: LevelsMapper, key: jax.Array,
                         cfg: StyleClipConfig = StyleClipConfig()) -> StyleClipState:
    params = mapper.init(key)
    opt = optax.adam(cfg.lr)
    return StyleClipState(jnp.zeros((), jnp.int32), params, opt.init(params))


def make_styleclip_step(
    G,
    g_params: dict,
    mapper: LevelsMapper,
    clip_model: CLIP,
    clip_params: dict,
    text_tokens: jax.Array,  # [1, context] from SimpleTokenizer.tokenize(description)
    cfg: StyleClipConfig = StyleClipConfig(),
    embed_id: Optional[Callable[[jax.Array], jax.Array]] = None,  # ArcFace embedder
):
    """One jitted mapper-training step over a batch of w+ latents [B,18,512]."""
    opt = optax.adam(cfg.lr)
    c_front = jnp.asarray(render.CANONICAL_POSE_25)

    def render_front(ws):
        c = jnp.broadcast_to(c_front, (ws.shape[0], 25))
        return G.synthesis(g_params["synthesis"], ws, c)

    def loss_fn(mapper_params, w):
        w_hat = w + cfg.edit_strength * mapper(mapper_params, w)
        x_hat = render_front(w_hat)
        stats = {}
        loss = jnp.zeros((), jnp.float32)
        if cfg.clip_lambda > 0:
            l_clip = jnp.mean(clip_similarity_loss(clip_model, clip_params, x_hat, text_tokens))
            stats["loss_clip"] = l_clip
            loss = loss + cfg.clip_lambda * l_clip
        if cfg.id_lambda > 0 and embed_id is not None:
            x = jax.lax.stop_gradient(render_front(w))
            e_hat = embed_id(x_hat)
            e = jax.lax.stop_gradient(embed_id(x))
            e_hat = e_hat / jnp.linalg.norm(e_hat, axis=-1, keepdims=True)
            e = e / jnp.linalg.norm(e, axis=-1, keepdims=True)
            l_id = jnp.mean(1.0 - jnp.sum(e_hat * e, axis=-1))
            stats["loss_id"] = l_id
            loss = loss + cfg.id_lambda * l_id
        if cfg.latent_l2_lambda > 0:
            l_l2 = jnp.mean((w_hat - w) ** 2)
            stats["loss_l2_latent"] = l_l2
            loss = loss + cfg.latent_l2_lambda * l_l2
        stats["loss"] = loss
        return loss, stats

    def step(state: StyleClipState, w):
        (_, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.mapper_params, w)
        updates, opt_state = opt.update(grads, state.opt, state.mapper_params)
        new_params = optax.apply_updates(state.mapper_params, updates)
        return StyleClipState(state.step + 1, new_params, opt_state), stats

    return jax.jit(step, donate_argnums=(0,))


def optimize_latent(
    G, g_params: dict, clip_model: CLIP, clip_params: dict, tokens: jax.Array,
    latent_init: jax.Array,  # [1, num_ws, w_dim]
    steps: int = 300, lr: float = 0.1, l2_lambda: float = 0.008,
    mode: str = "edit", c: Optional[jax.Array] = None, log_every: int = 50,
):
    """StyleCLIP's latent-OPTIMIZATION mode (run_optimization.py:25-90):
    Adam directly on w+ with L = CLIPLoss(G(w), text) [+ l2_lambda*||w - w0||²
    in 'edit' mode], under the cosine lr ramp (get_lr :17-22). Returns the
    optimized latent."""
    c = (jnp.broadcast_to(jnp.asarray(render.CANONICAL_POSE_25), (1, 25))
         if c is None else c)
    w0 = jax.lax.stop_gradient(latent_init)

    def loss_fn(w):
        img = G.synthesis(g_params["synthesis"], w, c)
        l = jnp.mean(clip_similarity_loss(clip_model, clip_params, img, tokens))
        if mode == "edit":
            l = l + l2_lambda * jnp.sum((w - w0) ** 2)
        return l

    opt = optax.adam(1.0)  # lr folded into the schedule scale below
    state = opt.init(latent_init)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    @jax.jit
    def apply(w, state, g, lr_t):
        updates, state = opt.update(g, state, w)
        # per-step lr ramp: scale the unit-lr Adam update (torch sets
        # param_groups lr each step; this is the functional equivalent)
        return optax.apply_updates(
            w, jax.tree_util.tree_map(lambda u: u * lr_t, updates)), state

    import math as _math

    w = latent_init
    for i in range(steps):
        t = i / steps
        ramp = min(1.0, (1.0 - t) / 0.25)
        ramp = 0.5 - 0.5 * _math.cos(ramp * _math.pi)
        lr_t = lr * ramp * min(1.0, t / 0.05)
        loss, g = grad_fn(w)
        w, state = apply(w, state, g, lr_t)
        if log_every and i % log_every == 0:
            print(f"step {i}: loss {float(loss):.4f} lr {lr_t:.4f}")
    return w


def train_styleclip_mapper(
    G, g_params: dict, clip_model: CLIP, clip_params: dict, tokenizer,
    cfg: StyleClipConfig = StyleClipConfig(), mapper: Optional[LevelsMapper] = None,
    embed_id=None, steps: Optional[int] = None, seed: int = 0, log_every: int = 50,
):
    """Full coach loop (latents sampled on the fly). Returns (mapper, params)."""
    mapper = mapper or LevelsMapper()
    key = jax.random.PRNGKey(seed)
    state = init_styleclip_state(mapper, key, cfg)
    tokens = jnp.asarray(tokenizer.tokenize(
        [cfg.description], context_length=clip_model.cfg.context_length, truncate=True))
    step_fn = make_styleclip_step(G, g_params, mapper, clip_model, clip_params,
                                  tokens, cfg, embed_id)
    n_steps = cfg.max_steps if steps is None else steps
    for i in range(n_steps):
        key, sub = jax.random.split(key)
        w = sample_latents(G, g_params, cfg.batch_size, sub, cfg.truncation_psi)
        state, stats = step_fn(state, w)
        if log_every and i % log_every == 0:
            print(f"step {i}: " + " ".join(
                f"{k}={float(v):.4f}" for k, v in sorted(stats.items())))
    return mapper, state.mapper_params
