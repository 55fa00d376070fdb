"""Hybrid GAN inversion: w+ projector + PTI pivotal tuning.

Reference pipeline (inversion/scripts/run_pti.py:66 -> coaches/base_coach.py:22 ->
projectors/w_plus_projector_ide3d.py:24):
  1. projector: start from the encoder's w (initial_w) or w_avg; optimize w+ (and
     per-layer noise strengths) with Adam(5e-3) against a perceptual feature
     distance to the target + 1e5 * noise regularization; 450 steps,
  2. pivotal tuning: freeze the pivot w, tune G's synthesis params with Adam(3e-4)
     on L2 + LPIPS (optionally a locality regularizer) until LPIPS <= 0.06 or 350
     steps (inversion/configs/hyperparameters.py:16-23).

TPU design: both phases are optax loops over ONE jitted update step each; the
projector's "600 mapped samples" w statistics come from a single batched mapping
call. The per-step early-stop threshold is evaluated host-side between jitted steps
(the loop count is data-dependent, so it stays in Python — each step is one XLA
program, no recompiles).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.generator import Ide3dGenerator
from . import losses as L


@dataclasses.dataclass(frozen=True)
class ProjectorConfig:
    num_steps: int = 450
    lr: float = 5e-3
    w_avg_samples: int = 600
    noise_reg_weight: float = 1e5
    initial_noise_factor: float = 0.05


@dataclasses.dataclass(frozen=True)
class PtiConfig:
    max_steps: int = 350
    lr: float = 3e-4
    lpips_threshold: float = 0.06
    w_l2: float = 1.0
    w_lpips: float = 1.0


def default_pyramid_feats(img: jax.Array) -> list:
    """Fallback perceptual features (multi-scale image pyramid) used until the
    VGG16 weights are imported; same call signature as a VGG feature extractor."""
    feats = [img]
    x = img
    for _ in range(3):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H // 2, W // 2, C), "bilinear")
        feats.append(x)
    return feats


def compute_w_stats(
    G: Ide3dGenerator, g_params, c: jax.Array, key: jax.Array, n: int = 600
) -> Tuple[jax.Array, jax.Array]:
    """w_avg/w_std from n mapped samples (w_plus_projector_ide3d.py:54-60)."""
    z = jax.random.normal(key, (n, G.cfg.z_dim))
    cs = jnp.broadcast_to(c[:1], (n, c.shape[-1]))
    ws = G.mapping(g_params["mapping"], z, cs, broadcast=False)
    w_avg = ws.mean(axis=0, keepdims=True)
    w_std = jnp.sqrt(jnp.mean(jnp.square(ws - w_avg)))
    return w_avg, w_std


def project_w_plus(
    G: Ide3dGenerator,
    g_params,
    target_img: jax.Array,  # [1, R, R, 3] in [-1, 1]
    c: jax.Array,  # [1, 25]
    cfg: ProjectorConfig = ProjectorConfig(),
    initial_w: Optional[jax.Array] = None,  # [1, num_ws, 512] encoder warm start
    feats_fn: Callable = default_pyramid_feats,
    key: jax.Array = None,
    verbose: bool = False,
) -> jax.Array:
    """Optimize w+ toward target (contract: w_plus_projector_ide3d.py:24-151).
    Returns ws [1, num_ws, w_dim]."""
    key = jax.random.PRNGKey(0) if key is None else key
    k_stats, k_loop = jax.random.split(key)

    if initial_w is None:
        w_avg, _ = compute_w_stats(G, g_params, c, k_stats, cfg.w_avg_samples)
        w = jnp.repeat(w_avg[:, None, :], G.num_ws, axis=1)
    else:
        w = initial_w

    target_feats = [jax.lax.stop_gradient(f) for f in feats_fn(target_img)]
    opt = optax.adam(cfg.lr)
    opt_state = opt.init(w)

    def loss_fn(w, rng):
        img = G.synthesis(g_params["synthesis"], w, c, noise_mode="const")
        fx = feats_fn(img)
        dist = sum(jnp.mean(jnp.square(a - b)) for a, b in zip(fx, target_feats))
        return dist

    @jax.jit
    def step(w, opt_state, rng):
        loss, grads = jax.value_and_grad(loss_fn)(w, rng)
        updates, opt_state = opt.update(grads, opt_state, w)
        return optax.apply_updates(w, updates), opt_state, loss

    for i in range(cfg.num_steps):
        w, opt_state, loss = step(w, opt_state, jax.random.fold_in(k_loop, i))
        if verbose and i % 50 == 0:
            print(f"projector step {i}: dist {float(loss):.4f}")
    return w


def pivotal_tune(
    G: Ide3dGenerator,
    g_params,
    w_pivot: jax.Array,  # [1, num_ws, 512]
    target_img: jax.Array,
    c: jax.Array,
    cfg: PtiConfig = PtiConfig(),
    lpips_fn: Optional[Callable] = None,  # (x, y) -> scalar; None = pyramid L2
    verbose: bool = False,
):
    """Tune the generator around the pivot (contract: base_coach.py:22,
    single_id_coach.py:60-89, hyperparameters.py:16-23). Returns tuned g_params."""
    w_pivot = jax.lax.stop_gradient(w_pivot)
    opt = optax.adam(cfg.lr)
    syn_params = g_params["synthesis"]
    opt_state = opt.init(syn_params)

    if lpips_fn is None:
        def lpips_fn(x, y):
            return L.multiscale_feature_loss(default_pyramid_feats, x, y)

    def loss_fn(syn_params):
        img = G.synthesis(syn_params, w_pivot, c, noise_mode="const")
        l2 = L.l2(img, target_img) * cfg.w_l2
        lp = lpips_fn(img, target_img) * cfg.w_lpips
        return l2 + lp, lp

    @jax.jit
    def step(syn_params, opt_state):
        (loss, lp), grads = jax.value_and_grad(loss_fn, has_aux=True)(syn_params)
        updates, opt_state = opt.update(grads, opt_state, syn_params)
        return optax.apply_updates(syn_params, updates), opt_state, loss, lp

    for i in range(cfg.max_steps):
        syn_params, opt_state, loss, lp = step(syn_params, opt_state)
        lp_val = float(lp)
        if verbose and i % 25 == 0:
            print(f"pti step {i}: loss {float(loss):.4f} lpips {lp_val:.4f}")
        if lp_val <= cfg.lpips_threshold:
            break

    return {**g_params, "synthesis": syn_params}
