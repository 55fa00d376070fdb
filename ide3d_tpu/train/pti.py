"""Hybrid GAN inversion: w+ projector + PTI pivotal tuning.

Reference pipeline (inversion/scripts/run_pti.py:66 -> coaches/base_coach.py:22 ->
projectors/w_plus_projector_ide3d.py:24):
  1. projector: start from the encoder's w (initial_w) or w_avg; optimize w+ AND
     the per-layer noise buffers with Adam(first_inv_lr=5e-3) against a perceptual
     feature distance to the target + 1e5 * multi-scale noise autocorrelation
     regularization (w_plus_projector_ide3d.py:98-148); cosine lr rampdown +
     rampup and a decaying w-noise schedule (:100-110); noise buffers re-normalized
     to zero mean / unit variance after every step (:146-148); 450 steps
     (hyperparameters.py:22),
  2. pivotal tuning: freeze the pivot w, tune G's synthesis params with
     Adam(3e-4) on L2 + LPIPS (+ optional locality "ball-holder" regularizer,
     criteria/localitly_regulizer.py:9-59) until LPIPS <= 0.06 or 350 steps
     (hyperparameters.py:16-29). The ide3d_join_view variant adds a mirrored-view
     consistency term (single_id_coach.py:48-71): the same pivot must reconstruct
     the x-flipped target at the x-flipped camera label.

TPU design: both phases are optax loops over ONE jitted update step each; the
learning rate and w-noise scale are TRACED scalars (optax.inject_hyperparams), so
the ramp schedules never retrace. The projector's "600 mapped samples" w
statistics come from a single batched mapping call. The per-step early-stop
threshold is evaluated host-side between jitted steps (the loop count is
data-dependent, so it stays in Python — each step is one XLA program).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.generator import Ide3dGenerator
from . import losses as L


@dataclasses.dataclass(frozen=True)
class ProjectorConfig:
    num_steps: int = 450            # hyperparameters.first_inv_steps
    lr: float = 5e-3                # hyperparameters.first_inv_lr
    w_avg_samples: int = 600
    noise_reg_weight: float = 1e5   # regularize_noise_weight
    initial_noise_factor: float = 0.05
    lr_rampdown_length: float = 0.25
    lr_rampup_length: float = 0.05
    noise_ramp_length: float = 0.75
    optimize_noise: bool = True     # optimize per-layer noise buffers jointly


@dataclasses.dataclass(frozen=True)
class PtiConfig:
    max_steps: int = 350
    lr: float = 3e-4
    lpips_threshold: float = 0.06
    w_l2: float = 1.0               # pt_l2_lambda
    w_lpips: float = 1.0            # pt_lpips_lambda
    # locality ("ball holder") regularization, hyperparameters.py:7-12
    use_locality: bool = False
    locality_interval: int = 1
    locality_samples: int = 1       # latent_ball_num_of_samples
    regularizer_l2: float = 0.1
    regularizer_lpips: float = 0.1
    regularizer_alpha: float = 30.0
    # mirrored-view consistency (the ide3d_join_view coach, single_id_coach.py:66-71)
    join_view: bool = False


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
    # sum over ALL elements divided by the SAMPLE count (not jnp.mean over every
    # element, which would shrink w_std — and with it the exploration-noise
    # schedule — by sqrt(w_dim) ~ 22.6x): the reference computes
    # (sum((w - avg)^2) / num_samples) ** 0.5, w_plus_projector_ide3d.py:59.
    w_std = jnp.sqrt(jnp.sum(jnp.square(ws - w_avg)) / n)
    return w_avg, w_std


# ------------------------------------------------------------- noise machinery


def noise_buffer_paths(tree: dict, prefix=()) -> list:
    """Paths of every per-layer noise buffer in a synthesis params tree
    (the reference gathers 'noise_const' named buffers,
    w_plus_projector_ide3d.py:66)."""
    out = []
    for k, v in tree.items():
        if isinstance(v, dict):
            out.extend(noise_buffer_paths(v, prefix + (k,)))
        elif k == "noise_const":
            out.append(prefix + (k,))
    return out


def _tree_get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _tree_set(tree: dict, path, val) -> dict:
    """Functional nested-dict set (copies nodes along the path)."""
    if len(path) == 1:
        return {**tree, path[0]: val}
    return {**tree, path[0]: _tree_set(tree[path[0]], path[1:], val)}


def merge_noise(syn_params: dict, noise: dict) -> dict:
    out = syn_params
    for name, buf in noise.items():
        out = _tree_set(out, tuple(name.split(".")), buf)
    return out


def noise_regularization(noise: dict) -> jax.Array:
    """Multi-scale shift-autocorrelation penalty
    (w_plus_projector_ide3d.py:128-137): for each buffer, at each 2x avg-pooled
    scale down to 8^2, mean(n * roll(n, 1, x))^2 + mean(n * roll(n, 1, y))^2."""
    reg = jnp.zeros(())
    for buf in noise.values():
        n = buf[None, :, :, None]  # [1, H, W, 1]
        while True:
            reg = reg + jnp.mean(n * jnp.roll(n, 1, axis=2)) ** 2
            reg = reg + jnp.mean(n * jnp.roll(n, 1, axis=1)) ** 2
            if n.shape[1] <= 8:
                break
            n = jax.lax.reduce_window(
                n, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
    return reg


def normalize_noise(noise: dict) -> dict:
    """Project each buffer back to zero mean / unit variance
    (w_plus_projector_ide3d.py:146-148)."""
    out = {}
    for k, v in noise.items():
        v = v - v.mean()
        out[k] = v * jax.lax.rsqrt(jnp.mean(jnp.square(v)) + 1e-12)
    return out


def projector_schedule(step: int, cfg: ProjectorConfig, w_std: float):
    """Reference lr rampup/cosine-rampdown + decaying w-noise scale
    (w_plus_projector_ide3d.py:100-110). Host-side floats -> traced scalars."""
    t = step / cfg.num_steps
    w_noise_scale = (
        w_std * cfg.initial_noise_factor
        * max(0.0, 1.0 - t / cfg.noise_ramp_length) ** 2
    )
    lr_ramp = min(1.0, (1.0 - t) / cfg.lr_rampdown_length)
    lr_ramp = 0.5 - 0.5 * math.cos(lr_ramp * math.pi)
    lr_ramp = lr_ramp * min(1.0, t / cfg.lr_rampup_length)
    return cfg.lr * lr_ramp, w_noise_scale


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
    return_noise: bool = False,
):
    """Optimize w+ (and the per-layer noise buffers) toward target
    (contract: w_plus_projector_ide3d.py:24-151). Returns ws [1, num_ws, w_dim]
    (and the optimized noise buffers when return_noise)."""
    key = jax.random.PRNGKey(0) if key is None else key
    k_stats, k_noise_init, k_loop = jax.random.split(key, 3)

    w_avg, w_std = compute_w_stats(G, g_params, c, k_stats, cfg.w_avg_samples)
    if initial_w is None:
        w = jnp.repeat(w_avg[:, None, :], G.num_ws, axis=1)
    else:
        w = initial_w

    syn_params = g_params["synthesis"]
    noise = {}
    if cfg.optimize_noise:
        # Re-initialize every noise buffer to N(0,1) and optimize it jointly
        # (w_plus_projector_ide3d.py:97-99).
        for i, path in enumerate(noise_buffer_paths(syn_params)):
            buf = _tree_get(syn_params, path)
            noise[".".join(path)] = jax.random.normal(
                jax.random.fold_in(k_noise_init, i), buf.shape, jnp.float32
            )

    target_feats = [jax.lax.stop_gradient(f) for f in feats_fn(target_img)]
    opt = optax.inject_hyperparams(optax.adam)(learning_rate=cfg.lr, b1=0.9, b2=0.999)
    opt_state = opt.init({"w": w, "noise": noise})

    def loss_fn(varz, rng, w_noise_scale):
        ws = varz["w"] + jax.random.normal(rng, varz["w"].shape) * w_noise_scale
        sp = merge_noise(syn_params, varz["noise"]) if varz["noise"] else syn_params
        img = G.synthesis(sp, ws, c, noise_mode="const")
        fx = feats_fn(img)
        dist = sum(jnp.mean(jnp.square(a - b)) for a, b in zip(fx, target_feats))
        reg = noise_regularization(varz["noise"]) if varz["noise"] else jnp.zeros(())
        return dist + cfg.noise_reg_weight * reg, dist

    @jax.jit
    def step(varz, opt_state, rng, lr, w_noise_scale):
        opt_state.hyperparams["learning_rate"] = lr
        (loss, dist), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            varz, rng, w_noise_scale
        )
        updates, opt_state = opt.update(grads, opt_state, varz)
        varz = optax.apply_updates(varz, updates)
        varz = {**varz, "noise": normalize_noise(varz["noise"])}
        return varz, opt_state, dist

    varz = {"w": w, "noise": noise}
    w_std_f = float(w_std)
    for i in range(cfg.num_steps):
        lr, w_noise_scale = projector_schedule(i, cfg, w_std_f)
        varz, opt_state, dist = step(
            varz, opt_state, jax.random.fold_in(k_loop, i),
            jnp.asarray(lr, jnp.float32), jnp.asarray(w_noise_scale, jnp.float32),
        )
        if verbose and i % 50 == 0:
            print(f"projector step {i}: dist {float(dist):.4f}")
    if return_noise:
        return varz["w"], varz["noise"]
    return varz["w"]


# --------------------------------------------------------------- pivotal tuning


def flip_label_25(c: jax.Array) -> jax.Array:
    """x-mirror a 25-dim camera label (dataset xflip relabeling convention,
    training/dataset_seg.py:387: label[[1,2,3,4,8]] *= -1)."""
    sign = np.ones(25, np.float32)
    sign[[1, 2, 3, 4, 8]] = -1.0
    return c * jnp.asarray(sign)


def locality_loss(
    G: Ide3dGenerator,
    syn_params,
    orig_g_params,
    w_pivot: jax.Array,
    c: jax.Array,
    key: jax.Array,
    cfg: PtiConfig,
    lpips_fn: Callable,
) -> jax.Array:
    """Space_Regulizer.ball_holder_loss (criteria/localitly_regulizer.py:27-59):
    sample latents, move them to radius alpha around the pivot, and require the
    tuned G to match the FROZEN G there (L2 + LPIPS)."""
    z = jax.random.normal(key, (cfg.locality_samples, G.cfg.z_dim))
    cs = jnp.broadcast_to(c[:1], (cfg.locality_samples, c.shape[-1]))
    w_samples = G.mapping(orig_g_params["mapping"], z, cs, truncation_psi=0.5)
    # morphed w: fixed_w + alpha * dir/||dir|| (localitly_regulizer.py:15-22)
    direction = w_samples - w_pivot
    norm = jnp.sqrt(jnp.sum(jnp.square(direction), axis=(1, 2), keepdims=True) + 1e-12)
    w_moved = w_pivot + cfg.regularizer_alpha * direction / norm

    new_img = G.synthesis(syn_params, w_moved, cs, noise_mode="none")
    old_img = jax.lax.stop_gradient(
        G.synthesis(orig_g_params["synthesis"], w_moved, cs, noise_mode="none")
    )
    loss = jnp.zeros(())
    if cfg.regularizer_l2 > 0:
        loss = loss + cfg.regularizer_l2 * L.l2(old_img, new_img)
    if cfg.regularizer_lpips > 0:
        # tuned output FIRST: lpips_fn follows the multiscale_feature_loss
        # convention of stop-gradienting its second (target) argument, so
        # (old, new) would zero the gradient into the tuned synthesis params
        loss = loss + cfg.regularizer_lpips * lpips_fn(new_img, old_img)
    return loss


def pivotal_tune(
    G: Ide3dGenerator,
    g_params,
    w_pivot: jax.Array,  # [1, num_ws, 512]
    target_img: jax.Array,
    c: jax.Array,
    cfg: PtiConfig = PtiConfig(),
    lpips_fn: Optional[Callable] = None,  # (x, y) -> scalar; None = pyramid L2
    target_img_flip: Optional[jax.Array] = None,  # join_view mirrored target
    key: jax.Array = None,
    verbose: bool = False,
):
    """Tune the generator around the pivot (contract: base_coach.py:22,
    single_id_coach.py:60-89, hyperparameters.py:16-29). Returns tuned g_params.

    join_view (cfg.join_view): adds the mirrored-view loss — the pivot rendered at
    the x-flipped camera must match the x-flipped target (single_id_coach.py:66-71).
    Locality (cfg.use_locality): ball-holder regularization against the frozen G.
    """
    key = jax.random.PRNGKey(0) if key is None else key
    w_pivot = jax.lax.stop_gradient(w_pivot)
    orig_g_params = jax.tree_util.tree_map(jax.lax.stop_gradient, g_params)
    syn_params = g_params["synthesis"]
    # Tune PARAMETERS only: noise_const buffers stay frozen (the reference's
    # Adam runs over G.parameters(); noise consts are registered buffers and
    # keep whatever state the projector left them in, base_coach.py:118).
    frozen = {tuple(p) for p in noise_buffer_paths(syn_params)}

    def _is_trainable(path_tuple):
        return path_tuple not in frozen

    def _mask_tree(tree, prefix=()):
        if isinstance(tree, dict):
            return {k: _mask_tree(v, prefix + (k,)) for k, v in tree.items()}
        return _is_trainable(prefix)

    opt = optax.masked(optax.adam(cfg.lr), _mask_tree(syn_params))
    opt_state = opt.init(syn_params)

    if lpips_fn is None:
        def lpips_fn(x, y):
            return L.multiscale_feature_loss(default_pyramid_feats, x, y)

    if cfg.join_view:
        c_flip = flip_label_25(c)
        if target_img_flip is None:
            target_img_flip = target_img[:, :, ::-1, :]

    def recon_loss(syn_params, tgt, cc):
        img = G.synthesis(syn_params, w_pivot, cc, noise_mode="const")
        lp = lpips_fn(img, tgt)
        loss = L.l2(img, tgt) * cfg.w_l2 + lp * cfg.w_lpips
        return loss, lp

    def loss_fn(syn_params, rng, use_locality):
        # the aux lp is the UNWEIGHTED MAIN-VIEW LPIPS — the quantity the
        # reference's early stop compares against LPIPS_value_threshold
        # (single_id_coach.py:75); join_view adds the mirrored loss but must
        # not inflate the stopping statistic
        loss, lp = recon_loss(syn_params, target_img, c)
        if cfg.join_view:
            loss_f, _ = recon_loss(syn_params, target_img_flip, c_flip)
            loss = loss + loss_f
        if cfg.use_locality:
            loc = locality_loss(
                G, syn_params, orig_g_params, w_pivot, c, rng, cfg, lpips_fn
            )
            loss = loss + use_locality * loc
        return loss, lp

    @jax.jit
    def step(syn_params, opt_state, rng, use_locality):
        (loss, lp), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            syn_params, rng, use_locality
        )
        updates, opt_state = opt.update(grads, opt_state, syn_params)
        return optax.apply_updates(syn_params, updates), opt_state, loss, lp

    for i in range(cfg.max_steps):
        use_loc = 1.0 if (cfg.use_locality and i % cfg.locality_interval == 0) else 0.0
        syn_params, opt_state, loss, lp = step(
            syn_params, opt_state, jax.random.fold_in(key, i),
            jnp.asarray(use_loc, jnp.float32),
        )
        lp_val = float(lp)
        if verbose and i % 25 == 0:
            print(f"pti step {i}: loss {float(loss):.4f} lpips {lp_val:.4f}")
        if lp_val <= cfg.lpips_threshold:
            break

    return {**g_params, "synthesis": syn_params}
