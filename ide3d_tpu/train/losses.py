"""Loss library for encoder training / inversion.

Reference loss inventory (apps/train_hybrid_encoder.py:271-334, inversion/criteria/):
w-space smooth-L1 x50, L2/MSE, BiSeNet cross-entropy, cycle smooth-L1, VGG19
perceptual, LPIPS(VGG16), ArcFace ID. The perceptual/ID losses depend on imported
torch CNN weights (io/torch_import.py); each exposes a `FeatureLossFn` interface so
the training steps stay agnostic to which backbone provides features.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def smooth_l1(x: jax.Array, y: jax.Array, beta: float = 1.0) -> jax.Array:
    """torch F.smooth_l1_loss (mean reduction)."""
    d = jnp.abs(x - y)
    return jnp.mean(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta))


def l2(x: jax.Array, y: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(x - y))


def cross_entropy_seg(logits: jax.Array, target_ids: jax.Array) -> jax.Array:
    """Per-pixel CE, channels-last logits [B,H,W,C], integer targets [B,H,W]
    (the BiSeNet supervision, apps/train_hybrid_encoder.py:280-283)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, target_ids[..., None].astype(jnp.int32), axis=-1)
    return jnp.mean(nll)


def multiscale_feature_loss(
    feats_fn: Callable[[jax.Array], list],
    x: jax.Array,
    y: jax.Array,
    stop_target_grad: bool = True,
) -> jax.Array:
    """Generic perceptual distance: mean L2 over a list of feature maps.

    With a VGG16/VGG19 feature extractor this reproduces the reference's
    calc_vgg_loss (apps/train_hybrid_encoder.py:120-152) / LPIPS-style losses."""
    fx = feats_fn(x)
    fy = feats_fn(y)
    if stop_target_grad:
        fy = [jax.lax.stop_gradient(f) for f in fy]
    return sum(jnp.mean(jnp.square(a - b)) for a, b in zip(fx, fy)) / len(fx)


def cosine_id_loss(
    embed_fn: Callable[[jax.Array], jax.Array], x: jax.Array, y: jax.Array
) -> jax.Array:
    """ArcFace-style identity loss: 1 - cos(embed(x), embed(y))
    (inversion/criteria/id_loss.py:8-48)."""
    ex = embed_fn(x)
    ey = jax.lax.stop_gradient(embed_fn(y))
    ex = ex / (jnp.linalg.norm(ex, axis=-1, keepdims=True) + 1e-8)
    ey = ey / (jnp.linalg.norm(ey, axis=-1, keepdims=True) + 1e-8)
    return jnp.mean(1.0 - jnp.sum(ex * ey, axis=-1))
