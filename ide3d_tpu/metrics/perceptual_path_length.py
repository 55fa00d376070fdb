"""PPL: perceptual path length over latent interpolations.

Contract: metrics/perceptual_path_length.py:35-131. The registered ppl2_wend
config (metric_main.py:104-105) is: num_samples=50k, epsilon=1e-4, space='w',
sampling='end', crop=False, batch_size=2, labels drawn from the DATASET pose
distribution (metric_utils.iterate_random_labels :57-67). Faithfully mirrored
here:
  * sampling 'end' -> t = 0; 'full' -> t ~ U[0,1)  (ppl.py:50),
  * space 'w' -> lerp between mapped w+; 'z' -> slerp in z then map (:55-61),
  * fresh noise per pair, SHARED between the t and t+eps renders (the reference
    randomizes the noise buffers once per forward, :64-66),
  * optional face center-crop rows [3/8,7/8), cols [2/8,6/8) (:71-74),
  * mean-pool downsample to <=256 before the detector (:77-79),
  * 1%/99% quantile outlier filter with lower/higher interpolation (:121-126).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import render
from .metric_utils import MetricOptions


def _slerp(a, b, t):
    """Spherical interpolation (ppl.py:21-31)."""
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    d = jnp.sum(a * b, axis=-1, keepdims=True)
    p = t * jnp.arccos(jnp.clip(d, -1.0, 1.0))
    c = b - d * a
    c = c / jnp.linalg.norm(c, axis=-1, keepdims=True)
    out = a * jnp.cos(p) + c * jnp.sin(p)
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def _crop_and_downsample(img: jax.Array, crop: bool) -> jax.Array:
    """Face center-crop + mean-pool to <=256 (ppl.py:70-79). NHWC."""
    if crop:
        c = img.shape[1] // 8
        img = img[:, c * 3 : c * 7, c * 2 : c * 6, :]
    factor = max(img.shape[1] // 256, 1)
    if factor > 1:
        B, H, W, C = img.shape
        img = img.reshape(B, H // factor, factor, W // factor, factor, C).mean(
            axis=(2, 4)
        )
    return img


def compute_ppl(
    opts: MetricOptions,
    epsilon: float = 1e-4,
    space: str = "w",
    sampling: str = "end",
    crop: bool = False,
) -> float:
    assert space in ("z", "w") and sampling in ("full", "end")
    G, params = opts.G, opts.g_params
    det, dp = opts.detector, opts.detector_params
    rs = np.random.RandomState(opts.seed)
    B = opts.batch_size

    @jax.jit
    def pair_distance(params, dp, z0, z1, c, t, noise_key):
        if space == "w":
            ws0 = G.mapping(params["mapping"], z0, c)
            ws1 = G.mapping(params["mapping"], z1, c)
            wt0 = ws0 + (ws1 - ws0) * t[:, None, None]
            wt1 = ws0 + (ws1 - ws0) * (t[:, None, None] + epsilon)
        else:
            zt0 = _slerp(z0, z1, t[:, None])
            zt1 = _slerp(z0, z1, t[:, None] + epsilon)
            wt0 = G.mapping(params["mapping"], zt0, c)
            wt1 = G.mapping(params["mapping"], zt1, c)
        # fresh noise per pair, shared between the two renders (same rng key)
        img0 = G.synthesis(params["synthesis"], wt0, c, noise_mode="random",
                           rng=noise_key)
        img1 = G.synthesis(params["synthesis"], wt1, c, noise_mode="random",
                           rng=noise_key)
        f0 = det(dp, _crop_and_downsample(img0, crop))
        f1 = det(dp, _crop_and_downsample(img1, crop))
        return jnp.sum(jnp.square(f0 - f1), axis=-1) / epsilon**2

    def sample_labels(n):
        if opts.dataset is not None and getattr(opts.dataset, "label_dim", 0) == 25:
            idx = rs.randint(len(opts.dataset), size=n)
            return jnp.asarray(np.stack([opts.dataset[int(i)][-1] for i in idx]))
        return jnp.broadcast_to(jnp.asarray(render.CANONICAL_POSE_25), (n, 25))

    dists = []
    done = 0
    step = 0
    while done < opts.num_items:
        z0 = jnp.asarray(rs.randn(B, G.cfg.z_dim), jnp.float32)
        z1 = jnp.asarray(rs.randn(B, G.cfg.z_dim), jnp.float32)
        c = sample_labels(B)
        if sampling == "end":
            t = jnp.zeros((B,), jnp.float32)
        else:
            t = jnp.asarray(rs.rand(B).astype(np.float32))
        d = pair_distance(params, dp, z0, z1, c, t,
                          jax.random.PRNGKey(opts.seed * 7919 + step))
        dists.append(np.asarray(d))
        done += B
        step += 1
        if opts.progress:
            opts.progress(done, opts.num_items)

    dists = np.concatenate(dists)[: opts.num_items]
    # 1%/99% quantile outlier filter, lower/higher interpolation (ppl.py:121-126)
    lo = np.percentile(dists, 1, method="lower")
    hi = np.percentile(dists, 99, method="higher")
    return float(dists[(dists >= lo) & (dists <= hi)].mean())
