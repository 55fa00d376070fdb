"""PPL: perceptual path length over w interpolations
(contract: metrics/perceptual_path_length.py:94-131; ppl2_wend = w-space, endpoints)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import render
from .metric_utils import MetricOptions


def compute_ppl(opts: MetricOptions, epsilon: float = 1e-4, space: str = "w",
                crop: bool = False) -> float:
    G, params = opts.G, opts.g_params
    det, dp = opts.detector, opts.detector_params
    rs = np.random.RandomState(opts.seed)
    B = opts.batch_size

    @jax.jit
    def pair_distance(params, dp, z0, z1, c, t):
        ws0 = G.mapping(params["mapping"], z0, c)
        ws1 = G.mapping(params["mapping"], z1, c)
        # w-space lerp at t and t+eps
        wt0 = ws0 + (ws1 - ws0) * t[:, None, None]
        wt1 = ws0 + (ws1 - ws0) * (t + epsilon)[:, None, None]
        img0 = G.synthesis(params["synthesis"], wt0, c)
        img1 = G.synthesis(params["synthesis"], wt1, c)
        f0 = det(dp, img0)
        f1 = det(dp, img1)
        return jnp.sum(jnp.square(f0 - f1), axis=-1) / epsilon**2

    dists = []
    done = 0
    while done < opts.num_items:
        z0 = jnp.asarray(rs.randn(B, G.cfg.z_dim), jnp.float32)
        z1 = jnp.asarray(rs.randn(B, G.cfg.z_dim), jnp.float32)
        c = jnp.broadcast_to(jnp.asarray(render.CANONICAL_POSE_25), (B, 25))
        t = jnp.asarray(rs.randint(0, 2, B).astype(np.float32))  # endpoints (wend)
        d = pair_distance(params, dp, z0, z1, c, t)
        dists.append(np.asarray(d))
        done += B

    dists = np.concatenate(dists)[: opts.num_items]
    # reference filters outliers outside [1%, 99%] quantiles (ppl.py:121-126)
    lo, hi = np.percentile(dists, [1, 99])
    return float(dists[(dists >= lo) & (dists <= hi)].mean())
