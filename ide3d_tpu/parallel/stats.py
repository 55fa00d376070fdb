"""Cross-device training statistics.

Replaces the reference's `training_stats` module (torch_utils/training_stats.py:56,
113,234): instead of rank-side buffers synced by explicit all-reduces, stats are
plain dicts of (sum, sumsq, count) reduced with `jax.lax.psum` INSIDE the jitted
step (free on ICI, overlapped by XLA) and collected host-side.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def psum_dict(stats: Dict[str, jax.Array], axis_name: str) -> Dict[str, jax.Array]:
    """All-reduce a dict of scalars across a mesh axis (use inside shard_map/pjit
    with a bound axis name)."""
    return {k: jax.lax.psum(v, axis_name) for k, v in stats.items()}


def scalar_moments(x: jax.Array) -> jax.Array:
    """Pack (count, sum, sumsq) for a tensor — the reference's accumulation triple
    (training_stats.py:56-101)."""
    x = x.astype(jnp.float32)
    return jnp.stack([jnp.asarray(x.size, jnp.float32), x.sum(), jnp.square(x).sum()])


def _promote_triples(stats):
    """Scalars -> (count, sum, sumsq) triples; pass triples through. Traced."""
    out = {}
    for name, t in stats.items():
        t = jnp.asarray(t)
        if t.ndim == 0:
            t = jnp.stack([jnp.ones((), jnp.float32), t.astype(jnp.float32),
                           jnp.square(t).astype(jnp.float32)])
        out[name] = t
    return out


@jax.jit
def _acc_init(stats):
    return _promote_triples(stats)


@jax.jit
def _acc_merge(acc, stats):
    p = _promote_triples(stats)
    return {**acc, **{k: (acc[k] + p[k]) if k in acc else p[k] for k in p}}


class StatsAccumulator:
    """Host-side collector (the reference's Collector, training_stats.py:113).

    Accumulates (count, sum, sumsq) triples returned from jitted steps and exposes
    mean/std. Values arriving from a sharded step have already been psum-reduced.

    The per-step accumulation is ONE jitted program (`_acc_merge`): the original
    eager form issued ~4 tiny device ops per stat per step (~30 dispatches/step
    at the flagship config), which on a tunneled backend was a measurable slice
    of the training-loop vs device-step gap (PERF.md round 5). Nothing is read
    back until `mean()`/`std()`/`as_dict()`.
    """

    def __init__(self):
        self._acc: Optional[Dict[str, jnp.ndarray]] = None

    def update(self, stats: Dict[str, jax.Array]):
        if self._acc is None:
            self._acc = _acc_init(dict(stats))
        else:
            # union merge (a new key, e.g. a lazy regularizer's stat, retraces
            # at most once per distinct key set)
            self._acc = _acc_merge(self._acc, dict(stats))

    def mean(self, name: str) -> float:
        c, s, _ = [float(v) for v in np.asarray(self._acc[name])]
        return s / max(c, 1.0)

    def std(self, name: str) -> float:
        import math

        c, s, ss = [float(v) for v in np.asarray(self._acc[name])]
        if c < 1:
            return 0.0
        m = s / c
        return math.sqrt(max(ss / c - m * m, 0.0))

    def as_dict(self) -> Dict[str, float]:
        return {k: self.mean(k) for k in (self._acc or {})}

    def reset(self):
        self._acc = None
