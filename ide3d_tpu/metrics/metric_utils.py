"""Feature-statistics plumbing for the metric suite.

Reference: metrics/metric_utils.py — FeatureStats (:97-162, raw feature bank +
running mean/cov), compute_feature_stats_for_dataset (:209, disk-cached),
compute_feature_stats_for_generator (:262, z->G->detector), rank-sharded with NCCL
all-gathers (:124-134).

TPU design: extraction is ONE jitted (detector ∘ generator) program over batches
sharded on the mesh 'data' axis; features come back to host as a numpy bank (all
metrics need O(N) features at most once). Disk cache keyed by
(dataset/extractor/resolution) hash like the reference's dataset-stat cache.
"""

from __future__ import annotations

import dataclasses
import hashlib
import os
import pickle
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np


class FeatureStats:
    """Raw feature bank + running moments (contract: metric_utils.py:97-162)."""

    def __init__(self, capture_all: bool = False, capture_mean_cov: bool = False,
                 max_items: Optional[int] = None):
        self.capture_all = capture_all
        self.capture_mean_cov = capture_mean_cov
        self.max_items = max_items
        self.num_items = 0
        self.num_features = None
        self.all_features = []
        self.raw_mean = None
        self.raw_cov = None

    def set_num_features(self, num_features: int):
        if self.num_features is None:
            self.num_features = num_features
            self.raw_mean = np.zeros(num_features, np.float64)
            self.raw_cov = np.zeros((num_features, num_features), np.float64)
        else:
            assert num_features == self.num_features

    def is_full(self) -> bool:
        return self.max_items is not None and self.num_items >= self.max_items

    def append(self, x: np.ndarray):
        x = np.asarray(x, np.float32)
        assert x.ndim == 2
        if self.max_items is not None and self.num_items + x.shape[0] > self.max_items:
            if self.is_full():
                return
            x = x[: self.max_items - self.num_items]
        self.set_num_features(x.shape[1])
        self.num_items += x.shape[0]
        if self.capture_all:
            self.all_features.append(x)
        if self.capture_mean_cov:
            x64 = x.astype(np.float64)
            self.raw_mean += x64.sum(axis=0)
            self.raw_cov += x64.T @ x64

    def get_all(self) -> np.ndarray:
        assert self.capture_all
        return np.concatenate(self.all_features, axis=0)

    def get_mean_cov(self):
        assert self.capture_mean_cov
        mean = self.raw_mean / self.num_items
        cov = self.raw_cov / self.num_items - np.outer(mean, mean)
        return mean, cov

    # ------------------------------------------------------------------- cache

    def save(self, path: str):
        with open(path, "wb") as f:
            pickle.dump(self.__dict__, f)

    @classmethod
    def load(cls, path: str) -> "FeatureStats":
        with open(path, "rb") as f:
            state = pickle.load(f)
        obj = cls()
        obj.__dict__.update(state)
        return obj


@dataclasses.dataclass
class MetricOptions:
    """Everything a metric needs (the reference's MetricOptions,
    metric_utils.py:23-40, minus torch/DDP plumbing)."""

    G: object = None  # Ide3dGenerator
    g_params: dict = None
    dataset: object = None  # indexable -> (img uint8 HWC, [seg], label)
    detector: object = None  # FeatureExtractor
    detector_params: dict = None
    num_items: int = 1000
    # Real-side stat cap (reference max_real, metric_main.py:86-148): -1 =
    # follow num_items (back-compat default), None = the FULL dataset
    # (fid50k_full semantics), int = explicit cap (kid/pr presets).
    max_real: Optional[int] = -1
    batch_size: int = 8
    cache_dir: Optional[str] = None
    seed: int = 0
    progress: Optional[Callable[[int, int], None]] = None
    # Optional jax.sharding.Mesh: shards generator+detector batches over the
    # 'data' axis (the reference's NCCL-rank feature sharding,
    # metrics/metric_utils.py:124-134, as one pjit program).
    mesh: object = None
    # conditional-render evaluation mode (reference metric_utils.py:70-81):
    # generator metrics computed with cond_img drawn from the dataset (needs
    # GeneratorConfig.use_encoder).
    cond_render: bool = False


def _cache_path(opts: MetricOptions, tag: str,
                capture_all: bool, capture_mean_cov: bool) -> Optional[str]:
    if opts.cache_dir is None:
        return None
    # capture flags are part of the key: a mean/cov-only cache entry (FID)
    # cannot serve a raw-feature-bank consumer (KID/PR) — get_all() on it
    # would assert
    n_key = _resolved_max_real(opts) if tag == "dataset" else opts.num_items
    key = (f"{tag}-{type(opts.detector).__name__}-{n_key}"
           f"-{int(capture_all)}{int(capture_mean_cov)}")
    if opts.dataset is not None:
        # dataset IDENTITY is part of the key: the same path loaded with
        # xflip/resolution/length differences yields different real statistics
        # (e.g. train_gan's metric path pins xflip=False while the training
        # loader mirrors — a path-only key would silently serve stale
        # mirrored stats)
        if hasattr(opts.dataset, "_path"):
            key += "-" + os.path.basename(str(opts.dataset._path))
        for attr in ("xflip", "resolution"):
            if hasattr(opts.dataset, attr):
                key += f"-{attr}{getattr(opts.dataset, attr)}"
        try:
            key += f"-n{len(opts.dataset)}"
        except TypeError:
            pass
    h = hashlib.md5(key.encode()).hexdigest()[:12]
    os.makedirs(opts.cache_dir, exist_ok=True)
    return os.path.join(opts.cache_dir, f"stats-{h}.pkl")


def _resolved_max_real(opts: MetricOptions) -> Optional[int]:
    """Real-side item cap: the reference's max_real semantics
    (metrics/metric_utils.py:216, metric_main.py:86-148)."""
    if opts.max_real == -1:
        return opts.num_items
    return opts.max_real  # None = full dataset


def compute_feature_stats_for_dataset(
    opts: MetricOptions, capture_all=False, capture_mean_cov=True
) -> FeatureStats:
    cache = _cache_path(opts, "dataset", capture_all, capture_mean_cov)
    if cache and os.path.exists(cache):
        return FeatureStats.load(cache)

    cap = _resolved_max_real(opts)
    stats = FeatureStats(capture_all, capture_mean_cov, max_items=cap)
    det = jax.jit(lambda p, x: opts.detector(p, x))
    B = opts.batch_size
    n = len(opts.dataset) if cap is None else min(len(opts.dataset), cap)
    i = 0
    while not stats.is_full() and i < n:
        imgs = []
        for j in range(i, min(i + B, n)):
            item = opts.dataset[j]
            img = item[0]
            imgs.append(img.astype(np.float32) / 127.5 - 1.0)
        x = jnp.asarray(np.stack(imgs))
        feats = det(opts.detector_params, x)
        stats.append(np.asarray(feats))
        i += B
        if opts.progress:
            opts.progress(i, n)

    if cache:
        stats.save(cache)
    return stats


# jitted (generator -> detector) extraction programs, memoized across calls:
# repeated metric evaluation (train_gan per-snapshot --metrics) would otherwise
# re-trace the full G forward at every snapshot. Keyed by object identity;
# entries hold the keyed objects strongly so ids can't be recycled while the
# entry lives, and the cache is a small LRU so long-lived processes that churn
# through many generators (the test suite, a multi-network render service)
# don't accumulate compiled programs without bound.
_GEN_DETECT_CACHE: "dict" = {}
_GEN_DETECT_CACHE_MAX = 8


def _jitted_gen_detect(G, detector, mesh, cond_render: bool):
    key = (id(G), id(detector), id(mesh), cond_render)
    hit = _GEN_DETECT_CACHE.get(key)
    if hit is not None:
        _GEN_DETECT_CACHE[key] = _GEN_DETECT_CACHE.pop(key)  # LRU touch
        return hit[3]

    if cond_render:
        def _gen_and_detect(params, dp, z, c, cond):
            img = G(params, z, c, cond_img=cond)
            return detector(dp, img)
    else:
        def _gen_and_detect(params, dp, z, c):
            img = G(params, z, c)
            return detector(dp, img)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        n_in = 5 if cond_render else 4
        fn = jax.jit(
            _gen_and_detect,
            in_shardings=(repl, repl) + (data,) * (n_in - 2),
            out_shardings=data,
        )
    else:
        fn = jax.jit(_gen_and_detect)
    while len(_GEN_DETECT_CACHE) >= _GEN_DETECT_CACHE_MAX:
        _GEN_DETECT_CACHE.pop(next(iter(_GEN_DETECT_CACHE)))
    _GEN_DETECT_CACHE[key] = (G, detector, mesh, fn)
    return fn


def compute_feature_stats_for_generator(
    opts: MetricOptions, capture_all=False, capture_mean_cov=True,
    label_sampler: Optional[Callable[[int, np.random.RandomState], np.ndarray]] = None,
) -> FeatureStats:
    from .. import render

    stats = FeatureStats(capture_all, capture_mean_cov, max_items=opts.num_items)
    G, params = opts.G, opts.g_params
    rs = np.random.RandomState(opts.seed)

    if opts.cond_render:
        # conditional-render mode (metric_utils.py:70-81 + :270-287): G is driven
        # by condition IMAGES drawn from the dataset through its built-in encoder
        # (G(z=..., cond_img=...) pathway, networks.py:1244-1251).
        assert opts.dataset is not None, "cond_render needs a dataset"
        assert getattr(G.cfg, "use_encoder", False), (
            "cond_render requires GeneratorConfig.use_encoder"
        )

    gen_and_detect = _jitted_gen_detect(G, opts.detector, opts.mesh,
                                        opts.cond_render)
    if opts.mesh is not None:
        from ..parallel import replicate

        params = replicate(opts.mesh, params)
        dp_repl = replicate(opts.mesh, opts.detector_params)
    else:
        dp_repl = opts.detector_params

    B = opts.batch_size
    while not stats.is_full():
        z = jnp.asarray(rs.randn(B, G.cfg.z_dim), jnp.float32)
        if label_sampler is not None:
            c = jnp.asarray(label_sampler(B, rs), jnp.float32)
        elif opts.dataset is not None and getattr(opts.dataset, "label_dim", 0) == 25:
            idx = rs.randint(len(opts.dataset), size=B)
            c = jnp.asarray(np.stack([opts.dataset[int(i)][-1] for i in idx]))
        else:
            c = jnp.broadcast_to(jnp.asarray(render.CANONICAL_POSE_25), (B, 25))
        if opts.cond_render:
            idx = rs.randint(len(opts.dataset), size=B)
            cond = jnp.asarray(
                np.stack([
                    np.asarray(opts.dataset[int(i)][0], np.float32) / 127.5 - 1.0
                    for i in idx
                ])
            )
            feats = gen_and_detect(params, dp_repl, z, c, cond)
        else:
            feats = gen_and_detect(params, dp_repl, z, c)
        stats.append(np.asarray(feats))
        if opts.progress:
            opts.progress(stats.num_items, opts.num_items)
    return stats
