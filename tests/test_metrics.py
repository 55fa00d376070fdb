"""Metric suite tests: registry dispatch, FID sanity (identical distributions -> ~0,
shifted -> >0), KID/PR/PPL/IS smoke on tiny generator + synthetic dataset."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ide3d_tpu import render
from ide3d_tpu.metrics import calc_metric, list_metrics, pixel_features
from ide3d_tpu.metrics.features import InceptionV3, VGG16Features, PixelFeatures
from ide3d_tpu.metrics.metric_utils import FeatureStats, MetricOptions
from ide3d_tpu.models import GeneratorConfig, Ide3dGenerator
from ide3d_tpu.render.renderer import RenderParams


class FakeDataset:
    """Indexable (img uint8 HWC, label) like data.ImageFolderDataset."""

    label_dim = 25
    _path = "fake"

    def __init__(self, n=32, res=32, seed=0):
        rng = np.random.RandomState(seed)
        self.imgs = rng.randint(0, 255, (n, res, res, 3), np.uint8)
        self.labels = np.broadcast_to(render.CANONICAL_POSE_25, (n, 25)).copy()

    def __len__(self):
        return len(self.imgs)

    def __getitem__(self, i):
        return self.imgs[i], self.labels[i]


def tiny_G():
    cfg = GeneratorConfig(
        img_resolution=32, render_size=8, plane_resolution=16,
        channel_base=512, channel_max=32, sr_channel_base=256, sr_channel_max=16,
        feature_channels=8, dtype="float32",
        render=RenderParams(img_size=8, num_steps=4),
    )
    G = Ide3dGenerator(cfg)
    return G, G.init(jax.random.PRNGKey(0))


def test_feature_stats_mean_cov():
    rng = np.random.RandomState(0)
    x = rng.randn(500, 8).astype(np.float32)
    st = FeatureStats(capture_all=True, capture_mean_cov=True)
    for i in range(0, 500, 64):
        st.append(x[i : i + 64])
    mean, cov = st.get_mean_cov()
    np.testing.assert_allclose(mean, x.mean(0), atol=1e-4)
    np.testing.assert_allclose(cov, np.cov(x.T, bias=True), atol=1e-3)
    assert st.get_all().shape == (500, 8)


def test_fid_zero_for_identical_and_positive_for_shifted(tmp_path):
    from ide3d_tpu.metrics.frechet_inception_distance import compute_fid

    # Monkey-level check of the math itself via stats objects.
    rng = np.random.RandomState(1)
    a = rng.randn(2000, 16)
    import scipy.linalg

    def fid_from(a, b):
        mu1, s1 = a.mean(0), np.cov(a.T, bias=True)
        mu2, s2 = b.mean(0), np.cov(b.T, bias=True)
        m = np.square(mu1 - mu2).sum()
        s = scipy.linalg.sqrtm(s1 @ s2)
        return np.real(m + np.trace(s1 + s2 - 2 * s))

    same = fid_from(a, a + rng.randn(*a.shape) * 1e-6)
    shifted = fid_from(a, a + 3.0)
    assert same < 0.05 and shifted > 100


def test_calc_metric_fid_pipeline(tmp_path):
    G, params = tiny_G()
    ds = FakeDataset(n=24, res=32)
    rec = calc_metric(
        "fid", run_dir=str(tmp_path), G=G, g_params=params, dataset=ds,
        detector=pixel_features, detector_params={}, num_items=24, batch_size=8,
        cache_dir=str(tmp_path),
    )
    assert np.isfinite(rec["results"]["fid"])
    assert (tmp_path / "metric-fid.jsonl").exists()
    # cached dataset stats reused on second call
    rec2 = calc_metric(
        "fid", G=G, g_params=params, dataset=ds,
        detector=pixel_features, detector_params={}, num_items=24, batch_size=8,
        cache_dir=str(tmp_path),
    )
    assert np.isfinite(rec2["results"]["fid"])


def test_kid_pr_is_smoke(tmp_path):
    G, params = tiny_G()
    ds = FakeDataset(n=16, res=32)
    common = dict(G=G, g_params=params, dataset=ds, detector=pixel_features,
                  detector_params={}, num_items=16, batch_size=8)
    kid = calc_metric("kid", **common)["results"]["kid"]
    assert np.isfinite(kid)
    # regression: fid's cached mean/cov-only dataset stats must NOT be served
    # to kid (which needs the raw feature bank) — one cache dir, both metrics
    fid2 = calc_metric("fid", cache_dir=str(tmp_path), **common)["results"]["fid"]
    kid2 = calc_metric("kid", cache_dir=str(tmp_path), **common)["results"]["kid"]
    assert np.isfinite(fid2) and np.isfinite(kid2)
    pr = calc_metric("pr", **common)["results"]
    assert 0 <= pr["precision"] <= 1 and 0 <= pr["recall"] <= 1
    is_res = calc_metric("inception_score", **common)["results"]
    assert is_res["is_mean"] >= 1.0


def test_ppl_smoke():
    G, params = tiny_G()
    rec = calc_metric("ppl2_wend", G=G, g_params=params,
                      detector=pixel_features, detector_params={},
                      num_items=8, batch_size=4)
    assert np.isfinite(rec["results"]["ppl2_wend"])


def test_metric_registry():
    names = list_metrics()
    assert {"fid", "kid", "pr", "ppl2_wend", "inception_score"} <= set(names)


def test_inception_v3_forward_shape():
    det = InceptionV3()
    p = det.init()
    x = jnp.zeros((2, 75, 75, 3))
    out = det(p, x)
    assert out.shape == (2, 2048)
    assert np.isfinite(np.asarray(out)).all()


def test_vgg16_forward_shape():
    det = VGG16Features()
    p = det.init(jax.random.PRNGKey(0))
    out = det(p, jnp.zeros((2, 64, 64, 3)))
    assert out.shape == (2, 4096)
    maps = det.feature_maps(p, jnp.zeros((1, 64, 64, 3)))
    assert len(maps) == 5


def test_equivariance_metrics_smoke():
    G, params = tiny_G()
    rec = calc_metric("eqt", G=G, g_params=params, detector=pixel_features,
                      detector_params={}, num_items=2, batch_size=1)
    assert np.isfinite(rec["results"]["eqt_psnr_db"])
    rec = calc_metric("eqr", G=G, g_params=params, detector=pixel_features,
                      detector_params={}, num_items=2, batch_size=1)
    assert np.isfinite(rec["results"]["eqr_psnr_db"])


def test_fid_sharded_over_mesh_matches_single_device():
    """Device-sharded feature extraction must EQUAL the single-device value on
    the same inputs (VERDICT item 8 — a wrong sharding spec fails this), not
    merely be finite."""
    from ide3d_tpu.parallel import create_mesh

    G, params = tiny_G()
    ds = FakeDataset(n=16, res=32)
    mesh = create_mesh()
    rec = calc_metric(
        "fid", G=G, g_params=params, dataset=ds, detector=pixel_features,
        detector_params={}, num_items=16, batch_size=8, mesh=mesh,
    )
    assert np.isfinite(rec["results"]["fid"])
    rec_1 = calc_metric(
        "fid", G=G, g_params=params, dataset=ds, detector=pixel_features,
        detector_params={}, num_items=16, batch_size=8,
    )
    np.testing.assert_allclose(
        rec["results"]["fid"], rec_1["results"]["fid"], rtol=1e-3, atol=1e-4,
        err_msg="mesh-sharded FID diverges from single-device FID",
    )


def test_generator_features_cond_render_mode():
    """cond_render evaluation mode (reference metric_utils.py:70-81): generator
    metrics driven by condition images through G's built-in encoder."""
    from ide3d_tpu.metrics.metric_utils import (
        MetricOptions,
        compute_feature_stats_for_generator,
    )
    from ide3d_tpu.models import GeneratorConfig, Ide3dGenerator
    from ide3d_tpu.render.renderer import RenderParams

    cfg = GeneratorConfig(
        img_resolution=32, render_size=8, plane_resolution=16, channel_base=512,
        channel_max=32, sr_channel_base=256, sr_channel_max=16, feature_channels=8,
        dtype="float32", render=RenderParams(img_size=8, num_steps=4),
        use_encoder=True,
    )
    G = Ide3dGenerator(cfg)
    params = G.init(jax.random.PRNGKey(0))
    ds = FakeDataset(n=8, res=32)
    opts = MetricOptions(
        G=G, g_params=params, dataset=ds, detector=pixel_features,
        detector_params={}, num_items=4, batch_size=2, cond_render=True,
    )
    stats = compute_feature_stats_for_generator(opts)
    mu, _ = stats.get_mean_cov()
    assert np.isfinite(mu).all()


def test_make_detector_factory():
    """make_detector is the single detector-construction entry point for the
    CLIs: name dispatch, validation, and deterministic params."""
    from ide3d_tpu.metrics.features import make_detector

    det, dp = make_detector("pixel")
    assert isinstance(det, PixelFeatures) and dp == {}
    det, dp = make_detector("inception")
    assert isinstance(det, InceptionV3)
    det, dp = make_detector("vgg16")
    assert isinstance(det, VGG16Features)
    # seeded vgg init is deterministic
    _, dp2 = make_detector("vgg16")
    a = jax.tree_util.tree_leaves(dp)[0]
    b = jax.tree_util.tree_leaves(dp2)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError):
        make_detector("vgg")  # typos must not silently fall back


def test_gen_detect_program_cache():
    """The memoized (G -> detector) extraction program: same objects hit the
    cache (no retrace per metric snapshot), different objects miss, and the
    LRU stays bounded."""
    from ide3d_tpu.metrics import metric_utils as mu

    G, _ = tiny_G()
    det = PixelFeatures()
    mu._GEN_DETECT_CACHE.clear()
    fn1 = mu._jitted_gen_detect(G, det, None, False)
    fn2 = mu._jitted_gen_detect(G, det, None, False)
    assert fn1 is fn2
    assert mu._jitted_gen_detect(G, det, None, True) is not fn1
    for i in range(2 * mu._GEN_DETECT_CACHE_MAX):
        mu._jitted_gen_detect(G, PixelFeatures(), None, False)
    assert len(mu._GEN_DETECT_CACHE) <= mu._GEN_DETECT_CACHE_MAX
    mu._GEN_DETECT_CACHE.clear()


def test_dataset_stats_cache_key_includes_dataset_identity(tmp_path):
    """The real-stats disk cache must distinguish datasets that share a path
    basename but differ in content/length (e.g. the un-mirrored metrics
    dataset vs the xflip training loader) — a path-only key would silently
    serve stale statistics."""
    from ide3d_tpu.metrics.metric_utils import (
        _cache_path, compute_feature_stats_for_dataset)

    ds_a = FakeDataset(n=8, res=32, seed=0)
    ds_b = FakeDataset(n=16, res=32, seed=1)  # same _path, different length
    opts_a = MetricOptions(dataset=ds_a, detector=pixel_features,
                           detector_params={}, num_items=8, batch_size=4,
                           cache_dir=str(tmp_path))
    opts_b = dataclasses.replace(opts_a, dataset=ds_b, num_items=8)
    assert _cache_path(opts_a, "dataset", False, True) != \
        _cache_path(opts_b, "dataset", False, True)
    mu_a, _ = compute_feature_stats_for_dataset(opts_a).get_mean_cov()
    mu_b, _ = compute_feature_stats_for_dataset(opts_b).get_mean_cov()
    assert not np.allclose(mu_a, mu_b)  # cache did not cross-serve


# ------------------------------------------------- 50k presets + provenance


def test_50k_presets_registered():
    """Reference metric names (metrics/metric_main.py:86-148) must resolve."""
    assert {"fid50k_full", "kid50k_full", "pr50k3_full", "ppl2_wend",
            "eqt50k_int", "eqt50k_frac", "eqr50k", "is50k"} <= set(list_metrics())


def test_fid50k_full_max_real_semantics(monkeypatch):
    """fid50k_full = 50k generator items vs the FULL dataset's real stats
    (max_real=None); kid/pr cap real items (reference metric_main.py:92,98)."""
    import ide3d_tpu.metrics.frechet_inception_distance as fid_mod
    import ide3d_tpu.metrics.kernel_inception_distance as kid_mod
    import ide3d_tpu.metrics.precision_recall as pr_mod

    seen = {}
    monkeypatch.setattr(fid_mod, "compute_fid",
                        lambda opts: seen.setdefault("fid", (opts.num_items, opts.max_real)) and 1.0)
    monkeypatch.setattr(kid_mod, "compute_kid",
                        lambda opts: seen.setdefault("kid", (opts.num_items, opts.max_real)) and 1.0)
    monkeypatch.setattr(pr_mod, "compute_pr",
                        lambda opts, nhood_size: (seen.setdefault("pr", (opts.num_items, opts.max_real, nhood_size)), (0.5, 0.5))[1])
    rec = calc_metric("fid50k_full", detector=pixel_features, detector_params={})
    assert seen["fid"] == (50000, None)
    assert rec["results"]["fid50k_full"] == 1.0
    calc_metric("kid50k_full", detector=pixel_features, detector_params={})
    assert seen["kid"] == (50000, 1000000)
    calc_metric("pr50k3_full", detector=pixel_features, detector_params={})
    assert seen["pr"] == (50000, 200000, 3)


def test_max_real_dataset_cap(tmp_path):
    """max_real=None extracts the FULL dataset regardless of num_items; an int
    caps it; -1 (default) follows num_items. Cache keys track the real cap."""
    from ide3d_tpu.metrics.metric_utils import (
        _cache_path, compute_feature_stats_for_dataset)

    ds = FakeDataset(n=24, res=32)
    base = dict(dataset=ds, detector=pixel_features, detector_params={},
                num_items=8, batch_size=4)
    st_default = compute_feature_stats_for_dataset(MetricOptions(**base))
    assert st_default.num_items == 8
    st_full = compute_feature_stats_for_dataset(MetricOptions(max_real=None, **base))
    assert st_full.num_items == 24
    st_cap = compute_feature_stats_for_dataset(MetricOptions(max_real=16, **base))
    assert st_cap.num_items == 16
    # distinct cache entries per real-side cap (same num_items)
    paths = {
        _cache_path(MetricOptions(cache_dir=str(tmp_path), **base), "dataset", False, True),
        _cache_path(MetricOptions(cache_dir=str(tmp_path), max_real=None, **base), "dataset", False, True),
        _cache_path(MetricOptions(cache_dir=str(tmp_path), max_real=16, **base), "dataset", False, True),
    }
    assert len(paths) == 3


def test_detector_provenance_stamped_in_record(tmp_path):
    """Every persisted metric record carries the detector-weights provenance
    (random-init scores must never read as Inception-comparable)."""
    import json

    from ide3d_tpu.metrics.features import make_detector

    det, dp = make_detector("pixel")
    assert det.provenance["source"] == "weightless-pixel"
    det_v, _ = make_detector("vgg16")
    assert det_v.provenance["source"].startswith("random-init")
    det_i, _ = make_detector("inception")
    assert det_i.provenance["detector"] == "inception"
    assert det_i.provenance["weights"] is None

    G, params = tiny_G()
    ds = FakeDataset(n=8, res=32)
    rec = calc_metric("fid", run_dir=str(tmp_path), G=G, g_params=params,
                      dataset=ds, detector=det, detector_params=dp,
                      num_items=8, batch_size=4)
    assert rec["detector"]["source"] == "weightless-pixel"
    line = json.loads((tmp_path / "metric-fid.jsonl").read_text().splitlines()[-1])
    assert line["detector"]["detector"] == "pixel"
