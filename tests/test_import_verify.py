"""End-to-end test of the real-checkpoint readiness harness
(tools/import_and_verify.py, VERDICT r2 item 4): import a fixture .pkl, verify
every stage runs, and pin the ambiguity ABORT gate on a deliberately
duplicated-shape payload (VERDICT r2 weak #7)."""

import os
import pickle
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

import test_import_parity as tip  # noqa: E402  (fixture models + constants)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import import_and_verify  # noqa: E402


def _make_pkl(path, entries, module_name="fake_iv_networks"):
    """Pickle torch modules under a fake module name so the stub unpickler
    (not the live classes) handles the load — the real-checkpoint situation."""
    classes = (tip.TinyG, tip.TinySynthesis, tip.TSegBlock, tip.TSynthBlock,
               tip.TSynthesisLayer, tip.TToRGB, tip.TFC, tip.TMapping,
               tip.TinyD, tip.TDBlock, tip.TConv2dLayer)
    fake = types.ModuleType(module_name)
    orig = {}
    for cls in classes:
        setattr(fake, cls.__name__, cls)
        orig[cls] = cls.__module__
        cls.__module__ = module_name
    sys.modules[module_name] = fake
    try:
        with open(path, "wb") as f:
            pickle.dump(entries, f)
    finally:
        del sys.modules[module_name]
        for cls, mod in orig.items():
            cls.__module__ = mod


def _fixture_g(renderer="decoder"):
    """TinyG with a renderer submodule riding in the synthesis tree.

    renderer='decoder': an MLP whose tensor shapes the unique-shape auto-mapper
    recovers (the happy real-checkpoint case). renderer='ambiguous': two
    same-shaped buffers -> the auto-mapper must refuse and the harness abort.
    """
    torch.manual_seed(0)
    g = tip.TinyG()
    tip._randomize(g, 1)
    if renderer == "decoder":
        torch.manual_seed(2)
        g.synthesis.renderer = nn.Sequential(
            nn.Linear(tip.FCH, 64), nn.ReLU(), nn.Linear(64, tip.FCH + 1))
    elif renderer == "ambiguous":
        amb = nn.Module()
        gen = torch.Generator().manual_seed(3)
        amb.register_buffer("a", torch.randn(64, generator=gen))
        amb.register_buffer("b", torch.randn(64, generator=gen))
        g.synthesis.renderer = amb
    return g


def _write_data_dir(path, res, n=8):
    import PIL.Image

    os.makedirs(path, exist_ok=True)
    rs = np.random.RandomState(7)
    for i in range(n):
        arr = (rs.rand(res, res, 3) * 255).astype(np.uint8)
        PIL.Image.fromarray(arr).save(os.path.join(path, f"im{i:03d}.png"))


def test_import_and_verify_end_to_end(tmp_path):
    g = _fixture_g(renderer="decoder")
    torch.manual_seed(3)
    tiny_d = tip.TinyD()
    tip._randomize(tiny_d, 5)
    pkl = tmp_path / "net.pkl"
    _make_pkl(str(pkl), {"G_ema": g, "D": tiny_d})

    data_dir = tmp_path / "data"
    _write_data_dir(str(data_dir), res=16)

    outdir = tmp_path / "verify"
    rc = import_and_verify.main([
        str(pkl), "--outdir", str(outdir), "--render-size", "8",
        "--num-steps", "4", "--dtype", "float32",
        "--data", str(data_dir), "--metric-items", "8",
    ])
    assert rc == 0
    # every stage left its artifact
    assert (outdir / "ckpt" / "meta.json").exists()
    assert (outdir / "golden_import.npz").exists()
    for seed in range(4):
        assert (outdir / "images" / f"seed{seed:04d}.png").exists()
        assert (outdir / "images" / f"seed{seed:04d}_seg.png").exists()

    golden = np.load(outdir / "golden_import.npz")
    assert {f"ws_{i}" for i in range(4)} <= set(golden.files)
    for k in golden.files:
        assert np.isfinite(golden[k]).all()

    # golden check mode passes against its own artifact
    rc = import_and_verify.main([
        str(pkl), "--outdir", str(outdir), "--render-size", "8",
        "--num-steps", "4", "--dtype", "float32",
        "--check-golden", str(outdir / "golden_import.npz"),
    ])
    assert rc == 0


def test_import_and_verify_ambiguity_abort(tmp_path):
    """Duplicated-shape renderer payload -> the harness must ABORT (exit 2),
    not silently proceed with initialized decoder leaves; --allow-missing is
    the explicit escape hatch."""
    g = _fixture_g(renderer="ambiguous")
    pkl = tmp_path / "net.pkl"
    _make_pkl(str(pkl), {"G_ema": g})

    rc = import_and_verify.main([
        str(pkl), "--outdir", str(tmp_path / "v1"), "--render-size", "8",
        "--num-steps", "4", "--dtype", "float32",
    ])
    assert rc == 2
    # abort happened before any artifact was written
    assert not (tmp_path / "v1" / "ckpt").exists()

    rc = import_and_verify.main([
        str(pkl), "--outdir", str(tmp_path / "v2"), "--render-size", "8",
        "--num-steps", "4", "--dtype", "float32", "--allow-missing",
    ])
    assert rc == 0
    assert (tmp_path / "v2" / "golden_import.npz").exists()


def test_import_and_verify_import_failure(tmp_path):
    """A payload with no generator entry exits 3."""
    torch.manual_seed(3)
    tiny_d = tip.TinyD()
    tip._randomize(tiny_d, 5)
    pkl = tmp_path / "net.pkl"
    _make_pkl(str(pkl), {"D": tiny_d})
    rc = import_and_verify.main([
        str(pkl), "--outdir", str(tmp_path / "v"), "--render-size", "8",
        "--num-steps", "4", "--dtype", "float32",
    ])
    assert rc == 3
