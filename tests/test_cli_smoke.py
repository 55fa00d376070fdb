"""CLI-level smoke tests for generation/eval apps without prior coverage.

The internals (interpolation, losses, projector math) are unit-tested
elsewhere; these guard the argparse surfaces, checkpoint loading, and file
outputs — the layer where bitrot (renamed flags, writer fallbacks, path
handling) otherwise goes unnoticed until someone drives the CLI on hardware.
Everything runs at tiny config on the CPU test platform (conftest).
"""

import json
import os

import numpy as np
import jax
import pytest

from ide3d_tpu.io.checkpoint import save_checkpoint
from ide3d_tpu.models import GeneratorConfig, Ide3dGenerator
from ide3d_tpu.render.renderer import RenderParams


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    """A saved tiny-G checkpoint dir the CLIs can --network."""
    cfg = GeneratorConfig(
        img_resolution=64, render_size=16, plane_resolution=32,
        channel_base=2048, channel_max=64, sr_channel_base=1024,
        sr_channel_max=32, feature_channels=8, dtype="float32",
        render=RenderParams(img_size=16, num_steps=8, hierarchical=True),
    )
    G = Ide3dGenerator(cfg)
    params = jax.jit(G.init)(jax.random.PRNGKey(0))
    path = str(tmp_path_factory.mktemp("ckpt") / "snap")
    save_checkpoint(path, params, config=cfg, step=0)
    return path


def test_gen_videos_cli(tiny_ckpt, tmp_path):
    from ide3d_tpu.apps.gen_videos import main

    out = str(tmp_path / "orbit")
    rc = main([
        "--network", tiny_ckpt, "--seeds", "0,1", "--grid", "1x2",
        "--w-frames", "3", "--num-keyframes", "2", "--image-mode", "image_seg",
        "--num-steps", "8", "--output", out,
    ])
    assert not rc
    written = [f for f in os.listdir(tmp_path) if f.startswith("orbit")]
    assert written, "gen_videos wrote no output (writer fallback chain broken?)"


def test_calc_losses_on_images_cli(tmp_path):
    import PIL.Image

    from ide3d_tpu.apps.calc_losses_on_images import main

    rs = np.random.RandomState(0)
    for d in ("a", "b"):
        os.makedirs(tmp_path / d)
        for i in range(2):
            arr = rs.randint(0, 255, (32, 32, 3), dtype=np.uint8)
            PIL.Image.fromarray(arr).save(tmp_path / d / f"{i:04d}.png")
    out = str(tmp_path / "losses.json")
    result = main([
        "--mode", "l2,lpips", "--data-a", str(tmp_path / "a"),
        "--data-b", str(tmp_path / "b"), "--resolution", "32",
        "--output", out,
    ])
    rep = json.load(open(out))
    for report in (result, rep):
        assert set(report) == {"l2", "lpips"}
        assert all(np.isfinite(v["mean"]) for v in report.values())


def test_gen_images_cli(tiny_ckpt, tmp_path):
    from ide3d_tpu.apps.gen_images import main

    rc = main([
        "--network", tiny_ckpt, "--seeds", "0", "--outdir", str(tmp_path / "o"),
        "--num-steps", "8",
    ])
    assert not rc
    files = os.listdir(tmp_path / "o")
    assert "seed0000.png" in files and "seed0000_seg.png" in files


def test_run_pti_cli(tiny_ckpt, tmp_path):
    import PIL.Image

    from ide3d_tpu.apps.run_pti import main

    rs = np.random.RandomState(1)
    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    PIL.Image.fromarray(rs.randint(0, 255, (64, 64, 3), dtype=np.uint8)).save(
        img_dir / "face.png"
    )
    out = str(tmp_path / "pti")
    rc = main([
        "--network", tiny_ckpt, "--images", str(img_dir), "--outdir", out,
        "--projector-steps", "2", "--pti-steps", "2", "--lpips-threshold", "0",
    ])
    assert not rc
    files = os.listdir(out)
    assert any("face" in f for f in files), files


def test_run_pti_cli_e4e_pivot(tiny_ckpt, tmp_path):
    """--e4e: first-stage pivots from a (random-init) pSp/e4e checkpoint
    (w_type='e4e', base_coach.py:181-199)."""
    import PIL.Image

    torch = pytest.importorskip("torch")

    from ide3d_tpu.apps.run_pti import main
    from ide3d_tpu.models.e4e import E4eEncoder

    # torch-layout pSp checkpoint from the framework init tree
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_cnn_import import make_torch_sd

    sd, _ = make_torch_sd(E4eEncoder(stylegan_size=32).init(), seed=3)
    ckpt = {"state_dict": {f"encoder.{k}": torch.from_numpy(v) * 0.25
                           for k, v in sd.items()},
            "latent_avg": torch.zeros(512)}
    e4e_path = str(tmp_path / "e4e.pt")
    torch.save(ckpt, e4e_path)

    rs = np.random.RandomState(4)
    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    PIL.Image.fromarray(rs.randint(0, 255, (64, 64, 3), dtype=np.uint8)).save(
        img_dir / "face.png")
    out = str(tmp_path / "pti_e4e")
    rc = main([
        "--network", tiny_ckpt, "--images", str(img_dir), "--outdir", out,
        "--e4e", e4e_path,
        "--projector-steps", "2", "--pti-steps", "2", "--lpips-threshold", "0",
    ])
    assert not rc
    assert any("face" in f for f in os.listdir(out))


def test_infer_face_animation_cli(tiny_ckpt, tmp_path):
    import PIL.Image

    from ide3d_tpu.apps.infer_face_animation import main

    rs = np.random.RandomState(2)
    mask_dir = tmp_path / "masks"
    os.makedirs(mask_dir)
    for i in range(2):
        PIL.Image.fromarray(rs.randint(0, 19, (64, 64), dtype=np.uint8)).save(
            mask_dir / f"{i:04d}.png"
        )
    out = str(tmp_path / "anim")
    rc = main([
        "--network", tiny_ckpt, "--masks", str(mask_dir), "--output", out,
    ])
    assert not rc
    written = [f for f in os.listdir(tmp_path) if f.startswith("anim")]
    assert written, "face animation wrote no output"


def test_edit_comparison_cli(tiny_ckpt, tmp_path):
    """Qualitative edit-comparison harness (reference
    inversion/evaluation/qualitative_edit_comparison.py): recon + ladders of
    InterFaceGAN/GANSpace edits per method, single + concat outputs."""
    import PIL.Image

    from ide3d_tpu.apps.edit_comparison import main
    from ide3d_tpu.io.checkpoint import save_pytree_npz

    rs = np.random.RandomState(3)
    img_dir = tmp_path / "targets"
    os.makedirs(img_dir)
    PIL.Image.fromarray(rs.randint(0, 255, (64, 64, 3), dtype=np.uint8)).save(
        img_dir / "face.png")
    # a latent_creator-style method dir: one w+ pivot for the image
    from ide3d_tpu.apps.common import load_generator

    G, _ = load_generator(tiny_ckpt)
    lat_dir = tmp_path / "lat_sg2"
    os.makedirs(lat_dir)
    save_pytree_npz(str(lat_dir / "face.npz"),
                    {"ws": rs.randn(1, G.num_ws, 512).astype(np.float32)})
    dirs_npz = str(tmp_path / "directions.npz")
    np.savez(dirs_npz, age=rs.randn(512).astype(np.float32))

    out = str(tmp_path / "cmp")
    rc = main([
        "--network", tiny_ckpt, "--images", str(img_dir),
        "--latents", f"SG2={lat_dir}", "--directions", dirs_npz,
        "--interfacegan-max", "1.0", "--interfacegan-step", "1.0",
        "--ganspace-components", "1", "--ganspace-factors=-5,6,5",
        "--outdir", out,
    ])
    assert not rc
    single = os.listdir(os.path.join(out, "face", "single_images"))
    concat = os.listdir(os.path.join(out, "face", "concat_images"))
    assert "Original.jpg" in single
    assert "rec.jpg" in concat
    assert any(f.startswith("age_") for f in concat)
    assert any(f.startswith("ganspace_c0_") for f in concat)


def test_load_generator_random_presets():
    """`random:<seed>[:tiny|small]` network specs build reduced configs
    (CPU-mesh machinery runs, e.g. sharded 50k metric extraction)."""
    from ide3d_tpu.apps.common import load_generator

    G, params = load_generator("random:0:tiny")
    assert G.cfg.img_resolution == 32 and G.cfg.render.num_steps == 4
    Gs, _ = load_generator("random:1:small")
    assert Gs.cfg.img_resolution == 64 and Gs.cfg.plane_resolution == 64
    Gf, _ = load_generator("random:0")
    assert Gf.cfg.img_resolution == 512


def test_experiment_runner_cli(tiny_ckpt, tmp_path):
    """Inversion experiment orchestration (reference
    inversion/evaluation/experiment_setting_creator.py): one command chains the
    PTI leg, the SG2+/e4e latent creators, and the edit comparison, with the
    artifact layout each downstream leg consumes."""
    import PIL.Image

    torch = pytest.importorskip("torch")

    from ide3d_tpu.apps.experiment_runner import main
    from ide3d_tpu.models.e4e import E4eEncoder

    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_cnn_import import make_torch_sd

    sd, _ = make_torch_sd(E4eEncoder(stylegan_size=32).init(), seed=5)
    ckpt = {"state_dict": {f"encoder.{k}": torch.from_numpy(v) * 0.25
                           for k, v in sd.items()},
            "latent_avg": torch.zeros(512)}
    e4e_path = str(tmp_path / "e4e.pt")
    torch.save(ckpt, e4e_path)

    rs = np.random.RandomState(6)
    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    PIL.Image.fromarray(rs.randint(0, 255, (64, 64, 3), dtype=np.uint8)).save(
        img_dir / "face.png")

    out = str(tmp_path / "exp")
    rc = main([
        "--network", tiny_ckpt, "--images", str(img_dir), "--outdir", out,
        "--create-other-latents", "--compare", "--e4e", e4e_path,
        "--projector-steps", "2", "--pti-steps", "2", "--lpips-threshold", "0",
        "--num-steps", "4",
    ])
    assert not rc
    assert any("face" in f for f in os.listdir(os.path.join(out, "pti")))
    assert os.path.exists(os.path.join(out, "lat_sg2plus", "face.npz"))
    assert os.path.exists(os.path.join(out, "lat_e4e", "face.npz"))
    concat = os.listdir(os.path.join(out, "comparison", "face", "concat_images"))
    assert "rec.jpg" in concat
