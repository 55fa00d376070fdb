"""App-layer tests on tiny configs: viz renderer (plane caching + render types),
shape extraction chunking, dataset_tool zip roundtrip, spectra math."""

import json
import os

import numpy as np
import PIL.Image
import pytest
import jax
import jax.numpy as jnp

from ide3d_tpu.models import GeneratorConfig, Ide3dGenerator
from ide3d_tpu.render.renderer import RenderParams


@pytest.fixture(scope="module")
def tiny():
    cfg = GeneratorConfig(
        img_resolution=32, render_size=8, plane_resolution=16,
        channel_base=512, channel_max=32, sr_channel_base=256, sr_channel_max=16,
        feature_channels=8, dtype="float32", render=RenderParams(img_size=8, num_steps=4),
    )
    G = Ide3dGenerator(cfg)
    return G, G.init(jax.random.PRNGKey(0))


def test_viz_renderer_types_and_cache(tiny):
    from ide3d_tpu.apps.viz_renderer import VizRenderer, VizState

    G, params = tiny
    r = VizRenderer(G, params)
    st = VizState(seed=1, num_steps=4)
    img, info = r.render(st)
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    assert info["plane_cached"] is False
    # pose change hits the plane cache
    st2 = VizState(seed=1, yaw=0.3, num_steps=4)
    _, info2 = r.render(st2)
    assert info2["plane_cached"] is True
    # seed change invalidates
    _, info3 = r.render(VizState(seed=2, num_steps=4))
    assert info3["plane_cached"] is False
    for t in ("seg", "depth", "normals", "raw"):
        out, _ = r.render(VizState(seed=2, render_type=t, num_steps=4))
        assert out.dtype == np.uint8 and out.shape[-1] == 3


def test_viz_stylemix_split(tiny):
    from ide3d_tpu.apps.viz_renderer import VizRenderer, VizState

    G, params = tiny
    r = VizRenderer(G, params)
    seg_a, _ = r.render(VizState(seed=1, render_type="seg", num_steps=4))
    # appearance mix keeps geometry rows -> seg unchanged
    seg_m, _ = r.render(VizState(seed=1, stylemix_seed=5, stylemix_appearance=True,
                                 render_type="seg", num_steps=4))
    np.testing.assert_array_equal(seg_a, seg_m)
    # geometry mix changes seg
    seg_g, _ = r.render(VizState(seed=1, stylemix_seed=5, stylemix_geometry=True,
                                 render_type="seg", num_steps=4))
    assert (seg_g != seg_a).any()


def test_extract_shapes_chunks(tiny, tmp_path):
    from ide3d_tpu.apps.extract_shapes import create_samples

    G, params = tiny
    S = G.synthesis
    samples = create_samples(16, 0.3)
    assert samples.shape == (16**3, 3)
    # z index varies fastest (extract_shapes.py:84-86)
    assert abs(samples[1, 2] - samples[0, 2]) > 0
    np.testing.assert_allclose(samples[1, 0], samples[0, 0])

    ws = G.mapping(params["mapping"],
                   jax.random.normal(jax.random.PRNGKey(0), (1, G.cfg.z_dim)),
                   jnp.zeros((1, 25)).at[:, :16].set(jnp.eye(4).reshape(-1)))
    img_v, seg_v = S.generate_planes(params["synthesis"], ws)
    out = S.renderer.sample_voxel(params["synthesis"]["renderer"], img_v, seg_v,
                                  jnp.asarray(samples[None, :512]))
    assert out.shape == (1, 512, G.cfg.feature_channels + 20)


def test_dataset_tool_roundtrip(tmp_path):
    from ide3d_tpu.apps.dataset_tool import main as dtool
    from ide3d_tpu.data import ImageFolderDataset

    src = tmp_path / "src"
    src.mkdir()
    rng = np.random.RandomState(0)
    labels = {}
    for i in range(4):
        name = f"photo_{i}.png"
        PIL.Image.fromarray(rng.randint(0, 255, (40, 40, 3), np.uint8)).save(src / name)
        labels[name] = list(np.eye(4).reshape(-1)) + [4.2647, 0, 0.5, 0, 4.2647, 0.5, 0, 0, 1]
    with open(src / "dataset.json", "w") as f:
        json.dump({"labels": list(labels.items())}, f)

    dest = str(tmp_path / "data.zip")
    dtool(["--source", str(src), "--dest", dest, "--resolution", "32"])
    ds = ImageFolderDataset(dest, resolution=32)
    img, label = ds[0]
    assert img.shape == (32, 32, 3)
    assert label.shape == (25,)


def test_dataset_tool_mirror(tmp_path):
    """--mirror materializes x-flipped copies with flip_yaw'd labels and
    left/right-swapped mask classes (mirror_dataset parity)."""
    from ide3d_tpu.apps.dataset_tool import main as dtool
    from ide3d_tpu.data import ImageFolderDataset

    src, msk = tmp_path / "src", tmp_path / "msk"
    src.mkdir()
    msk.mkdir()
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (32, 32, 3), np.uint8)
    PIL.Image.fromarray(img).save(src / "a.png")
    mask = np.zeros((32, 32), np.uint8)
    mask[:, :8] = 4   # l_eye on the left
    mask[:, -8:] = 8  # l_ear on the right
    PIL.Image.fromarray(mask).save(msk / "a.png")
    pose = list(np.eye(4).reshape(-1)) + [4.2647, 0, 0.5, 0, 4.2647, 0.5, 0, 0, 1]
    pose[3] = 0.7  # nonzero x translation so flip_yaw is visible
    with open(src / "dataset.json", "w") as f:
        json.dump({"labels": [["a.png", pose]]}, f)

    dest = str(tmp_path / "data.zip")
    dtool(["--source", str(src), "--dest", dest, "--resolution", "32",
           "--masks", str(msk), "--mirror"])
    ds = ImageFolderDataset(dest, resolution=32,
                            seg_path=dest.replace(".zip", "_seg.zip"))
    assert len(ds) == 2
    i0, i1 = ds[0][0], ds[1][0]
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0)[:, ::-1])
    # labels: loader flips OpenCV->OpenGL on BOTH; the mirrored one differs by
    # the xflip relabel signs (flat idx 1,2,3,4,8)
    l0, l1 = np.asarray(ds[0][-1]), np.asarray(ds[1][-1])
    expect = l0.copy()
    expect[[1, 2, 3, 4, 8]] *= -1
    np.testing.assert_allclose(l1, expect, atol=1e-6)
    # masks: flipped spatially AND l_eye(4)<->r_eye(5), l_ear(8)<->r_ear(9)
    import zipfile as _zf

    with _zf.ZipFile(dest.replace(".zip", "_seg.zip")) as z:
        m1 = np.asarray(PIL.Image.open(
            __import__("io").BytesIO(z.read("img00000001.png"))))
    assert (m1[:, :8] == 9).all()   # mirrored l_ear -> r_ear, now on the left
    assert (m1[:, -8:] == 5).all()  # mirrored l_eye -> r_eye, now on the right


def test_spectra_math(rng):
    from ide3d_tpu.apps.avg_spectra import azimuthal_average, power_spectrum

    imgs = rng.randn(4, 32, 32, 3).astype(np.float32)
    spec = power_spectrum(imgs)
    assert spec.shape == (32, 32)
    radial = azimuthal_average(spec)
    assert radial.ndim == 1 and np.isfinite(radial).all()


def test_lpips_module(rng):
    import jax
    from ide3d_tpu.metrics.lpips import LPIPS

    lp = LPIPS()
    p = lp.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32) * 0.3)
    d_same = np.asarray(lp(p, x, x))
    np.testing.assert_allclose(d_same, 0.0, atol=1e-5)
    y = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32) * 0.3)
    d_diff = np.asarray(lp(p, x, y))
    assert (d_diff > 0).all()


def test_painter_record_and_replay(tiny, tmp_path):
    import jax
    from ide3d_tpu.apps.painter import PainterSession
    from ide3d_tpu.models.encoder import HybridEncoder

    G, params = tiny
    n_geo = G.synthesis.num_ws_geo
    E = HybridEncoder(size=G.cfg.img_resolution, n_latents_app=G.num_ws - n_geo,
                      n_latents_geo=n_geo, w_dim=G.cfg.w_dim)
    sess = PainterSession(G=G, E=E, g_params=params,
                          e_params=E.init(jax.random.PRNGKey(1)), record=True)
    sess.set_seed(0)
    R = G.cfg.img_resolution
    mask = np.zeros((R, R), np.uint8)
    sess.edit(mask, yaw=0.1)
    mask[4:10, 4:10] = 13
    sess.edit(mask, yaw=-0.1)
    log = str(tmp_path / "session.npz")
    sess.save_log(log)

    sess2 = PainterSession(G=G, E=E, g_params=params,
                           e_params=E.init(jax.random.PRNGKey(1)))
    sess2.set_seed(0)
    frames = list(sess2.replay_log(log))
    assert len(frames) == 2
    assert frames[0][0].shape == (R, R, 3)


def test_painter_frame_cache_stroke_equals_full_edit(tiny):
    """Steady-state strokes reuse the previous frame as the first G pass
    (painter.py edit_from_render); the result must equal the uncached edit."""
    import jax
    from ide3d_tpu.apps.painter import PainterSession
    from ide3d_tpu.models.encoder import HybridEncoder

    G, params = tiny
    n_geo = G.synthesis.num_ws_geo
    E = HybridEncoder(size=G.cfg.img_resolution, n_latents_app=G.num_ws - n_geo,
                      n_latents_geo=n_geo, w_dim=G.cfg.w_dim)
    e_params = E.init(jax.random.PRNGKey(1))
    R = G.cfg.img_resolution
    mask1 = np.zeros((R, R), np.uint8)
    mask2 = mask1.copy()
    mask2[4:12, 4:12] = 13

    def run(use_cache):
        sess = PainterSession(G=G, E=E, g_params=params, e_params=e_params)
        sess.set_seed(3)
        sess.edit(mask1, yaw=0.15)  # populates the frame cache
        if not use_cache:
            sess._frame_cache = None
        return sess.edit(mask2, yaw=0.15)  # same view -> cached first pass

    img_c, seg_c = run(True)
    img_u, seg_u = run(False)
    np.testing.assert_allclose(img_c.astype(np.int32), img_u.astype(np.int32), atol=1)
    np.testing.assert_allclose(seg_c.astype(np.int32), seg_u.astype(np.int32), atol=1)


def test_mask_canvas_tools():
    from ide3d_tpu.apps.mask_canvas import MaskCanvas

    c = MaskCanvas(size=64)
    c.rect(10, 10, 30, 30, cls=13)
    assert (c.mask[10:30, 10:30] == 13).all()
    assert c.mask[0, 0] == 0
    c.brush([(40, 40), (50, 50)], cls=1, radius=3)
    assert c.mask[45, 45] == 1
    c.fill(0, 0, cls=18)  # fill background
    assert c.mask[0, 0] == 18
    assert (c.mask[12, 12] == 13)  # enclosed region untouched
    # undo chain unwinds all three ops
    assert c.undo() and c.mask[0, 0] == 0
    assert c.undo() and c.mask[45, 45] == 0
    assert c.undo() and (c.mask == 0).all()
    assert c.redo() and (c.mask[10:30, 10:30] == 13).all()
    col = c.to_color()
    assert col.shape == (64, 64, 3) and col.dtype == np.uint8


def test_viz_layer_capture(tiny):
    """Layer-capture parity (the reference layer widget, viz/renderer.py:408-444):
    named intermediate activations with stats + previews."""
    from ide3d_tpu.apps.viz_renderer import VizRenderer, VizState

    G, params = tiny
    r = VizRenderer(G, params)
    caps = r.capture_layers(VizState(seed=1, num_steps=4))
    names = set(caps)
    # every vb block, renderer outputs, raw head, every superres block present
    for res in G.synthesis.voxel_block_resolutions:
        assert {f"vb{res}.x", f"vb{res}.img_v", f"vb{res}.seg_v"} <= names
    assert {"renderer.feature", "renderer.seg", "renderer.depth", "raw_rgb"} <= names
    for res in G.synthesis.block_resolutions:
        assert {f"b{res}.x", f"b{res}.img"} <= names
    for name, c in caps.items():
        assert np.isfinite(c["mean"]) and np.isfinite(c["std"]), name
        if "preview" in c:
            assert c["preview"].ndim == 3 and c["preview"].shape[-1] == 3
