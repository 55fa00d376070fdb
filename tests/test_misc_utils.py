"""Tests for marching tetrahedra, seg utils, checkpoint roundtrip, torch import."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from ide3d_tpu.utils.marching import marching_tetrahedra, save_obj, save_ply
from ide3d_tpu.utils.seg import BISENET_REMAP, id_remap, mask2color, mask2onehot, onehot2mask
from ide3d_tpu.io.checkpoint import (
    load_checkpoint,
    load_pytree_npz,
    save_checkpoint,
    save_pytree_npz,
)
from ide3d_tpu.io.torch_import import state_dict_to_tree


def test_marching_tets_sphere():
    N = 24
    z, y, x = np.meshgrid(*[np.arange(N)] * 3, indexing="ij")
    r = 8.0
    field = r - np.sqrt((x - N / 2) ** 2 + (y - N / 2) ** 2 + (z - N / 2) ** 2)
    verts, faces = marching_tetrahedra(field, level=0.0)
    assert len(verts) > 100 and len(faces) > 100
    # all vertices near the sphere surface
    d = np.linalg.norm(verts - N / 2, axis=1)
    assert np.abs(d - r).max() < 1.0
    # faces index valid vertices
    assert faces.max() < len(verts) and faces.min() >= 0


def test_marching_tets_empty():
    field = -np.ones((8, 8, 8))
    verts, faces = marching_tetrahedra(field, 0.0)
    assert len(verts) == 0 and len(faces) == 0


def test_mesh_export(tmp_path):
    field = 3.0 - np.linalg.norm(
        np.stack(np.meshgrid(*[np.arange(10) - 5.0] * 3, indexing="ij"), -1), axis=-1
    )
    verts, faces = marching_tetrahedra(field, 0.0)
    save_obj(str(tmp_path / "m.obj"), verts, faces)
    save_ply(str(tmp_path / "m.ply"), verts, faces)
    obj = (tmp_path / "m.obj").read_text().splitlines()
    assert sum(1 for l in obj if l.startswith("v ")) == len(verts)
    assert sum(1 for l in obj if l.startswith("f ")) == len(faces)
    assert (tmp_path / "m.ply").stat().st_size > 100


def test_seg_utils_roundtrip(rng):
    mask = jnp.asarray(rng.randint(0, 19, (2, 8, 8)))
    onehot = mask2onehot(mask)
    assert onehot.shape == (2, 8, 8, 19)
    np.testing.assert_array_equal(np.asarray(onehot2mask(onehot)), np.asarray(mask))
    colors = mask2color(onehot)
    assert colors.shape == (2, 8, 8, 3)
    # remap maps 20 BiSeNet ids into 0..18
    ids20 = jnp.arange(20)
    out = np.asarray(id_remap(ids20))
    assert out.max() <= 18 and (out == BISENET_REMAP).all()


def test_checkpoint_roundtrip(tmp_path):
    tree = {"a": jnp.arange(6).reshape(2, 3).astype(jnp.float32), "b": {"c": jnp.ones(4)}}
    save_checkpoint(str(tmp_path / "ck"), tree, config={"x": 1}, step=7)
    params, meta = load_checkpoint(str(tmp_path / "ck"))
    np.testing.assert_array_equal(np.asarray(params["a"]), np.asarray(tree["a"]))
    np.testing.assert_array_equal(np.asarray(params["b"]["c"]), np.ones(4))
    assert meta["step"] == 7


def test_checkpoint_resume_restores_optimizer_structure(tmp_path):
    """Training resume regression: optax states are NamedTuples; a raw orbax
    restore flattens them to dicts and `opt.update` then crashes with
    `'dict' object has no attribute 'mu'`. load_checkpoint(template=...)
    must rebuild the exact structure (the train CLIs pass a fresh init state)."""
    import optax

    params = {"w": jnp.ones((2, 3))}
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    save_checkpoint(str(tmp_path / "ck"), {"E": params, "opt_e": opt_state}, step=3)

    tmpl = {"E": params, "opt_e": opt.init(params)}
    restored, meta = load_checkpoint(str(tmp_path / "ck"), template=tmpl)
    assert meta["step"] == 3
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = opt.update(grads, restored["opt_e"], params)  # crashes pre-fix
    assert np.isfinite(np.asarray(updates["w"])).all()


def test_npz_roundtrip(tmp_path):
    tree = {"ws": np.random.randn(1, 18, 8).astype(np.float32), "meta": {"x": np.arange(3)}}
    save_pytree_npz(str(tmp_path / "t.npz"), tree)
    back = load_pytree_npz(str(tmp_path / "t.npz"))
    np.testing.assert_array_equal(back["ws"], tree["ws"])
    np.testing.assert_array_equal(back["meta"]["x"], tree["meta"]["x"])


def test_state_dict_to_tree_layout():
    sd = {
        "block.conv.weight": np.zeros((8, 4, 3, 3), np.float32),  # OIHW
        "block.fc.weight": np.zeros((16, 32), np.float32),  # [out, in]
        "block.bn.running_mean": np.zeros(8, np.float32),
        "block.bn.num_batches_tracked": np.zeros(1),
    }
    tree = state_dict_to_tree(sd)
    assert tree["block"]["conv"]["weight"].shape == (3, 3, 4, 8)  # HWIO
    assert tree["block"]["fc"]["weight"].shape == (32, 16)  # [in, out]
    assert "num_batches_tracked" not in tree["block"]["bn"]


def test_bisenet_forward(rng):
    from ide3d_tpu.models.bisenet import BiSeNet

    bis = BiSeNet(20)
    p = bis.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    out = bis(p, x)
    assert out.shape == (1, 64, 64, 20)
    assert np.isfinite(np.asarray(out)).all()


def test_arcface_forward(rng):
    from ide3d_tpu.models.arcface import ArcFaceIRSE50

    net = ArcFaceIRSE50()
    p = net.init()
    x = jnp.asarray(rng.randn(2, 112, 112, 3).astype(np.float32) * 0.1)
    emb = net(p, x)
    assert emb.shape == (2, 512)
    assert np.isfinite(np.asarray(emb)).all()
    # embed_faces crops+resizes from any input resolution
    big = jnp.asarray(rng.randn(1, 256, 256, 3).astype(np.float32) * 0.1)
    emb2 = net.embed_faces(p, big)
    assert emb2.shape == (1, 512)


def test_profiling_utils():
    from ide3d_tpu.utils.profiling import StepTimer, check_replica_consistency, profiled_function

    @profiled_function
    def f(x):
        return x * 2

    assert float(f(jnp.ones(()))) == 2.0
    t = StepTimer()
    with t.measure():
        pass
    assert t.median_ms >= 0
    assert check_replica_consistency({"a": jnp.ones((4, 4))})


def test_export_artifact_roundtrip(tmp_path):
    """AOT serving artifact (io/export.py): export -> load -> AOT call matches
    the live jitted pipeline exactly; artifact is code-free (meta + 2 programs)."""
    import numpy as np

    from ide3d_tpu import render
    from ide3d_tpu.io.export import export_generator, load_artifact
    from ide3d_tpu.models import GeneratorConfig, Ide3dGenerator
    from ide3d_tpu.render.renderer import RenderParams

    G = Ide3dGenerator(GeneratorConfig(
        img_resolution=64, render_size=16, plane_resolution=32,
        channel_base=2048, channel_max=64, sr_channel_base=1024,
        sr_channel_max=32, feature_channels=8, dtype="float32",
        render=RenderParams(img_size=16, num_steps=8, hierarchical=True),
    ))
    params = jax.jit(G.init)(jax.random.PRNGKey(0))

    out = str(tmp_path / "artifact")
    meta = export_generator(G, params, out, truncation_psi=0.7)
    assert meta["num_ws"] == G.num_ws
    assert sorted(os.listdir(out)) == ["frame.bin", "mapping.bin", "meta.json"]

    art = load_artifact(out)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, G.cfg.z_dim))
    c = jnp.broadcast_to(jnp.asarray(render.CANONICAL_POSE_25), (1, 25))

    ws = art.map_z(z, c)
    want_ws = G.mapping(params["mapping"], z, c, truncation_psi=0.7)
    np.testing.assert_allclose(np.asarray(ws), np.asarray(want_ws), rtol=1e-4, atol=1e-4)

    img, seg = art.render(ws, c)
    want_img, want_seg = G.synthesis(params["synthesis"], want_ws, c, return_seg=True)
    assert np.isfinite(np.asarray(img)).all()
    np.testing.assert_allclose(np.asarray(img), np.asarray(want_img), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(seg), np.asarray(want_seg), rtol=1e-3, atol=1e-3)
