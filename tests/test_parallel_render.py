"""Ray-sharded multi-chip frame == single-device frame (parallel/render.py).

The reference has no multi-GPU rendering at all; this capability is TPU-native
(shard_map over the ray axis, SURVEY.md §2.2 parallelism notes). Per-ray work is
independent, so the sharded frame must reproduce the fused single-device render
EXACTLY (same ops on the same rows, plus one all_gather)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ide3d_tpu import render
from ide3d_tpu.models import GeneratorConfig, Ide3dGenerator
from ide3d_tpu.parallel.mesh import create_mesh
from ide3d_tpu.parallel.render import make_ray_sharded_frame
from ide3d_tpu.render.renderer import RenderParams

from test_models import tiny_cfg


def _setup(**cfg_kw):
    G = Ide3dGenerator(tiny_cfg(**cfg_kw))
    params = G.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (2, G.cfg.z_dim))
    c = jnp.broadcast_to(jnp.asarray(render.CANONICAL_POSE_25), (2, 25))
    ws = G.mapping(params["mapping"], z, c)
    return G, params, ws, c


@pytest.mark.parametrize("n_devices", [8, 4])
def test_ray_sharded_frame_matches_fused(n_devices):
    G, params, ws, c = _setup()
    mesh = create_mesh(n_devices)
    frame = make_ray_sharded_frame(G.synthesis, mesh)
    img_sh, seg_sh = frame(params["synthesis"], ws, c)

    img, seg = jax.jit(
        lambda p, w, c: G.synthesis(p["synthesis"], w, c, return_seg=True)
    )(params, ws, c)

    assert np.isfinite(np.asarray(img_sh)).all()
    np.testing.assert_allclose(np.asarray(img_sh), np.asarray(img),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(seg_sh), np.asarray(seg),
                               rtol=1e-5, atol=1e-5)


def test_ray_sharded_frame_hybrid_volume():
    # the hybrid tri-plane/voxel branch rides the same ray-sharded path
    G, params, ws, c = _setup(use_feature_volume=True, fv_resolution=8, fv_base_channels=16)
    mesh = create_mesh(4)
    frame = make_ray_sharded_frame(G.synthesis, mesh, return_seg=False)
    img_sh = frame(params["synthesis"], ws, c)
    img = jax.jit(lambda p, w, c: G.synthesis(p["synthesis"], w, c))(params, ws, c)
    np.testing.assert_allclose(np.asarray(img_sh), np.asarray(img),
                               rtol=1e-5, atol=1e-5)


def test_ray_slice_rows_equal_full_render():
    # the renderer-level hook: a sliced coarse/fine pass returns rows of the full one
    G, params, ws, c = _setup()
    S = G.synthesis
    rp = G.cfg.render
    syn = params["synthesis"]
    img_v, seg_v = S.generate_planes(syn, ws)
    cam2world = c[:, :16].reshape(-1, 4, 4)

    full = S.renderer.render(syn["renderer"], img_v, seg_v, cam2world, rp)
    Rr = rp.img_size * rp.img_size
    start, length = Rr // 4, Rr // 4
    st = S.renderer.render_coarse(
        syn["renderer"], img_v, seg_v, cam2world, rp,
        ray_slice=(jnp.asarray(start), length),
    )
    part = S.renderer.render_fine(syn["renderer"], st, rp, flat=True)
    full_feat = full["feature"].reshape(2, Rr, -1)[:, start:start + length]
    np.testing.assert_allclose(np.asarray(part["feature"]), np.asarray(full_feat),
                               rtol=1e-5, atol=1e-6)


def test_frame_sharded_chunks_match_single_device():
    # offline-video DP: frame axis sharded over the mesh; each device scans its
    # local frames — must equal the plain single-device scan bit-for-bit shapes
    # and near-exactly in values (same program per frame, noise_mode='const')
    from ide3d_tpu.parallel.render import make_frame_sharded_chunks

    G, params, ws, c = _setup()
    rp = G.cfg.render

    K = 8
    z = jax.random.normal(jax.random.PRNGKey(5), (K, G.cfg.z_dim))
    cs = jnp.broadcast_to(jnp.asarray(render.CANONICAL_POSE_25), (K, 25))
    ws_k = G.mapping(params["mapping"], z, cs)

    def post(out):
        img8 = jnp.clip(jnp.round((out["img"][0] + 1) * 127.5), 0, 255).astype(jnp.uint8)
        return img8, out["depth"][0]

    single = make_frame_sharded_chunks(G.synthesis, post, None, rp)
    imgs_1, depths_1 = single(params["synthesis"], ws_k, cs)

    mesh = create_mesh(8)
    sharded = make_frame_sharded_chunks(G.synthesis, post, mesh, rp)
    imgs_8, depths_8 = sharded(params["synthesis"], ws_k, cs)

    assert imgs_8.shape == imgs_1.shape
    # uint8 output: allow off-by-one from fp reassociation at the cast boundary
    assert np.max(np.abs(np.asarray(imgs_8).astype(np.int32)
                         - np.asarray(imgs_1).astype(np.int32))) <= 1
    np.testing.assert_allclose(np.asarray(depths_8), np.asarray(depths_1),
                               rtol=1e-5, atol=1e-5)

    # chunk size not divisible by the mesh -> loud error, not silent wrong math
    import pytest as _pytest
    bad_ws = ws_k[:6]
    with _pytest.raises(AssertionError):
        sharded(params["synthesis"], bad_ws, cs[:6])
