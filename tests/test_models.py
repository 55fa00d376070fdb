"""Model family tests: shapes, latent-layout contracts, style-mixing semantics,
gradient flow, and the G/D/E API surface (SURVEY.md §2.1/§2.2)."""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ide3d_tpu import render
from ide3d_tpu.models import (
    Discriminator,
    DiscriminatorConfig,
    Encoder,
    GeneratorConfig,
    HybridEncoder,
    Ide3dGenerator,
    MappingNetwork,
    MultiViewHybridEncoder,
)
from ide3d_tpu.render.renderer import RenderParams


def tiny_cfg(**kw):
    """A scaled-down generator that keeps the full structure (7 vb blocks would need
    plane_resolution 256; the tiny config uses 32 -> 4 vb blocks, img 64)."""
    base = dict(
        img_resolution=64,
        render_size=16,
        plane_resolution=32,
        channel_base=2048,
        channel_max=64,
        sr_channel_base=1024,
        sr_channel_max=32,
        feature_channels=8,
        dtype="float32",
        render=RenderParams(img_size=16, num_steps=8, hierarchical=True),
    )
    base.update(kw)
    return GeneratorConfig(**base)


@pytest.fixture(scope="module")
def tiny_G():
    G = Ide3dGenerator(tiny_cfg())
    params = G.init(jax.random.PRNGKey(0))
    return G, params


def canonical_c(batch=1):
    return jnp.broadcast_to(jnp.asarray(render.CANONICAL_POSE_25), (batch, 25))


# ----------------------------------------------------------------------- mapping


def test_mapping_shapes_and_truncation():
    m = MappingNetwork(z_dim=32, c_dim=25, w_dim=64, num_ws=18, num_layers=2)
    p = m.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (4, 32))
    c = canonical_c(4)
    ws = m(p, z, c)
    assert ws.shape == (4, 18, 64)
    # broadcast rows identical
    np.testing.assert_allclose(np.asarray(ws[:, 0]), np.asarray(ws[:, 5]))
    # truncation_psi=0 with cutoff collapses head rows to w_avg (zeros at init)
    ws_t = m(p, z, c, truncation_psi=0.0, truncation_cutoff=14)
    np.testing.assert_allclose(np.asarray(ws_t[:, :14]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ws_t[:, 14:]), np.asarray(ws[:, 14:]))


# --------------------------------------------------------------------- generator


def test_full_size_latent_layout():
    """The production config must reproduce the reference latent contract:
    num_ws=18, 8 geometry + 10 appearance (apps/train_hybrid_encoder.py:208)."""
    G = Ide3dGenerator(GeneratorConfig())
    assert G.num_ws == 18
    assert G.synthesis.num_ws_geo == 8
    assert G.synthesis.voxel_block_resolutions == (4, 8, 16, 32, 64, 128, 256)
    assert G.synthesis.block_resolutions == (64, 128, 256, 512)
    assert G.synthesis.render_size == 64
    assert G.w_dim == 512 and G.z_dim == 512 and G.c_dim == 25


def test_generator_forward_shapes(tiny_G):
    G, params = tiny_G
    z = jax.random.normal(jax.random.PRNGKey(1), (2, G.z_dim))
    c = canonical_c(2)
    out = G(params, z, c, return_all=True)
    R = G.cfg.img_resolution
    assert out["img"].shape == (2, R, R, 3)
    assert out["img_raw"].shape == (2, G.cfg.render_size, G.cfg.render_size, 3)
    assert out["seg"].shape == (2, R, R, 19)
    assert out["seg_raw"].shape == (2, G.cfg.render_size, G.cfg.render_size, 19)
    assert out["depth"].shape == (2, G.cfg.render_size, G.cfg.render_size, 1)
    assert np.isfinite(np.asarray(out["img"])).all()


def test_generator_return_variants(tiny_G):
    G, params = tiny_G
    ws = G.mapping(params["mapping"], jax.random.normal(jax.random.PRNGKey(2), (1, G.z_dim)), canonical_c(1))
    img = G.synthesis(params["synthesis"], ws, canonical_c(1))
    img2, seg = G.synthesis(params["synthesis"], ws, canonical_c(1), return_seg=True)
    img3, raw = G.synthesis(params["synthesis"], ws, canonical_c(1), return_raw=True)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img2))
    np.testing.assert_allclose(np.asarray(img), np.asarray(img3))
    assert seg.shape[-1] == 19 and raw.shape[1] == G.cfg.render_size


def test_geometry_appearance_split(tiny_G):
    """Style-mixing semantics (apps/demo.py:142-143, Painter/run_UI.py:198):
    geometry rows drive the semantic output; swapping appearance rows must leave the
    raw semantic render unchanged."""
    G, params = tiny_G
    n_geo = G.synthesis.num_ws_geo
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    ws_a = G.mapping(params["mapping"], jax.random.normal(k1, (1, G.z_dim)), canonical_c(1))
    ws_b = G.mapping(params["mapping"], jax.random.normal(k2, (1, G.z_dim)), canonical_c(1))

    mixed = jnp.concatenate([ws_a[:, :n_geo], ws_b[:, n_geo:]], axis=1)
    out_a = G.synthesis(params["synthesis"], ws_a, canonical_c(1), return_all=True)
    out_m = G.synthesis(params["synthesis"], mixed, canonical_c(1), return_all=True)

    np.testing.assert_allclose(
        np.asarray(out_a["seg_raw"]), np.asarray(out_m["seg_raw"]), atol=1e-5
    )
    # appearance change must alter the RGB
    assert np.abs(np.asarray(out_a["img"]) - np.asarray(out_m["img"])).max() > 1e-4


def test_view_consistency_of_geometry(tiny_G):
    """Different camera poses share the same planes; seg differs per view but both
    are finite and in plausible ranges."""
    G, params = tiny_G
    ws = G.mapping(params["mapping"], jax.random.normal(jax.random.PRNGKey(4), (1, G.z_dim)), canonical_c(1))
    for yaw in (-0.5, 0.5):
        c2w = render.look_at_pose(yaw + math.pi / 2, math.pi / 2, [0.0, 0.0, 0.0], radius=2.7)
        c = render.make_label_25(c2w)
        img, seg = G.synthesis(params["synthesis"], ws, c, return_seg=True)
        assert np.isfinite(np.asarray(img)).all() and np.isfinite(np.asarray(seg)).all()


def test_sample_voxel_through_generator(tiny_G):
    """extract_shapes contract: plane generation + renderer.sample_voxel -> 52ch,
    sigma last (extract_shapes.py:146-147 with feature_channels=32; tiny uses 8)."""
    G, params = tiny_G
    ws = G.mapping(params["mapping"], jax.random.normal(jax.random.PRNGKey(5), (1, G.z_dim)), canonical_c(1))
    img_v, seg_v = G.synthesis.generate_planes(params["synthesis"], ws)
    coords = jax.random.uniform(jax.random.PRNGKey(6), (1, 64, 3), minval=-0.3, maxval=0.3)
    out = G.synthesis.renderer.sample_voxel(params["synthesis"]["renderer"], img_v, seg_v, coords)
    fc = G.cfg.feature_channels
    assert out.shape == (1, 64, fc + 19 + 1)


def test_generator_grad_flows(tiny_G):
    G, params = tiny_G

    def loss_fn(p):
        ws = G.mapping(p["mapping"], jnp.ones((1, G.z_dim)), canonical_c(1))
        img = G.synthesis(p["synthesis"], ws, canonical_c(1))
        return jnp.mean(jnp.square(img))

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # vb conv weights must receive gradient (geometry path reaches the image)
    g = np.asarray(grads["synthesis"]["vb4"]["conv"]["weight"])
    assert np.abs(g).max() > 0


# ------------------------------------------------------------------ discriminator


def test_discriminator_shapes():
    D = Discriminator(DiscriminatorConfig(img_resolution=64, img_channels=6,
                                          channel_base=2048, channel_max=64, dtype="float32"))
    p = D.init(jax.random.PRNGKey(0))
    img = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 64, 6))
    logits = D(p, img, canonical_c(4))
    assert logits.shape == (4, 1)
    assert np.isfinite(np.asarray(logits)).all()


def test_discriminator_unconditional():
    D = Discriminator(DiscriminatorConfig(c_dim=0, img_resolution=32, img_channels=3,
                                          channel_base=1024, channel_max=32, dtype="float32"))
    p = D.init(jax.random.PRNGKey(0))
    logits = D(p, jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3)), None)
    assert logits.shape == (2, 1)


# ----------------------------------------------------------------------- encoders


def test_hybrid_encoder_latent_split():
    E = HybridEncoder(size=64, n_latents_app=10, n_latents_geo=8, w_dim=32)
    p = E.init(jax.random.PRNGKey(0))
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    seg = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 64, 19))
    ws = E(p, img, seg)
    assert ws.shape == (2, 18, 32)
    # geometry rows must not depend on the image stream
    ws2 = E(p, img * 0 + 1.0, seg)
    np.testing.assert_allclose(np.asarray(ws[:, :8]), np.asarray(ws2[:, :8]), atol=1e-6)
    assert np.abs(np.asarray(ws[:, 8:]) - np.asarray(ws2[:, 8:])).max() > 1e-6


def test_single_stream_encoder():
    E = Encoder(size=32, n_latents=18, w_dim=16)
    p = E.init(jax.random.PRNGKey(0))
    out = E(p, jax.random.normal(jax.random.PRNGKey(1), (3, 32, 32, 3)))
    assert out.shape == (3, 18, 16)


def test_multiview_encoder():
    E = MultiViewHybridEncoder(size=32, n_latents_app=10, n_latents_geo=8, w_dim=16, num_view=3)
    p = E.init(jax.random.PRNGKey(0))
    img = jax.random.normal(jax.random.PRNGKey(1), (6, 32, 32, 3))  # V*B = 3*2
    seg = jax.random.normal(jax.random.PRNGKey(2), (6, 32, 32, 19))
    ws = E(p, img, seg)
    assert ws.shape == (2, 18, 16)


def test_generator_cond_img_pathway():
    """Optional image-conditioning encoder (contract: inversion/networks.py:1237-1251,
    consumed via cond_img by apps/infer_face_animation_avatar.py:114)."""
    cfg = tiny_cfg(use_encoder=True)
    G = Ide3dGenerator(cfg)
    p = G.init(jax.random.PRNGKey(0))
    img_in = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.img_resolution, cfg.img_resolution, 3))
    out = G(p, cond_img=img_in)
    assert out.shape == (2, cfg.img_resolution, cfg.img_resolution, 3)
    ws, cam = G.encode(p, img_in)
    assert ws.shape == (2, G.num_ws, cfg.w_dim)
    assert cam.shape == (2, 2)


def test_sg3_layer_and_schedule():
    from ide3d_tpu.models.layers_sg3 import SynthesisLayer3, sg3_layer_schedule

    sched = sg3_layer_schedule(num_layers=14, img_resolution=128)
    assert len(sched["sizes"]) == 15
    assert sched["sizes"][-1] == 128 and sched["cutoffs"][-1] == 64

    layer = SynthesisLayer3(
        w_dim=32, is_torgb=False, in_channels=8, out_channels=8,
        in_size=16, out_size=16, in_sampling_rate=16, out_sampling_rate=16,
        in_cutoff=6, out_cutoff=6, in_half_width=2, out_half_width=2,
    )
    p = layer.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 8))
    w = jax.random.normal(jax.random.PRNGKey(2), (2, 32))
    y = layer(p, x, w)
    assert y.shape == (2, 16, 16, 8)
    assert np.isfinite(np.asarray(y)).all()

    torgb = SynthesisLayer3(
        w_dim=32, is_torgb=True, in_channels=8, out_channels=3,
        in_size=16, out_size=16, in_sampling_rate=16, out_sampling_rate=16,
        in_cutoff=8, out_cutoff=8, in_half_width=2, out_half_width=2,
    )
    tp = torgb.init(jax.random.PRNGKey(3))
    img = torgb(tp, x, w)
    assert img.shape == (2, 16, 16, 3)


def test_feature_volume():
    from ide3d_tpu.models.feature_volume import FeatureVolume
    from ide3d_tpu.ops import sample_from_3dgrid

    fv = FeatureVolume(feat_res=16, init_res=4, base_channels=32, output_channels=8,
                       z_dim=16)
    p = fv.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    vol = fv(p, z)
    assert vol.shape == (2, 16, 16, 16, 8)
    assert np.isfinite(np.asarray(vol)).all()
    # instance-norm'd + lrelu: per-sample stats bounded
    coords = jax.random.uniform(jax.random.PRNGKey(2), (2, 50, 3), minval=-1, maxval=1)
    feats = sample_from_3dgrid(coords, vol)
    assert feats.shape == (2, 50, 8)


# ------------------------------------------------- hybrid voxel branch + SG3 SR


def test_hybrid_feature_volume_generator():
    """VERDICT item 6: GeneratorConfig.use_feature_volume mixes VolumeGAN
    3D-grid features into sample_voxel; the branch changes the output and
    receives gradients."""
    cfg = tiny_cfg(use_feature_volume=True, fv_resolution=8, fv_base_channels=16)
    G = Ide3dGenerator(cfg)
    params = G.init(jax.random.PRNGKey(0))
    assert "feature_volume" in params["synthesis"]

    z = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.z_dim))
    c = canonical_c()
    img = jax.jit(lambda p, z, c: G(p, z, c))(params, z, c)
    assert img.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(img)).all()

    # ablating the volume branch changes the render (it is actually wired in)
    params_off = jax.tree_util.tree_map(jnp.copy, params)
    fv = params_off["synthesis"]["feature_volume"]
    fv_zero = jax.tree_util.tree_map(jnp.zeros_like, fv)
    params_off["synthesis"]["feature_volume"] = fv_zero
    img_off = jax.jit(lambda p, z, c: G(p, z, c))(params_off, z, c)
    assert np.abs(np.asarray(img) - np.asarray(img_off)).max() > 1e-4

    # gradients flow into the voxel branch
    def loss(p):
        return jnp.mean(jnp.square(G(p, z, c)))

    g = jax.grad(loss)(params)
    gnorm = sum(
        float(jnp.sum(jnp.abs(leaf)))
        for leaf in jax.tree_util.tree_leaves(g["synthesis"]["feature_volume"])
    )
    assert gnorm > 0


def test_hybrid_sample_voxel_contract():
    """sample_voxel keeps the [feat|seg|sigma-last] contract with the volume."""
    cfg = tiny_cfg(use_feature_volume=True, fv_resolution=8, fv_base_channels=16)
    G = Ide3dGenerator(cfg)
    params = G.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.z_dim))
    ws = G.mapping(params["mapping"], z, canonical_c())
    syn = G.synthesis
    img_v, seg_v = syn.generate_planes(params["synthesis"], ws)
    volume = syn._feature_volume()(params["synthesis"]["feature_volume"], ws[:, 0])
    coords = jax.random.uniform(jax.random.PRNGKey(2), (1, 33, 3), minval=-1, maxval=1)
    out = syn.renderer.sample_voxel(
        params["synthesis"]["renderer"], img_v, seg_v, coords, volume=volume
    )
    assert out.shape == (1, 33, cfg.feature_channels + cfg.seg_channels + 1)
    out_no = syn.renderer.sample_voxel(
        params["synthesis"]["renderer"], img_v, seg_v, coords
    )
    assert np.abs(np.asarray(out) - np.asarray(out_no)).max() > 1e-5


def test_sg3_superres_generator():
    """sr_arch='sg3': alias-free superres stack consumes the same w-row budget
    (num_ws unchanged) and renders the full resolution."""
    cfg = tiny_cfg(sr_arch="sg3")
    cfg_sg2 = tiny_cfg()
    G = Ide3dGenerator(cfg)
    assert G.num_ws == Ide3dGenerator(cfg_sg2).num_ws
    params = G.init(jax.random.PRNGKey(0))
    assert "sg3_sr" in params["synthesis"]
    z = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.z_dim))
    img, seg = jax.jit(lambda p, z, c: G(p, z, c, return_seg=True))(
        params, z, canonical_c()
    )
    assert img.shape == (1, 64, 64, 3)
    assert seg.shape == (1, 64, 64, 19)
    assert np.isfinite(np.asarray(img)).all()


def test_two_phase_frame_matches_fused(tiny_G):
    """The latency-optimized two-program frame must be numerically identical to
    the fused single-program synthesis (same params/ws/c, deterministic path)."""
    from ide3d_tpu.models.generator import make_two_phase_frame

    G, params = tiny_G
    z = jax.random.normal(jax.random.PRNGKey(5), (2, G.cfg.z_dim))
    c = canonical_c(2)
    ws = G.mapping(params["mapping"], z, c)
    img_1, seg_1 = jax.jit(
        lambda p, w, cc: G.synthesis(p, w, cc, return_seg=True)
    )(params["synthesis"], ws, c)
    # guard against NaN==NaN silently passing assert_allclose (equal_nan=True):
    # a jit-only XLA-rewrite NaN in the compositing slipped through exactly here.
    assert np.isfinite(np.asarray(img_1)).all() and np.isfinite(np.asarray(seg_1)).all()
    frame = make_two_phase_frame(G.synthesis, G.cfg.render, return_seg=True)
    img_2, seg_2 = frame(params["synthesis"], ws, c)
    np.testing.assert_allclose(np.asarray(img_2), np.asarray(img_1), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(seg_2), np.asarray(seg_1), atol=1e-5, rtol=1e-5)


def test_jitted_synthesis_matches_eager(tiny_G):
    """jit(synthesis) must be finite AND match the eager forward: XLA rewrites
    can introduce NaNs that eager never produces (the log(1-α+ε) reassociation
    fixed in render/integration.integrate_rays_merged), and the golden test runs
    eagerly so it cannot catch them."""
    G, params = tiny_G
    z = jax.random.normal(jax.random.PRNGKey(11), (2, G.cfg.z_dim))
    c = canonical_c(2)
    ws = G.mapping(params["mapping"], z, c)
    eager = G.synthesis(params["synthesis"], ws, c)
    jitted = jax.jit(lambda p, w, cc: G.synthesis(p, w, cc))(params["synthesis"], ws, c)
    assert np.isfinite(np.asarray(jitted)).all()
    np.testing.assert_allclose(np.asarray(jitted), np.asarray(eager), atol=1e-4, rtol=1e-4)


def test_pipelined_frame_all_cuts_match_fused(tiny_G):
    """Every cut configuration of make_pipelined_frame (1–4 chained XLA
    programs) is numerically identical to the fused synthesis."""
    from ide3d_tpu.models.generator import make_pipelined_frame

    G, params = tiny_G
    z = jax.random.normal(jax.random.PRNGKey(7), (1, G.cfg.z_dim))
    c = canonical_c(1)
    ws = G.mapping(params["mapping"], z, c)
    img_ref, seg_ref = jax.jit(
        lambda p, w, cc: G.synthesis(p, w, cc, return_seg=True)
    )(params["synthesis"], ws, c)
    assert np.isfinite(np.asarray(img_ref)).all()
    assert np.isfinite(np.asarray(seg_ref)).all()  # allclose is equal_nan=True
    for cuts in [(), ("planes",), ("fine",), ("planes", "coarse", "fine")]:
        frame = make_pipelined_frame(G.synthesis, G.cfg.render,
                                     return_seg=True, cuts=cuts)
        img, seg = frame(params["synthesis"], ws, c)
        np.testing.assert_allclose(np.asarray(img), np.asarray(img_ref),
                                   atol=1e-5, rtol=1e-5, err_msg=str(cuts))
        np.testing.assert_allclose(np.asarray(seg), np.asarray(seg_ref),
                                   atol=1e-5, rtol=1e-5, err_msg=str(cuts))


def test_pipelined_frame_epilogue_fused(tiny_G):
    """epilogue= fuses a caller reduction into the LAST program (bench.py's
    sync checksum rides the fine program instead of a third dispatch) and
    leaves img/seg bit-identical to the epilogue-free frame."""
    from ide3d_tpu.models.generator import make_pipelined_frame

    G, params = tiny_G
    z = jax.random.normal(jax.random.PRNGKey(7), (1, G.cfg.z_dim))
    c = canonical_c(1)
    ws = G.mapping(params["mapping"], z, c)
    base = make_pipelined_frame(G.synthesis, G.cfg.render, return_seg=True,
                                cuts=("coarse",))
    img_ref, seg_ref = base(params["synthesis"], ws, c)

    def checksum(img, seg):
        return jnp.sum(img.astype(jnp.float32)) + jnp.sum(seg.astype(jnp.float32))

    frame = make_pipelined_frame(G.synthesis, G.cfg.render, return_seg=True,
                                 cuts=("coarse",), epilogue=checksum)
    img, seg, chk = frame(params["synthesis"], ws, c)
    assert np.isfinite(float(chk))
    np.testing.assert_array_equal(np.asarray(img), np.asarray(img_ref))
    np.testing.assert_array_equal(np.asarray(seg), np.asarray(seg_ref))
    np.testing.assert_allclose(
        float(chk),
        float(np.asarray(img_ref, np.float32).sum()
              + np.asarray(seg_ref, np.float32).sum()),
        rtol=1e-5)


def test_two_phase_frame_hybrid(tiny_G):
    """Two-phase frame carries the hybrid voxel branch too."""
    from ide3d_tpu.models.generator import make_two_phase_frame

    cfg = tiny_cfg(use_feature_volume=True, fv_resolution=8, fv_base_channels=16)
    G = Ide3dGenerator(cfg)
    params = G.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(5), (1, cfg.z_dim))
    c = canonical_c(1)
    ws = G.mapping(params["mapping"], z, c)
    img_1 = jax.jit(lambda p, w, cc: G.synthesis(p, w, cc))(params["synthesis"], ws, c)
    assert np.isfinite(np.asarray(img_1)).all()
    frame = make_two_phase_frame(G.synthesis, cfg.render, return_seg=False)
    img_2 = frame(params["synthesis"], ws, c)
    np.testing.assert_allclose(np.asarray(img_2), np.asarray(img_1), atol=1e-5, rtol=1e-5)
