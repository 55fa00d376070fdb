"""ADA augmentation pipe + latent editing tests."""

import numpy as np
import jax
import jax.numpy as jnp

from ide3d_tpu.train.augment import (
    AdaState,
    AugmentConfig,
    ada_accumulate,
    ada_init,
    ada_update,
    augment_pipe,
)
from ide3d_tpu.editing import (
    LevelsMapper,
    apply_ganspace_edit,
    apply_interfacegan,
    compute_ganspace_pca,
)


def test_augment_identity_at_p0(rng):
    x = jnp.asarray(rng.randn(4, 16, 16, 3).astype(np.float32))
    y = augment_pipe(jax.random.PRNGKey(0), x, jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)


def test_augment_changes_at_p1(rng):
    x = jnp.asarray(rng.randn(4, 16, 16, 3).astype(np.float32))
    y = augment_pipe(jax.random.PRNGKey(0), x, jnp.asarray(1.0))
    assert np.isfinite(np.asarray(y)).all()
    assert np.abs(np.asarray(y) - np.asarray(x)).max() > 0.1


def test_augment_jits_once_for_all_p(rng):
    x = jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32))
    f = jax.jit(lambda k, x, p: augment_pipe(k, x, p))
    y0 = f(jax.random.PRNGKey(0), x, jnp.asarray(0.0))
    y1 = f(jax.random.PRNGKey(0), x, jnp.asarray(0.7))  # same trace, p is data
    assert y0.shape == y1.shape


def test_ada_controller_moves_p():
    st = ada_init()
    # strongly positive real logits -> overfitting signal -> p goes up
    for _ in range(4):
        st = ada_accumulate(st, jnp.sign(jnp.ones((8,)) * 2.0).mean(), 8)
    st = ada_update(st, batch_size=32, target=0.6, speed_kimg=1.0)
    assert float(st.p) > 0
    # negative logits -> p pushed back toward 0
    st2 = ada_accumulate(st, jnp.sign(-jnp.ones((8,)) * 2.0).mean(), 8)
    st2 = ada_update(st2, batch_size=32, target=0.6, speed_kimg=1.0)
    assert float(st2.p) < float(st.p)


def test_ada_controller_p_max_caps_runaway():
    """With D fully memorizing (rt pinned at 1.0 > target) p integrates upward
    without bound; p_max caps it (the measured FID-collapse mitigation,
    TRAINING.md extended run)."""
    st = AdaState(p=jnp.asarray(0.29), rt_accum=jnp.zeros((2,)))
    for _ in range(10):
        st = ada_accumulate(st, 1.0, 32)
        st = ada_update(st, batch_size=32, target=0.6, speed_kimg=0.001,
                        p_max=0.3)
    assert abs(float(st.p) - 0.3) < 1e-6


def test_ada_controller_is_mean_of_sign_not_sign_of_mean():
    """Per-sample semantics (VERDICT item 3): a batch with logits
    [+10, -1, -1, -1] has sign-mean -0.5 (p should go DOWN with target 0.6),
    even though the mean logit is positive (sign-of-mean would push p UP)."""
    logits = jnp.asarray([10.0, -1.0, -1.0, -1.0])
    st = AdaState(p=jnp.asarray(0.5), rt_accum=jnp.zeros((2,)))
    st = ada_accumulate(st, jnp.sign(logits).mean(), logits.size)
    rt = float(st.rt_accum[0] / st.rt_accum[1])
    assert rt == -0.5
    st = ada_update(st, batch_size=32, target=0.6, speed_kimg=1.0)
    assert float(st.p) < 0.5


def test_wavelet_warp_identity_is_exact(rng):
    """sym6 is orthonormal: setup_filter-normalized up2 -> down2(flip) is exact
    perfect reconstruction (even-lag autocorrelation = delta), and the identity
    warp lands on-grid at the 2x scale — so the whole AA pipeline must return
    the input to float precision."""
    from ide3d_tpu.train.augment import AugmentConfig, _apply_warp

    x = jnp.asarray(rng.randn(2, 16, 16, 4).astype(np.float32))
    G = jnp.broadcast_to(jnp.eye(3), (2, 3, 3))
    y = _apply_warp(x, G, AugmentConfig(wavelet_aa=True))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)


def test_wavelet_warp_integer_translate_is_exact(rng):
    """Integer translation stays on-grid through the 2x pipeline (the forward
    map only shifts the fine grid by an even count), so interior columns must
    reproduce the direct pixel shift exactly. NOTE: xflip does NOT share this
    property — the upsampled grid carries a half-fine-pixel phase that flip
    reverses, so the reference pipeline blurs pure flips too (measured 0.521
    max-err in torch vs 0.514 here on the same input; parity is pinned by
    test_wavelet_warp_matches_reference_execution)."""
    from ide3d_tpu.train.augment import AugmentConfig, _apply_warp, _translate2d

    cfg = AugmentConfig(wavelet_aa=True)
    x = jnp.asarray(rng.randn(1, 16, 16, 3).astype(np.float32))
    Gt = _translate2d(jnp.asarray([2 * 2.0 / 16]), jnp.asarray([0.0]))
    yt = _apply_warp(x, Gt, cfg)
    np.testing.assert_allclose(
        np.asarray(yt)[:, :, 4:], np.asarray(x)[:, :, 2:-2], atol=1e-4)


def test_wavelet_warp_matches_reference_execution(rng):
    """Pin the full AA execution against an in-test torch oracle that follows
    the reference's algebra verbatim (training/augment.py:290-306): reflect pad
    -> sym6 2x upsample -> affine_grid/grid_sample warp (align_corners=False,
    zeros) -> sym6 downsample with -Hz_pad*2 crop. The up/down filters reuse
    ops.upfirdn2d (independently pinned vs torch in test_ops); the torch side
    here supplies the warp + the matrix-convention ground truth."""
    import torch
    import torch.nn.functional as F

    from ide3d_tpu.ops.upfirdn2d import downsample2d, setup_filter, upsample2d
    from ide3d_tpu.train.augment import (WAVELET_SYM6, AugmentConfig,
                                         _apply_warp_wavelet)

    H = W = 16
    C = 2
    x_np = rng.randn(1, H, W, C).astype(np.float32)
    f = setup_filter(WAVELET_SYM6)
    hz = len(WAVELET_SYM6) // 4
    cfg = AugmentConfig(wavelet_aa=True, wavelet_margin=0.125)
    m = int(np.ceil(cfg.wavelet_margin * W)) + 2 * hz

    th = 0.3
    cases = {
        "identity": np.eye(3),
        "xflip": np.diag([-1.0, 1.0, 1.0]),
        "translate": np.asarray([[1, 0, -2.0], [0, 1, 1.0], [0, 0, 1]]),
        "rotate": np.asarray([[np.cos(th), np.sin(th), 0],
                              [-np.sin(th), np.cos(th), 0], [0, 0, 1]]),
    }
    N = np.diag([2.0 / W, 2.0 / H, 1.0])  # centered px -> normalized
    for name, Ginv_px in cases.items():
        Ginv_px = Ginv_px.astype(np.float32)
        # --- oracle (reference execution block, torch warp)
        xp = np.pad(x_np, ((0, 0), (m, m), (m, m), (0, 0)), mode="reflect")
        up = np.asarray(upsample2d(jnp.asarray(xp), f, up=2))
        Hi, Wi = up.shape[1], up.shape[2]
        Ho, Wo = (H + 2 * hz) * 2, (W + 2 * hz) * 2
        S2 = np.diag([2.0, 2.0, 1.0])
        T = np.asarray([[1, 0, -0.5], [0, 1, -0.5], [0, 0, 1]], np.float32)
        Gi = S2 @ Ginv_px @ np.linalg.inv(S2)
        Gi = T @ Gi @ np.linalg.inv(T)
        theta = (np.diag([2.0 / Wi, 2.0 / Hi, 1.0]) @ Gi
                 @ np.linalg.inv(np.diag([2.0 / Wo, 2.0 / Ho, 1.0])))
        grid = F.affine_grid(torch.as_tensor(theta[None, :2, :].astype(np.float32)),
                             (1, C, Ho, Wo), align_corners=False)
        warped = F.grid_sample(
            torch.as_tensor(np.transpose(up, (0, 3, 1, 2))), grid,
            mode="bilinear", padding_mode="zeros", align_corners=False)
        oracle = np.asarray(downsample2d(
            jnp.asarray(np.transpose(warped.numpy(), (0, 2, 3, 1))), f,
            down=2, padding=-hz * 2, flip_filter=True))
        # --- ours (takes the inverse matrix in normalized coordinates)
        Ginv_norm = jnp.asarray((N @ Ginv_px @ np.linalg.inv(N))[None])
        mine = np.asarray(_apply_warp_wavelet(jnp.asarray(x_np), Ginv_norm, cfg))
        np.testing.assert_allclose(mine, oracle, atol=2e-5, err_msg=name)


def test_wavelet_warp_close_to_bilinear_on_smooth_content():
    """On smooth content the two execution forms agree (AA only changes the
    treatment of frequencies near Nyquist); a general rotation is off-grid so
    they are NOT bit-equal."""
    from ide3d_tpu.train.augment import AugmentConfig, _apply_warp, _rot2d

    H = 32
    yy, xx = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, H), indexing="ij")
    smooth = np.stack([np.sin(2 * xx + yy), np.cos(xx - yy), xx * yy], -1)
    x = jnp.asarray(smooth[None].astype(np.float32))
    G = _rot2d(jnp.asarray([0.3]))
    y_b = _apply_warp(x, G, AugmentConfig(wavelet_aa=False))
    y_w = _apply_warp(x, G, AugmentConfig(wavelet_aa=True))
    # compare away from the border (zeros vs reflect semantics differ there)
    b = np.asarray(y_b)[:, 6:-6, 6:-6]
    w = np.asarray(y_w)[:, 6:-6, 6:-6]
    assert np.isfinite(w).all()
    assert np.abs(b - w).max() < 0.05
    assert np.abs(b - w).max() > 0  # genuinely different execution


def test_wavelet_pipe_jits_and_grads(rng):
    """Full pipe with wavelet_aa: p stays pure data (one trace), output and
    input-gradient finite (the warp sits inside the jitted D/G losses)."""
    from ide3d_tpu.train.augment import AugmentConfig, augment_pipe

    cfg = AugmentConfig(wavelet_aa=True)
    x = jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32))
    f = jax.jit(lambda k, x, p: augment_pipe(k, x, p, cfg))
    y0 = f(jax.random.PRNGKey(0), x, jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(y0), np.asarray(x), atol=1e-4)
    y1 = f(jax.random.PRNGKey(0), x, jnp.asarray(1.0))
    assert np.isfinite(np.asarray(y1)).all()
    assert np.abs(np.asarray(y1) - np.asarray(x)).max() > 0.1

    g = jax.jit(jax.grad(
        lambda img: jnp.sum(augment_pipe(jax.random.PRNGKey(0), img,
                                         jnp.asarray(1.0), cfg) ** 2)))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_augment_d_input_keeps_seg_aligned_with_rgb(rng):
    """The ADA leak fix (VERDICT item 3): seg channels get the SAME geometric
    warp as the RGB channels. Feed identical content as img and seg (with color
    off): outputs must be identical. With color on, img changes but seg stays
    geometric-only."""
    from ide3d_tpu.train.augment import augment_d_input

    content = rng.randn(4, 16, 16, 3).astype(np.float32)
    img = jnp.asarray(content)
    seg = jnp.asarray(content.copy())
    no_color = AugmentConfig(brightness=0, contrast=0, lumaflip=0, hue=0, saturation=0)
    a_img, a_raw, a_seg = augment_d_input(
        jax.random.PRNGKey(3), img, img, seg, jnp.asarray(1.0), no_color
    )
    np.testing.assert_allclose(np.asarray(a_img), np.asarray(a_seg), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_raw), np.asarray(a_seg), atol=1e-5)
    # something actually warped
    assert np.abs(np.asarray(a_img) - content).max() > 0.1

    # with color enabled: rgb stacks share ONE color matrix; seg untouched by it
    a_img2, a_raw2, a_seg2 = augment_d_input(
        jax.random.PRNGKey(3), img, img, seg, jnp.asarray(1.0), AugmentConfig()
    )
    np.testing.assert_allclose(np.asarray(a_img2), np.asarray(a_raw2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_seg2), np.asarray(a_seg), atol=1e-5)
    assert np.abs(np.asarray(a_img2) - np.asarray(a_seg2)).max() > 1e-3


def test_gan_step_augments_real_and_fake_the_same_way():
    """At ada_p=1 both the real and fake D inputs go through the pipe: the D loss
    at p=1 differs from p=0 on BOTH logits stats, while p is pure data (no
    retrace)."""
    import jax as _jax

    from ide3d_tpu import render
    from ide3d_tpu.models import Discriminator, DiscriminatorConfig, GeneratorConfig, Ide3dGenerator
    from ide3d_tpu.render.renderer import RenderParams
    from ide3d_tpu.train import GanTrainConfig, init_gan_state, make_gan_train_step
    from ide3d_tpu.train.gan import d_input_channels

    gcfg = GeneratorConfig(
        img_resolution=32, render_size=8, plane_resolution=16, channel_base=512,
        channel_max=32, sr_channel_base=256, sr_channel_max=16, feature_channels=8,
        dtype="float32", render=RenderParams(img_size=8, num_steps=4),
    )
    tcfg = GanTrainConfig(r1_interval=4)
    G = Ide3dGenerator(gcfg)
    D = Discriminator(DiscriminatorConfig(
        img_resolution=32, img_channels=d_input_channels(tcfg, gcfg),
        channel_base=512, channel_max=32, dtype="float32"))
    state = init_gan_state(_jax.random.PRNGKey(0), G, D, tcfg)
    step = make_gan_train_step(G, D, tcfg)
    b = np.random.RandomState(0)
    batch = {
        "img": jnp.asarray(b.randn(2, 32, 32, 3).astype(np.float32)),
        "seg": jnp.asarray(b.randn(2, 32, 32, 19).astype(np.float32)),
        "c": jnp.broadcast_to(jnp.asarray(render.CANONICAL_POSE_25), (2, 25)),
    }
    state_copy = _jax.tree_util.tree_map(jnp.copy, state)  # step donates its state arg
    _, stats0 = step(state, batch, _jax.random.PRNGKey(1), 0.0)
    _, stats1 = step(state_copy, batch, _jax.random.PRNGKey(1), 1.0)
    assert abs(float(stats1["real_logits"]) - float(stats0["real_logits"])) > 1e-6
    assert abs(float(stats1["fake_logits"]) - float(stats0["fake_logits"])) > 1e-6
    assert "real_signs" in stats0


def test_ganspace_pca_and_edit():
    from ide3d_tpu.models import GeneratorConfig, Ide3dGenerator
    from ide3d_tpu.render.renderer import RenderParams

    cfg = GeneratorConfig(
        img_resolution=32, render_size=8, plane_resolution=16,
        channel_base=512, channel_max=32, sr_channel_base=256, sr_channel_max=16,
        feature_channels=8, dtype="float32", render=RenderParams(img_size=8, num_steps=4),
    )
    G = Ide3dGenerator(cfg)
    params = G.init(jax.random.PRNGKey(0))
    pca = compute_ganspace_pca(G, params, n_samples=64, n_components=8)
    assert pca["comp"].shape == (8, cfg.w_dim)
    # components are orthonormal
    gram = pca["comp"] @ pca["comp"].T
    np.testing.assert_allclose(gram, np.eye(8), atol=1e-4)

    ws = jnp.zeros((2, G.num_ws, cfg.w_dim))
    edited = apply_ganspace_edit(ws, pca, [(0, 2, 5, 3.0)])
    delta = np.asarray(edited - ws)
    assert np.abs(delta[:, 2:5]).max() > 0
    np.testing.assert_allclose(delta[:, :2], 0)
    np.testing.assert_allclose(delta[:, 5:], 0)


def test_interfacegan_edit(rng):
    ws = jnp.asarray(rng.randn(1, 18, 16).astype(np.float32))
    d = jnp.asarray(rng.randn(1, 18, 16).astype(np.float32))
    out = apply_interfacegan(ws, d, 2.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ws + 2.0 * d), atol=1e-6)


def test_levels_mapper_edit(rng):
    m = LevelsMapper(w_dim=32, num_ws=18)
    p = m.init(jax.random.PRNGKey(0))
    ws = jnp.asarray(rng.randn(2, 18, 32).astype(np.float32))
    out = m.edit(p, ws)
    assert out.shape == ws.shape
    assert np.abs(np.asarray(out - ws)).max() > 0
    m2 = LevelsMapper(w_dim=32, num_ws=18, use_fine=False)
    out2 = m2.edit(p, ws)
    np.testing.assert_allclose(np.asarray(out2[:, 8:]), np.asarray(ws[:, 8:]), atol=1e-6)
