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
        st = ada_accumulate(st, jnp.ones((8,)) * 2.0)
    st = ada_update(st, batch_size=32, target=0.6, speed_kimg=1.0)
    assert float(st.p) > 0
    # negative logits -> p pushed back toward 0
    st2 = ada_accumulate(st, -jnp.ones((8,)) * 2.0)
    st2 = ada_update(st2, batch_size=32, target=0.6, speed_kimg=1.0)
    assert float(st2.p) < float(st.p)


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
