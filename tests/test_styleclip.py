"""StyleCLIP mapper: pretrained-checkpoint import parity + training-step tests.

Import parity follows the test_cnn_import.py strategy: the torch side
(StyleCLIP latent_mappers.Mapper = PixelNorm + 4 × EqualLinear(lr_mul=0.01,
fused_lrelu)) is reproduced numerically IN-TEST from its published math, a
shape-exact state_dict is built, imported via editing.import_levels_mapper,
and forwards are compared. The training coach (train/styleclip.py) is
exercised end-to-end with a tiny generator + tiny random CLIP.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
torch.set_grad_enabled(False)
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ide3d_tpu.editing.latent_editor import (  # noqa: E402
    STYLECLIP_EDITS,
    LevelsMapper,
    import_levels_mapper,
    levels_mapper_for_edit,
)

W_DIM = 32


# ------------------------------------------------- torch reference (in-test math)


def torch_equal_linear(x, weight, bias, lr_mul=0.01):
    """EqualLinear with fused_lrelu (StyleCLIP stylegan2/model.py): stored
    weight is unit-variance / lr_mul; scale = lr_mul/sqrt(in); activation is
    sqrt(2) * leaky_relu(x + bias*lr_mul, 0.2)."""
    scale = lr_mul / np.sqrt(weight.shape[1])
    out = F.linear(x, weight * scale)
    return np.sqrt(2.0) * F.leaky_relu(out + bias * lr_mul, 0.2)


def torch_mapper_forward(x, sd, group):
    # PixelNorm over dim=1 (model.py:15-16) — the ROW axis of [B, n, 512].
    x = x * torch.rsqrt(torch.mean(x ** 2, dim=1, keepdim=True) + 1e-8)
    for i in range(1, 5):
        x = torch_equal_linear(x, sd[f"{group}_mapping.mapping.{i}.weight"],
                               sd[f"{group}_mapping.mapping.{i}.bias"])
    return x


@pytest.fixture(scope="module")
def mapper_sd():
    g = torch.Generator().manual_seed(0)
    sd = {}
    for group in ("course", "medium", "fine"):
        for i in range(1, 5):
            sd[f"{group}_mapping.mapping.{i}.weight"] = (
                torch.randn(W_DIM, W_DIM, generator=g) / 0.01)
            sd[f"{group}_mapping.mapping.{i}.bias"] = torch.randn(W_DIM, generator=g)
    return sd


def test_levels_mapper_import_parity(mapper_sd):
    mapper, params = import_levels_mapper(
        {k: v.numpy() for k, v in mapper_sd.items()})
    mapper = LevelsMapper(w_dim=W_DIM, num_ws=18, use_coarse=mapper.use_coarse,
                          use_medium=mapper.use_medium, use_fine=mapper.use_fine)
    x = torch.randn(2, 18, W_DIM, generator=torch.Generator().manual_seed(1))
    want = torch.cat([
        torch_mapper_forward(x[:, :4], mapper_sd, "course"),
        torch_mapper_forward(x[:, 4:8], mapper_sd, "medium"),
        torch_mapper_forward(x[:, 8:], mapper_sd, "fine"),
    ], dim=1).numpy()
    got = np.asarray(mapper(params, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_levels_mapper_prefixed_and_partial(mapper_sd):
    # StyleCLIPMapper checkpoints store keys under 'mapper.'; hair edits
    # (e.g. 'afro') ship without the fine mapper.
    sd = {f"mapper.{k}": v.numpy() for k, v in mapper_sd.items()
          if not k.startswith("fine_")}
    mapper, params = import_levels_mapper(sd)
    assert mapper.use_coarse and mapper.use_medium and not mapper.use_fine
    assert set(params) == {"course", "medium"}
    m = LevelsMapper(w_dim=W_DIM, use_fine=False)
    ws = jnp.asarray(np.random.RandomState(0).randn(1, 18, W_DIM), jnp.float32)
    out = m.edit(params, ws)
    # fine rows untouched, coarse/medium moved
    np.testing.assert_array_equal(np.asarray(out[:, 8:]), np.asarray(ws[:, 8:]))
    assert float(jnp.abs(out[:, :8] - ws[:, :8]).max()) > 0


def test_edit_registry():
    assert len(STYLECLIP_EDITS) == 14
    m = levels_mapper_for_edit("afro")
    assert m.use_coarse and m.use_medium and not m.use_fine
    m = levels_mapper_for_edit("trump")
    assert m.use_coarse and m.use_medium and m.use_fine


# ----------------------------------------------------------------- training step


def test_styleclip_training_step():
    from ide3d_tpu.models.clip import CLIP, ClipConfig, SimpleTokenizer
    from ide3d_tpu.models.generator import Ide3dGenerator
    from ide3d_tpu.train.styleclip import (
        StyleClipConfig,
        init_styleclip_state,
        make_styleclip_step,
        sample_latents,
    )
    from test_train import tiny_gcfg

    G = Ide3dGenerator(tiny_gcfg())
    g_params = G.init(jax.random.PRNGKey(0))

    tiny_clip_cfg = ClipConfig(embed_dim=16, image_resolution=32, vision_layers=1,
                               vision_width=32, vision_patch_size=8,
                               context_length=12, vocab_size=520,
                               transformer_width=32, transformer_layers=1,
                               head_dim=16)
    clip_model = CLIP(cfg=tiny_clip_cfg)
    clip_params = clip_model.init(jax.random.PRNGKey(1))
    tok = SimpleTokenizer(merges=[("l", "o"), ("lo", "w</w>")])
    tokens = jnp.asarray(tok.tokenize(["low"], context_length=12))

    mapper = LevelsMapper(w_dim=G.w_dim, num_ws=G.num_ws)
    cfg = StyleClipConfig(lr=0.05, id_lambda=0.0, batch_size=2)
    state = init_styleclip_state(mapper, jax.random.PRNGKey(2), cfg)
    step = make_styleclip_step(G, g_params, mapper, clip_model, clip_params,
                               tokens, cfg)

    w = sample_latents(G, g_params, 2, jax.random.PRNGKey(3), cfg.truncation_psi)
    assert w.shape == (2, G.num_ws, G.w_dim)
    before = jax.tree_util.tree_map(jnp.copy, state.mapper_params)
    state, stats = step(state, w)
    state, stats = step(state, w)
    assert all(bool(jnp.isfinite(v)) for v in stats.values())
    assert {"loss", "loss_clip", "loss_l2_latent"} <= set(stats)
    moved = max(
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree_util.tree_leaves(before),
                        jax.tree_util.tree_leaves(state.mapper_params))
    )
    assert moved > 0


def test_styleclip_latent_optimization():
    """run_optimization.py mode: Adam directly on w+ under the cosine lr ramp;
    'edit' mode anchors to the init latent via the L2 term."""
    from ide3d_tpu.models.clip import CLIP, ClipConfig, SimpleTokenizer
    from ide3d_tpu.models.generator import Ide3dGenerator
    from ide3d_tpu.train.styleclip import optimize_latent, sample_latents
    from test_train import tiny_gcfg

    G = Ide3dGenerator(tiny_gcfg())
    g_params = G.init(jax.random.PRNGKey(0))
    cfg = ClipConfig(embed_dim=16, image_resolution=32, vision_layers=1,
                     vision_width=32, vision_patch_size=8, context_length=12,
                     vocab_size=520, transformer_width=32, transformer_layers=1,
                     head_dim=16)
    clip_model = CLIP(cfg=cfg)
    clip_params = clip_model.init(jax.random.PRNGKey(1))
    tok = SimpleTokenizer(merges=[("l", "o")])
    tokens = jnp.asarray(tok.tokenize(["lo"], context_length=12))

    w0 = sample_latents(G, g_params, 1, jax.random.PRNGKey(2))
    w_edit = optimize_latent(G, g_params, clip_model, clip_params, tokens, w0,
                             steps=6, lr=0.05, l2_lambda=1.0, log_every=0)
    assert w_edit.shape == w0.shape
    assert bool(jnp.isfinite(w_edit).all())
    assert float(jnp.abs(w_edit - w0).max()) > 0
    # strong L2 anchor keeps the edit close; free mode drifts farther
    w_free = optimize_latent(G, g_params, clip_model, clip_params, tokens, w0,
                             steps=6, lr=0.05, mode="free", log_every=0)
    assert float(jnp.sum((w_edit - w0) ** 2)) <= float(jnp.sum((w_free - w0) ** 2)) + 1e-4
