"""CLIP tower import-parity + tokenizer tests (weight-gated component).

The reference consumes OpenAI CLIP ViT-B/32 via the `clip` package
(inversion/networks.py:1800-1819 CLIPEncoder, StyleCLIP's clip_loss.py,
clip.tokenize in the mapper coach). No CLIP weights or vocab exist in this
environment, so — same strategy as tests/test_cnn_import.py — a small
reference-math torch CLIP is constructed IN-TEST with the OpenAI state_dict
naming, its weights are imported through models/clip.import_clip, and forward
parity is asserted for encode_image / encode_text / logits. The tokenizer is
exercised against a synthetic merges table with hand-computed expectations.
"""

import math
from collections import OrderedDict

import numpy as np
import pytest

torch = pytest.importorskip("torch")
torch.set_grad_enabled(False)
from torch import nn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from ide3d_tpu.models.clip import (  # noqa: E402
    CLIP,
    ClipConfig,
    SimpleTokenizer,
    clip_similarity_loss,
    config_from_state_dict,
    import_clip,
    make_image_embedder,
    text_direction,
)

# ----------------------------------------------------- torch reference (small)


class _QuickGELU(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class _Block(nn.Module):
    def __init__(self, d, h, mask=None):
        super().__init__()
        self.attn = nn.MultiheadAttention(d, h)
        self.ln_1 = nn.LayerNorm(d)
        self.mlp = nn.Sequential(OrderedDict([
            ("c_fc", nn.Linear(d, 4 * d)),
            ("gelu", _QuickGELU()),
            ("c_proj", nn.Linear(4 * d, d)),
        ]))
        self.ln_2 = nn.LayerNorm(d)
        self.mask = mask

    def forward(self, x):  # x: [L, N, D]
        m = self.mask.to(x.dtype) if self.mask is not None else None
        x = x + self.attn(self.ln_1(x), self.ln_1(x), self.ln_1(x),
                          need_weights=False, attn_mask=m)[0]
        return x + self.mlp(self.ln_2(x))


class _Transformer(nn.Module):
    def __init__(self, d, layers, h, mask=None):
        super().__init__()
        self.resblocks = nn.Sequential(*[_Block(d, h, mask) for _ in range(layers)])

    def forward(self, x):
        return self.resblocks(x)


class _Visual(nn.Module):
    def __init__(self, cfg: ClipConfig):
        super().__init__()
        w = cfg.vision_width
        self.conv1 = nn.Conv2d(3, w, cfg.vision_patch_size, cfg.vision_patch_size, bias=False)
        self.class_embedding = nn.Parameter(torch.randn(w) * w ** -0.5)
        self.positional_embedding = nn.Parameter(
            torch.randn(cfg.grid_size ** 2 + 1, w) * w ** -0.5)
        self.ln_pre = nn.LayerNorm(w)
        self.transformer = _Transformer(w, cfg.vision_layers, cfg.vision_heads)
        self.ln_post = nn.LayerNorm(w)
        self.proj = nn.Parameter(torch.randn(w, cfg.embed_dim) * w ** -0.5)

    def forward(self, x):
        x = self.conv1(x)
        x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
        cls = self.class_embedding[None, None].expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding
        x = self.ln_pre(x).permute(1, 0, 2)
        x = self.transformer(x).permute(1, 0, 2)
        return self.ln_post(x[:, 0]) @ self.proj


class _TorchClip(nn.Module):
    def __init__(self, cfg: ClipConfig):
        super().__init__()
        L = cfg.context_length
        mask = torch.triu(torch.full((L, L), float("-inf")), diagonal=1)
        self.visual = _Visual(cfg)
        self.transformer = _Transformer(
            cfg.transformer_width, cfg.transformer_layers, cfg.transformer_heads, mask)
        self.token_embedding = nn.Embedding(cfg.vocab_size, cfg.transformer_width)
        self.positional_embedding = nn.Parameter(
            torch.randn(L, cfg.transformer_width) * 0.01)
        self.ln_final = nn.LayerNorm(cfg.transformer_width)
        self.text_projection = nn.Parameter(
            torch.randn(cfg.transformer_width, cfg.embed_dim)
            * cfg.transformer_width ** -0.5)
        self.logit_scale = nn.Parameter(torch.tensor(math.log(1.0 / 0.07)))

    def encode_text(self, tokens):
        x = self.token_embedding(tokens) + self.positional_embedding
        x = self.transformer(x.permute(1, 0, 2)).permute(1, 0, 2)
        x = self.ln_final(x)
        x = x[torch.arange(x.shape[0]), tokens.argmax(dim=-1)]
        return x @ self.text_projection

    def forward(self, image, tokens):
        ei = self.visual(image)
        et = self.encode_text(tokens)
        ei = ei / ei.norm(dim=-1, keepdim=True)
        et = et / et.norm(dim=-1, keepdim=True)
        logits = self.logit_scale.exp() * ei @ et.t()
        return logits, logits.t()


# vocab 520 ≥ the tiny tokenizer's 256+256+5+2 = 519 ids (so text_direction's
# real token ids index real embedding rows).
TINY = ClipConfig(embed_dim=32, image_resolution=32, vision_layers=2,
                  vision_width=64, vision_patch_size=8, context_length=16,
                  vocab_size=520, transformer_width=48, transformer_layers=2,
                  head_dim=16)


@pytest.fixture(scope="module")
def torch_clip():
    torch.manual_seed(0)
    m = _TorchClip(TINY).eval()
    # Spread LayerNorm params away from identity so parity is meaningful.
    for n, p in m.named_parameters():
        if "ln_" in n or "ln_final" in n:
            p.add_(torch.randn_like(p) * 0.05)
    return m


@pytest.fixture(scope="module")
def imported(torch_clip):
    sd = {k: v.detach().numpy() for k, v in torch_clip.state_dict().items()}
    # head_dim is not shape-recoverable (OpenAI hardcodes 64); the tiny fixture
    # uses 16-dim heads.
    return import_clip(sd, head_dim=16)


def test_config_inference(torch_clip):
    sd = {k: v.detach().numpy() for k, v in torch_clip.state_dict().items()}
    cfg = config_from_state_dict(sd, head_dim=16)
    assert cfg == TINY


def test_encode_image_parity(torch_clip, imported):
    model, params = imported
    x = np.random.RandomState(1).randn(2, 32, 32, 3).astype(np.float32)
    got = np.asarray(model.encode_image(params, jnp.asarray(x)))
    want = torch_clip.visual(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_encode_text_parity(torch_clip, imported):
    model, params = imported
    toks = np.zeros((3, TINY.context_length), np.int64)
    toks[0, :5] = [517, 3, 7, 11, 518]   # sot, ..., eot (518 = max id)
    toks[1, :3] = [517, 20, 518]
    toks[2, :8] = [517, 1, 2, 3, 4, 5, 6, 518]
    got = np.asarray(model.encode_text(params, jnp.asarray(toks, jnp.int32)))
    want = torch_clip.encode_text(torch.from_numpy(toks)).numpy()
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_logits_parity(torch_clip, imported):
    model, params = imported
    x = np.random.RandomState(2).randn(2, 32, 32, 3).astype(np.float32)
    toks = np.zeros((2, TINY.context_length), np.int64)
    toks[0, :4] = [517, 9, 10, 518]
    toks[1, :4] = [517, 30, 31, 518]
    got_i, got_t = model(params, jnp.asarray(x), jnp.asarray(toks, jnp.int32))
    want_i, want_t = torch_clip(torch.from_numpy(x).permute(0, 3, 1, 2),
                                torch.from_numpy(toks))
    np.testing.assert_allclose(np.asarray(got_i), want_i.numpy(), atol=3e-4, rtol=3e-4)
    np.testing.assert_allclose(np.asarray(got_t), want_t.numpy(), atol=3e-4, rtol=3e-4)


def test_preprocess_pool_matches_torch(imported):
    """clip_loss.py:10-15 — Upsample(x7) + AvgPool2d(S/32)."""
    model, _ = imported
    S = 64  # 64*7 = 448, pool k=14 -> 32 (= TINY.image_resolution)
    x = np.random.RandomState(3).randn(1, S, S, 3).astype(np.float32)
    got = np.asarray(model.preprocess_pool(jnp.asarray(x)))
    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = nn.AvgPool2d(kernel_size=S * 7 // 32)(nn.Upsample(scale_factor=7)(t))
    np.testing.assert_allclose(got, want.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_preprocess_range_and_shape(imported):
    model, _ = imported
    x = jnp.zeros((1, 64, 64, 3))  # mid-gray in [-1,1]
    y = np.asarray(model.preprocess(x))
    assert y.shape == (1, 32, 32, 3)
    # 0.5 normalized by CLIP mean/std
    want = (0.5 - np.array([0.48145466, 0.4578275, 0.40821073])) / np.array(
        [0.26862954, 0.26130258, 0.27577711])
    np.testing.assert_allclose(y[0, 0, 0], want, atol=1e-5)


def test_random_init_runs(imported):
    model, _ = imported
    import jax

    params = model.init(jax.random.PRNGKey(0))
    out = model.encode_image(params, jnp.zeros((1, 32, 32, 3)))
    assert out.shape == (1, 32) and bool(jnp.isfinite(out).all())


# ------------------------------------------------------------------- tokenizer


@pytest.fixture(scope="module")
def tok():
    # Tiny merge table: "lo+w", "low+</w>", "e+r</w>"
    return SimpleTokenizer(merges=[("l", "o"), ("lo", "w"), ("lo", "w</w>"),
                                   ("e", "r</w>"), ("low", "er</w>")])


def test_tokenizer_bpe_merging(tok):
    # "low" -> fully merged single token "low</w>"
    ids = tok.encode("low")
    assert ids == [tok.encoder["low</w>"]]
    # "lower" -> "low" + "er</w>" merged across the table
    ids = tok.encode("lower")
    assert ids == [tok.encoder["lower</w>"]]
    # unknown word falls back to byte tokens with trailing </w>
    ids = tok.encode("xy")
    assert ids == [tok.encoder["x"], tok.encoder["y</w>"]]


def test_tokenizer_decode_roundtrip(tok):
    ids = tok.encode("low lower xy")
    assert tok.decode(ids).strip() == "low lower xy"


def test_tokenize_layout(tok):
    arr = tok.tokenize(["low", "lower xy"], context_length=8)
    assert arr.shape == (2, 8) and arr.dtype == np.int32
    assert arr[0, 0] == tok.sot and arr[0, 2] == tok.eot and arr[0, 3] == 0
    # EOT is the max id -> argmax finds it (encode_text contract)
    assert arr[1].argmax() == list(arr[1]).index(tok.eot)


def test_tokenize_truncation(tok):
    with pytest.raises(RuntimeError):
        tok.tokenize("low " * 10, context_length=4)
    arr = tok.tokenize("low " * 10, context_length=4, truncate=True)
    assert arr[0, -1] == tok.eot


def test_tokenizer_cleaning(tok):
    assert tok.encode("  LOW\t\nlow ") == tok.encode("low low")


# ------------------------------------------------------- loss / NADA plumbing


def test_clip_similarity_loss_shape(torch_clip, imported):
    model, params = imported
    img = jnp.zeros((2, 64, 64, 3))
    toks = jnp.asarray(np.array([[517, 9, 518] + [0] * 13]), jnp.int32)
    loss = clip_similarity_loss(model, params, img, toks)
    assert loss.shape == (2, 1) and bool(jnp.isfinite(loss).all())


def test_image_embedder_and_text_direction(imported, tok):
    model, params = imported
    embed = make_image_embedder(model, params)
    e = embed(jnp.zeros((1, 64, 64, 3)))
    assert e.shape == (1, TINY.embed_dim)
    # tiny tokenizer ids (max 518) fit TINY's 520-row embedding table
    d = text_direction(model, params, tok, "low", "lower")
    assert d.shape == (TINY.embed_dim,)
    np.testing.assert_allclose(float(jnp.linalg.norm(d)), 1.0, atol=1e-5)
