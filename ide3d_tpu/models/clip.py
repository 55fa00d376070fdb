"""CLIP ViT-B/32 (image + text towers) — the embedder behind StyleCLIP and NADA.

The reference consumes OpenAI CLIP through the `clip` package:
  * `inversion/networks.py:1800-1819` (CLIPEncoder: ViT-B/32 visual tower over a
    bicubic-resized, CLIP-normalized tensor),
  * `inversion/models/StyleCLIP/criteria/clip_loss.py:1-17` (CLIPLoss:
    upsample x7 + avgpool to 224, similarity = 1 - logits_per_image / 100),
  * `inversion/models/StyleCLIP/mapper/training/coach.py:54` (`clip.tokenize`),
  * the empty `ide3d-nada` submodule's described usage (README.md:157-165).

This module is a from-scratch JAX implementation of that contract: the
transformer towers, the byte-level BPE tokenizer, and both preprocessing
variants. Weights import from the OpenAI checkpoint's state_dict via the
generic `io.torch_import.state_dict_to_tree` — the param tree mirrors the
torch state_dict names 1:1 (same convention as models/bisenet.py), so no
name mapping is needed. Zero-egress environments gate the actual weight file
and the BPE vocab file; tests exercise forward parity against in-test torch
fixtures and a synthetic merges table.

TPU notes: attention/MLP are plain einsum/matmul chains (MXU-friendly at
width 512/768); everything static-shape; compute dtype configurable.
"""

from __future__ import annotations

import dataclasses
import functools
import gzip
import html
import math
import re
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# CLIP image normalization constants (inversion/networks.py:1816).
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class ClipConfig:
    """ViT-B/32 defaults (the only variant the reference loads)."""

    embed_dim: int = 512
    image_resolution: int = 224
    vision_layers: int = 12
    vision_width: int = 768
    vision_patch_size: int = 32
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_layers: int = 12
    head_dim: int = 64

    @property
    def vision_heads(self) -> int:
        return self.vision_width // self.head_dim

    @property
    def transformer_heads(self) -> int:
        return self.transformer_width // self.head_dim

    @property
    def grid_size(self) -> int:
        return self.image_resolution // self.vision_patch_size


# ------------------------------------------------------------------ primitives


def _layer_norm(p: dict, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["weight"] + p["bias"]


def _quick_gelu(x: jax.Array) -> jax.Array:
    # OpenAI CLIP uses QuickGELU (x * sigmoid(1.702 x)), not exact GELU.
    return x * jax.nn.sigmoid(1.702 * x)


def _attention(p: dict, x: jax.Array, n_heads: int, mask: Optional[jax.Array]) -> jax.Array:
    """torch nn.MultiheadAttention semantics (self-attention, batch second is
    irrelevant here — we keep [B, L, D] throughout)."""
    B, L, D = x.shape
    # in_proj_weight arrives transposed to [D, 3D] by the generic converter.
    qkv = x @ p["in_proj_weight"] + p["in_proj_bias"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    dh = D // n_heads

    def heads(t):
        return t.reshape(B, L, n_heads, dh).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (1.0 / math.sqrt(dh))
    if mask is not None:
        attn = attn + mask
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(B, L, D)
    return out @ p["out_proj"]["weight"] + p["out_proj"]["bias"]


def _resblock(p: dict, x: jax.Array, n_heads: int, mask: Optional[jax.Array]) -> jax.Array:
    x = x + _attention(p["attn"], _layer_norm(p["ln_1"], x), n_heads, mask)
    h = _layer_norm(p["ln_2"], x)
    h = _quick_gelu(h @ p["mlp"]["c_fc"]["weight"] + p["mlp"]["c_fc"]["bias"])
    h = h @ p["mlp"]["c_proj"]["weight"] + p["mlp"]["c_proj"]["bias"]
    return x + h


def _transformer(p: dict, x: jax.Array, n_layers: int, n_heads: int,
                 mask: Optional[jax.Array]) -> jax.Array:
    for i in range(n_layers):
        x = _resblock(p["resblocks"][str(i)], x, n_heads, mask)
    return x


# ----------------------------------------------------------------------- model


@dataclasses.dataclass(frozen=True)
class CLIP:
    """Functional CLIP. Param tree mirrors the OpenAI state_dict names
    (after `io.torch_import.state_dict_to_tree` layout conversion):

        visual.conv1.weight (HWIO), visual.class_embedding,
        visual.positional_embedding, visual.ln_pre/ln_post.{weight,bias},
        visual.transformer.resblocks.{i}.{ln_1,attn,ln_2,mlp}..., visual.proj,
        transformer.resblocks.{i}..., token_embedding.weight,
        positional_embedding, ln_final.{weight,bias}, text_projection,
        logit_scale.
    """

    cfg: ClipConfig = ClipConfig()
    dtype: str = "float32"

    # ------------------------------------------------------------------- init

    def init(self, key: jax.Array) -> dict:
        """Random init with the OpenAI scale scheme — for tests and
        from-scratch finetuning; real use imports the checkpoint."""
        cfg = self.cfg
        ks = iter(jax.random.split(key, 16 + 8 * (cfg.vision_layers + cfg.transformer_layers)))

        def ln(d):
            return {"weight": jnp.ones((d,)), "bias": jnp.zeros((d,))}

        def block(d):
            return {
                "ln_1": ln(d),
                "attn": {
                    "in_proj_weight": jax.random.normal(next(ks), (d, 3 * d)) * d ** -0.5,
                    "in_proj_bias": jnp.zeros((3 * d,)),
                    "out_proj": {
                        "weight": jax.random.normal(next(ks), (d, d)) * d ** -0.5,
                        "bias": jnp.zeros((d,)),
                    },
                },
                "ln_2": ln(d),
                "mlp": {
                    "c_fc": {"weight": jax.random.normal(next(ks), (d, 4 * d)) * (2 * d) ** -0.5,
                             "bias": jnp.zeros((4 * d,))},
                    "c_proj": {"weight": jax.random.normal(next(ks), (4 * d, d)) * d ** -0.5,
                               "bias": jnp.zeros((d,))},
                },
            }

        vw, tw = cfg.vision_width, cfg.transformer_width
        visual = {
            "conv1": {"weight": jax.random.normal(
                next(ks), (cfg.vision_patch_size, cfg.vision_patch_size, 3, vw)) * vw ** -0.5},
            "class_embedding": jax.random.normal(next(ks), (vw,)) * vw ** -0.5,
            "positional_embedding": jax.random.normal(
                next(ks), (cfg.grid_size ** 2 + 1, vw)) * vw ** -0.5,
            "ln_pre": ln(vw),
            "transformer": {"resblocks": {str(i): block(vw) for i in range(cfg.vision_layers)}},
            "ln_post": ln(vw),
            "proj": jax.random.normal(next(ks), (vw, cfg.embed_dim)) * vw ** -0.5,
        }
        params = {
            "visual": visual,
            "transformer": {"resblocks": {str(i): block(tw) for i in range(cfg.transformer_layers)}},
            "token_embedding": {"weight": jax.random.normal(next(ks), (cfg.vocab_size, tw)) * 0.02},
            "positional_embedding": jax.random.normal(next(ks), (cfg.context_length, tw)) * 0.01,
            "ln_final": ln(tw),
            "text_projection": jax.random.normal(next(ks), (tw, cfg.embed_dim)) * tw ** -0.5,
            "logit_scale": jnp.asarray(math.log(1.0 / 0.07)),
        }
        return jax.tree_util.tree_map(lambda a: a.astype(self.dtype), params)

    # --------------------------------------------------------------- encoders

    def encode_image(self, params: dict, x: jax.Array) -> jax.Array:
        """x: [B, R, R, 3] NHWC, ALREADY preprocessed (see `preprocess`).
        Returns [B, embed_dim] (unnormalized, matching torch `encode_image`)."""
        cfg, p = self.cfg, params["visual"]
        x = x.astype(self.dtype)
        x = jax.lax.conv_general_dilated(
            x, p["conv1"]["weight"].astype(self.dtype),
            window_strides=(cfg.vision_patch_size,) * 2, padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        B = x.shape[0]
        x = x.reshape(B, -1, cfg.vision_width)
        cls = jnp.broadcast_to(p["class_embedding"].astype(self.dtype),
                               (B, 1, cfg.vision_width))
        x = jnp.concatenate([cls, x], axis=1) + p["positional_embedding"].astype(self.dtype)
        x = _layer_norm(p["ln_pre"], x)
        x = _transformer(p["transformer"], x, cfg.vision_layers, cfg.vision_heads, mask=None)
        x = _layer_norm(p["ln_post"], x[:, 0])
        return x @ p["proj"].astype(self.dtype)

    def encode_text(self, params: dict, tokens: jax.Array) -> jax.Array:
        """tokens: [B, context_length] int32. Returns [B, embed_dim]."""
        cfg = self.cfg
        x = params["token_embedding"]["weight"].astype(self.dtype)[tokens]
        x = x + params["positional_embedding"].astype(self.dtype)
        L = cfg.context_length
        mask = jnp.triu(jnp.full((L, L), -jnp.inf, dtype=self.dtype), k=1)
        x = _transformer(params["transformer"], x, cfg.transformer_layers,
                         cfg.transformer_heads, mask=mask)
        x = _layer_norm(params["ln_final"], x)
        # Features at the EOT token (highest id in each row).
        eot = jnp.argmax(tokens, axis=-1)
        x = x[jnp.arange(x.shape[0]), eot]
        return x @ params["text_projection"].astype(self.dtype)

    def __call__(self, params: dict, image: jax.Array, tokens: jax.Array
                 ) -> Tuple[jax.Array, jax.Array]:
        """Returns (logits_per_image, logits_per_text) like the torch model."""
        ei = self.encode_image(params, image)
        et = self.encode_text(params, tokens)
        ei = ei / jnp.linalg.norm(ei, axis=-1, keepdims=True)
        et = et / jnp.linalg.norm(et, axis=-1, keepdims=True)
        scale = jnp.exp(params["logit_scale"]).astype(ei.dtype)
        logits = scale * ei @ et.T
        return logits, logits.T

    # ---------------------------------------------------------- preprocessing

    def preprocess(self, x: jax.Array) -> jax.Array:
        """CLIPEncoder.preprocess_tensor (inversion/networks.py:1811-1817):
        x in [-1, 1] NHWC -> [0,1] -> bicubic resize to R×R -> normalize."""
        R = self.cfg.image_resolution
        x = x * 0.5 + 0.5
        if x.shape[1] != R or x.shape[2] != R:
            x = jax.image.resize(x, (x.shape[0], R, R, x.shape[3]), method="cubic")
        mean = jnp.asarray(CLIP_MEAN, x.dtype)
        std = jnp.asarray(CLIP_STD, x.dtype)
        return (x - mean) / std

    def preprocess_pool(self, x: jax.Array) -> jax.Array:
        """CLIPLoss's resize (clip_loss.py:10-15): nearest-upsample ×7 then
        average-pool k = S/32 — for S divisible by 32 this equals a block
        average of 7× nearest-replicated pixels. Normalization is NOT applied
        (the reference feeds the raw pooled tensor to the CLIP visual tower)."""
        B, S, _, C = x.shape
        R = self.cfg.image_resolution
        up = S * 7
        k = up // R
        x = jnp.repeat(jnp.repeat(x, 7, axis=1), 7, axis=2)
        x = x.reshape(B, R, k, R, k, C).mean(axis=(2, 4))
        return x


# --------------------------------------------------------------------- import


def config_from_state_dict(sd: Dict[str, np.ndarray], head_dim: int = 64) -> ClipConfig:
    """Infer the architecture from a (ViT) CLIP state_dict, the way the
    OpenAI loader's build_model does — from shapes, not metadata. The head
    count is NOT shape-recoverable; OpenAI assumes 64-dim heads (the default)."""
    vision_width = sd["visual.conv1.weight"].shape[0]
    vision_patch = sd["visual.conv1.weight"].shape[-1]
    vision_layers = 1 + max(int(k.split(".")[3]) for k in sd
                            if k.startswith("visual.transformer.resblocks."))
    grid = int(round(math.sqrt(sd["visual.positional_embedding"].shape[0] - 1)))
    text_layers = 1 + max(int(k.split(".")[2]) for k in sd
                          if k.startswith("transformer.resblocks."))
    width = sd["ln_final.weight"].shape[0]
    if width % head_dim or sd["visual.conv1.weight"].shape[0] % head_dim:
        raise ValueError(f"head_dim {head_dim} does not divide tower widths")
    return ClipConfig(
        embed_dim=sd["text_projection"].shape[1],
        image_resolution=grid * vision_patch,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=vision_patch,
        context_length=sd["positional_embedding"].shape[0],
        vocab_size=sd["token_embedding.weight"].shape[0],
        transformer_width=width,
        transformer_layers=text_layers,
        head_dim=head_dim,
    )


def import_clip(sd: Dict[str, np.ndarray], dtype: str = "float32",
                head_dim: int = 64) -> Tuple["CLIP", dict]:
    """OpenAI CLIP state_dict -> (CLIP model, params). Only ViT visual towers
    are supported (the reference only ever loads ViT-B/32)."""
    from ..io.torch_import import state_dict_to_tree

    if "visual.conv1.weight" not in sd:
        raise ValueError("only ViT CLIP checkpoints are supported (no visual.conv1)")
    cfg = config_from_state_dict(sd, head_dim=head_dim)
    # The generic converter transposes 2-D '*.weight' leaves to [in, out] and
    # conv weights to HWIO; projection matrices (visual.proj, text_projection)
    # and embeddings are not named 'weight' and pass through unchanged, which
    # matches their torch usage (x @ proj).
    tree = state_dict_to_tree({k: v for k, v in sd.items()
                               if not k.startswith("input_resolution")
                               and not k.startswith("context_length")
                               and not k.startswith("vocab_size")})
    # token_embedding is an index table, not a matmul weight — undo the
    # generic [out,in]->[in,out] linear transpose so rows stay per-token.
    tree["token_embedding"]["weight"] = np.ascontiguousarray(
        tree["token_embedding"]["weight"].T)

    # attn.in_proj_weight is a [3D, D] matmul weight, but its key does not end
    # in '.weight' so the generic converter leaves it untouched — transpose here.
    def _fix_attn(node):
        for k, v in node.items():
            if k == "attn":
                v["in_proj_weight"] = np.ascontiguousarray(v["in_proj_weight"].T)
            elif isinstance(v, dict):
                _fix_attn(v)

    _fix_attn(tree)
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype), tree)
    return CLIP(cfg=cfg, dtype=dtype), params


def load_clip(path: str, dtype: str = "float32") -> Tuple["CLIP", dict]:
    """Load from a torch-saved checkpoint (`clip.load`'s .pt is a TorchScript
    archive; `torch.load` of its extracted state_dict or any plain
    torch.save(model.state_dict()) works)."""
    from ..io.torch_import import load_torch_state_dict

    return import_clip(load_torch_state_dict(path), dtype=dtype)


# ------------------------------------------------------------------ tokenizer


@functools.lru_cache()
def _bytes_to_unicode() -> Dict[int, str]:
    """GPT-2/CLIP byte->printable-unicode table (the published BPE convention):
    printable ASCII/latin bytes map to themselves, the rest to 256+i."""
    bs = (list(range(ord("!"), ord("~") + 1)) + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _word_pairs(word: Tuple[str, ...]) -> set:
    return {(a, b) for a, b in zip(word[:-1], word[1:])}


_TOKEN_PATTERN = re.compile(
    r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[^\W\d_]+|\d|[^\s\w]+",
    re.IGNORECASE | re.UNICODE,
)


class SimpleTokenizer:
    """Byte-level BPE tokenizer with CLIP's vocab layout:
    256 byte tokens + 256 byte+'</w>' tokens + merge tokens + 2 specials.

    `bpe_path` points at the standard `bpe_simple_vocab_16e6.txt.gz` (gated in
    zero-egress environments); `merges` supplies the pair list directly (tests).
    The token regex approximates the reference's \\p{L}/\\p{N} classes with
    re's unicode word classes — identical on ASCII prompts, which is all the
    reference's 14 named edits and NADA prompts use.
    """

    def __init__(self, bpe_path: Optional[str] = None,
                 merges: Optional[Sequence[Tuple[str, str]]] = None):
        if merges is None:
            if bpe_path is None:
                raise ValueError("need bpe_path or merges")
            with gzip.open(bpe_path, "rt", encoding="utf-8") as f:
                lines = f.read().split("\n")
            # CLIP uses merge lines 1 .. 49152-256-2 inclusive.
            merges = [tuple(line.split()) for line in lines[1: 49152 - 256 - 2 + 1]]
        self.byte_encoder = _bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        vocab = list(self.byte_encoder.values())
        vocab += [v + "</w>" for v in vocab]
        vocab += ["".join(m) for m in merges]
        vocab += ["<|startoftext|>", "<|endoftext|>"]
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.sot = self.encoder["<|startoftext|>"]
        self.eot = self.encoder["<|endoftext|>"]
        self._cache = {"<|startoftext|>": "<|startoftext|>",
                       "<|endoftext|>": "<|endoftext|>"}

    def _bpe(self, token: str) -> str:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _word_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            pair = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if pair not in self.bpe_ranks:
                break
            a, b = pair
            new_word: List[str] = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    new_word.append(a + b)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _word_pairs(word)
        out = " ".join(word)
        self._cache[token] = out
        return out

    @staticmethod
    def _clean(text: str) -> str:
        try:  # ftfy mojibake fixing, if present (optional in the reference too)
            import ftfy

            text = ftfy.fix_text(text)
        except ImportError:
            pass
        text = html.unescape(html.unescape(text))
        return re.sub(r"\s+", " ", text.strip()).lower()

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for tok in _TOKEN_PATTERN.findall(self._clean(text)):
            tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(tok).split(" "))
        return ids

    def decode(self, ids: Sequence[int]) -> str:
        text = "".join(self.decoder[i] for i in ids)
        data = bytearray(self.byte_decoder[c] for c in text
                         if c in self.byte_decoder)
        return data.decode("utf-8", errors="replace").replace("</w>", " ")

    def tokenize(self, texts, context_length: int = 77, truncate: bool = False) -> np.ndarray:
        """`clip.tokenize` contract: [N, context_length] int32 with SOT/EOT."""
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), context_length), np.int32)
        for i, text in enumerate(texts):
            ids = [self.sot] + self.encode(text) + [self.eot]
            if len(ids) > context_length:
                if not truncate:
                    raise RuntimeError(f"input too long for context {context_length}: {text!r}")
                ids = ids[:context_length]
                ids[-1] = self.eot
            out[i, : len(ids)] = ids
        return out


# ---------------------------------------------------------------- loss helper


def clip_similarity_loss(model: CLIP, params: dict, image: jax.Array,
                         tokens: jax.Array) -> jax.Array:
    """CLIPLoss.forward (clip_loss.py:13-16): pooled-resize the [-1,1] image,
    1 - logits_per_image / 100. Returns [B, N_text]."""
    x = model.preprocess_pool(image)
    logits, _ = model(params, x, tokens)
    return 1.0 - logits / 100.0


def make_image_embedder(model: CLIP, params: dict):
    """NADA/global-direction embedder: [-1,1] NHWC image -> [B, D] embedding
    (bicubic preprocessing, the CLIPEncoder pathway)."""

    def embed(img: jax.Array) -> jax.Array:
        return model.encode_image(params, model.preprocess(img))

    return embed


def text_direction(model: CLIP, params: dict, tokenizer: SimpleTokenizer,
                   source: str, target: str) -> jax.Array:
    """Normalized E_txt(target) - E_txt(source) for NADA (train/nada.py)."""
    toks = jnp.asarray(tokenizer.tokenize(
        [source, target], context_length=model.cfg.context_length, truncate=True))
    emb = model.encode_text(params, toks)
    emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    d = emb[1] - emb[0]
    return d / (jnp.linalg.norm(d) + 1e-8)
