"""e4e / pSp first-stage GAN inversion encoders (inference path).

Re-implements the reference's vendored e4e encoder stack used to produce PTI
pivot latents:

- `GradualStyleEncoder` / `Encoder4Editing`:
  inversion/models/e4e/encoders/psp_encoders.py:58-123 / :126-202 — IR-SE50
  FPN backbone with per-style "GradualStyleBlock" heads (coarse from the 16^2
  c3 map, middle from the 32^2 FPN p2, fine from the 64^2 FPN p1).
- pSp pivot contract: inversion/models/e4e/psp.py:62-68 — codes = encoder(x)
  + latent_avg (broadcast over the style axis); the decoder pass is identity
  w.r.t. the returned latent when `input_is_latent=True`, so pivot extraction
  needs only the encoder (consumed at
  inversion/training/coaches/base_coach.py:181-199 and
  inversion/scripts/latent_creators/e4e_latent_creator.py:32-39).

Param-tree keys mirror the torch checkpoint's `encoder.*` state_dict names
(input_layer.{0,1,2}, body.N.{res_layer,shortcut_layer}, styles.N.convs.{2k},
styles.N.linear, latlayer1/2) for mechanical import via
io/torch_import.state_dict_to_tree. Layout: NHWC / HWIO (converted on import).

Input convention (e4e_latent_creator.py:14-17): 256^2 RGB in [-1, 1].
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .arcface import _blocks_50, _bn, _conv, _prelu
from .bisenet import _resize_bilinear_ac

# IR-SE50 body taps (psp_encoders GradualStyleEncoder.forward: i==6/20/23):
# end of stage2 (128ch, 64^2), stage3 (256ch, 32^2), stage4 (512ch, 16^2).
_TAPS = (6, 20, 23)


def _leaky(x):
    # torch nn.LeakyReLU() default negative_slope
    return jnp.where(x >= 0, x, 0.01 * x)


def _equal_linear(x, p):
    # EqualLinear lr_mul=1 (stylegan2/model.py:129-158): runtime weight scale
    # 1/sqrt(in_dim). Weight stored [in, out] (import-converted).
    w = p["weight"]
    return x @ (w * (1.0 / np.sqrt(w.shape[0]))) + p["bias"]


def _style_block(x, p, num_pools: int):
    """GradualStyleBlock (psp_encoders.py:34-55): num_pools stride-2 convs with
    LeakyReLU, ending at 1x1, then EqualLinear -> [B, 512]."""
    for k in range(num_pools):
        cp = p["convs"][str(2 * k)]
        x = _leaky(_conv(x, cp["weight"], stride=2) + cp["bias"])
    return _equal_linear(x[:, 0, 0, :], p["linear"])


def _backbone(params, x):
    """input_layer + IR-SE50 body with FPN taps -> (c1, c2, c3)."""
    x = _conv(x, params["input_layer"]["0"]["weight"])
    x = _prelu(_bn(x, params["input_layer"]["1"]), params["input_layer"]["2"])
    taps = {}
    for i, (ci, depth, stride) in enumerate(_blocks_50()):
        bp = params["body"][str(i)]
        if "shortcut_layer" in bp:
            sc = _bn(_conv(x, bp["shortcut_layer"]["0"]["weight"], stride),
                     bp["shortcut_layer"]["1"])
        elif stride == 1:
            sc = x
        else:
            sc = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, 1, 1), (1, stride, stride, 1), "VALID")
        r = bp["res_layer"]
        y = _bn(x, r["0"])
        y = _prelu(_conv(y, r["1"]["weight"]), r["2"])
        y = _bn(_conv(y, r["3"]["weight"], stride), r["4"])
        s = jnp.mean(y, axis=(1, 2), keepdims=True)
        s = jax.nn.relu(_conv(s, r["5"]["fc1"]["weight"]))
        s = jax.nn.sigmoid(_conv(s, r["5"]["fc2"]["weight"]))
        x = y * s + sc
        if i in _TAPS:
            taps[i] = x
    return taps[6], taps[20], taps[23]


def _lat(x, p):
    # 1x1 lateral conv WITH bias (nn.Conv2d default)
    return _conv(x, p["weight"]) + p["bias"]


@dataclasses.dataclass(frozen=True)
class E4eEncoder:
    """GradualStyleEncoder ('gradual') or Encoder4Editing ('e4e'), IR-SE50.

    style_count = 2*log2(stylegan_size) - 2 (psp_encoders.py:84-85); both
    variants return [B, style_count, 512] at inference.
    """

    stylegan_size: int = 1024
    variant: str = "e4e"  # 'e4e' | 'gradual'
    coarse_ind: int = 3
    middle_ind: int = 7

    @property
    def style_count(self) -> int:
        return 2 * int(np.log2(self.stylegan_size)) - 2

    def _head_spatial(self, i: int) -> int:
        return 16 if i < self.coarse_ind else (32 if i < self.middle_ind else 64)

    def init(self, key=None) -> dict:
        rs = np.random.RandomState(0)

        def conv(ci, co, k, bias=False):
            d = {"weight": jnp.asarray(rs.randn(k, k, ci, co).astype(np.float32) * 0.05)}
            if bias:
                d["bias"] = jnp.zeros((co,), jnp.float32)
            return d

        def bn(c):
            return {"weight": jnp.ones((c,), jnp.float32),
                    "bias": jnp.zeros((c,), jnp.float32),
                    "running_mean": jnp.zeros((c,), jnp.float32),
                    "running_var": jnp.ones((c,), jnp.float32)}

        p = {
            "input_layer": {"0": conv(3, 64, 3), "1": bn(64),
                            "2": {"weight": jnp.full((64,), 0.25, jnp.float32)}},
            "body": {},
            "latlayer1": conv(256, 512, 1, bias=True),
            "latlayer2": conv(128, 512, 1, bias=True),
            "styles": {},
        }
        for i, (ci, depth, stride) in enumerate(_blocks_50()):
            blk = {"res_layer": {
                "0": bn(ci), "1": conv(ci, depth, 3),
                "2": {"weight": jnp.full((depth,), 0.25, jnp.float32)},
                "3": conv(depth, depth, 3), "4": bn(depth),
                "5": {"fc1": conv(depth, depth // 16, 1),
                      "fc2": conv(depth // 16, depth, 1)},
            }}
            # in_channel == depth -> MaxPool2d(1, stride) shortcut, no params
            # (helpers.py:101; body.0 is 64->64 stride 2)
            if ci != depth:
                blk["shortcut_layer"] = {"0": conv(ci, depth, 1), "1": bn(depth)}
            p["body"][str(i)] = blk
        for i in range(self.style_count):
            num_pools = int(np.log2(self._head_spatial(i)))
            head = {"convs": {}, "linear": {
                "weight": jnp.asarray(rs.randn(512, 512).astype(np.float32)),
                "bias": jnp.zeros((512,), jnp.float32)}}
            cin = 512
            for k in range(num_pools):
                head["convs"][str(2 * k)] = conv(cin, 512, 3, bias=True)
                cin = 512
            p["styles"][str(i)] = head
        return p

    def __call__(self, params: dict, x: jax.Array) -> jax.Array:
        """x [B, 256, 256, 3] in [-1, 1] -> style codes [B, style_count, 512]."""
        c1, c2, c3 = _backbone(params, x)
        heads = params["styles"]

        def head(i, feat):
            return _style_block(feat, heads[str(i)], int(np.log2(self._head_spatial(i))))

        if self.variant == "gradual":
            latents = [head(j, c3) for j in range(self.coarse_ind)]
            p2 = _resize_bilinear_ac(c3, c2.shape[1:3]) + _lat(c2, params["latlayer1"])
            latents += [head(j, p2) for j in range(self.coarse_ind, self.middle_ind)]
            p1 = _resize_bilinear_ac(p2, c1.shape[1:3]) + _lat(c1, params["latlayer2"])
            latents += [head(j, p1) for j in range(self.middle_ind, self.style_count)]
            return jnp.stack(latents, axis=1)

        # Encoder4Editing at Inference stage: w0 broadcast + per-row deltas
        # (psp_encoders.py:177-202).
        w0 = head(0, c3)
        rows = [w0]
        p2 = p1 = None
        feat = c3
        for i in range(1, self.style_count):
            if i == self.coarse_ind:
                p2 = _resize_bilinear_ac(c3, c2.shape[1:3]) + _lat(c2, params["latlayer1"])
                feat = p2
            elif i == self.middle_ind:
                p1 = _resize_bilinear_ac(p2, c1.shape[1:3]) + _lat(c1, params["latlayer2"])
                feat = p1
            rows.append(w0 + head(i, feat))
        return jnp.stack(rows, axis=1)


# ------------------------------------------------------------------- import

@dataclasses.dataclass
class E4eImportReport:
    variant: str
    stylegan_size: int
    style_count: int
    has_latent_avg: bool
    num_params: int


def import_e4e(sd: Dict[str, np.ndarray], variant: str = "e4e") -> Tuple["E4eEncoder", dict, Optional[jnp.ndarray], E4eImportReport]:
    """Import a pSp/e4e checkpoint state_dict (already flattened, torch layout).

    Accepts the full pSp checkpoint namespace ('encoder.*' + 'latent_avg', as in
    psp.py:10-14 get_keys) or a bare encoder state_dict. Infers stylegan_size
    from the number of style heads. The variant CANNOT be inferred from shapes
    (GradualStyleEncoder and Encoder4Editing are weight-isomorphic) — pass it
    explicitly ('e4e' | 'gradual'); load_e4e can read it from the checkpoint's
    'opts' payload.
    """
    from ..io.torch_import import state_dict_to_tree

    latent_avg = None
    if "latent_avg" in sd:
        latent_avg = jnp.asarray(np.asarray(sd["latent_avg"], np.float32))
    enc = {k[len("encoder."):]: v for k, v in sd.items() if k.startswith("encoder.")}
    if not enc:  # bare encoder state_dict
        enc = {k: v for k, v in sd.items() if k.split(".")[0] in
               ("input_layer", "body", "styles", "latlayer1", "latlayer2")}
    if variant not in ("e4e", "gradual"):
        raise ValueError(f"unknown e4e variant {variant!r} (want 'e4e'|'gradual')")
    n_styles = 1 + max(int(k.split(".")[1]) for k in enc if k.startswith("styles."))
    size = int(2 ** ((n_styles + 2) / 2))
    model = E4eEncoder(stylegan_size=size, variant=variant)
    params = state_dict_to_tree(enc)
    n = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params))
    report = E4eImportReport(variant, size, n_styles, latent_avg is not None, n)
    return model, params, latent_avg, report


# encoder_type strings used by the pSp/e4e training 'opts' payload
# (pSp: encoders/psp_encoders.py GradualStyleEncoder; e4e: Encoder4Editing)
_ENCODER_TYPE_TO_VARIANT = {
    "Encoder4Editing": "e4e",
    "GradualStyleEncoder": "gradual",
}


def load_e4e(path: str, variant: str = "auto"):
    """Load an e4e .pt checkpoint file -> (model, params, latent_avg, report).

    The e4e checkpoint keeps 'latent_avg' at TOP level beside 'state_dict'
    (psp.py __load_latent_avg reads ckpt['latent_avg']), so unwrap manually
    instead of via load_torch_state_dict (which drops siblings).

    variant='auto' reads the checkpoint's 'opts' payload (both repos persist
    the training argparse namespace with an 'encoder_type' field); if absent
    it WARNS and assumes 'e4e' — the two encoders are weight-isomorphic, so a
    wrong guess silently produces wrong pivots. Pass 'e4e'/'gradual' to force."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    flat = {}
    if isinstance(obj, dict) and "latent_avg" in obj:
        flat["latent_avg"] = obj["latent_avg"].detach().cpu().numpy()
    inner = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    for k, v in inner.items():
        if hasattr(v, "detach"):
            flat[k] = v.detach().cpu().numpy()
    if variant == "auto":
        opts = obj.get("opts") if isinstance(obj, dict) else None
        if not isinstance(opts, dict):
            opts = vars(opts) if hasattr(opts, "__dict__") else {}
        enc_type = str(opts.get("encoder_type", ""))
        variant = _ENCODER_TYPE_TO_VARIANT.get(enc_type, "")
        if not variant:
            import warnings
            warnings.warn(
                f"{path}: checkpoint carries no recognizable opts.encoder_type "
                "(pSp GradualStyleEncoder and Encoder4Editing are weight-"
                "isomorphic) — assuming variant='e4e'. Pass variant= to force.")
            variant = "e4e"
    return import_e4e(flat, variant=variant)


def pivot_from_image(model: E4eEncoder, params: dict, latent_avg: Optional[jax.Array],
                     image: jax.Array) -> jax.Array:
    """The pSp pivot contract (psp.py:62-68 with start_from_latent_avg):
    encoder(x) + latent_avg broadcast over rows. image [B,256,256,3] in [-1,1];
    returns w+ [B, style_count, 512]."""
    codes = model(params, image)
    if latent_avg is not None:
        avg = latent_avg
        if avg.ndim == 1:
            avg = avg[None, None, :]
        elif avg.ndim == 2:
            avg = avg[None, :, :]
        codes = codes + avg
    return codes
