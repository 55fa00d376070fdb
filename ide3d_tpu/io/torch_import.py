"""Torch checkpoint import: reference .pth/.pt/.pkl weights -> ide3d_tpu pytrees.

The reference ships four torch CNNs the rebuild depends on (BiSeNet face parser,
VGG16/VGG19 perceptual nets, ArcFace ID net, InceptionV3 metrics net) plus the
pickled generator/discriminator/encoder checkpoints (legacy.py:22-96). This module
provides:

  * `load_torch_state_dict(path)` — torch.load on CPU, returning {name: np.ndarray},
  * `state_dict_to_tree(sd)` — dotted names -> nested dicts with layout conversion
    (conv OIHW -> HWIO, linear [out,in] -> [in,out], everything else verbatim),
  * `import_bisenet(path)` — ready-to-use params for models/bisenet.py (whose tree
    keys mirror the torch state_dict 1:1 by construction).

Reference checkpoint import (the round-2 parity gate, SURVEY.md build stage 4/5):

  * `pickle_payload_to_state_dicts(obj)` — walk a stub-unpickled reference .pkl
    object graph (torch nn.Module internals: _parameters/_buffers/_modules) into
    flat `{dotted_name: np.ndarray}` state dicts per top-level entry (G/D/G_ema/E),
    reproducing `misc.named_params_and_buffers` naming (torch_utils/misc.py:151),
  * `import_generator(sd)` — name-mapped import of a reference generator state
    dict into (GeneratorConfig(vb_ref_compat=True), params pytree). Architecture
    (resolutions, channels, latent counts) is INFERRED from the state dict itself,
    so any channel schedule is hosted. Returns an ImportReport listing leaves that
    could not be mapped (e.g. the pickled renderer's decoder, whose naming is not
    recoverable from the reference tree).
  * `import_discriminator(sd)`, `import_encoder(sd)` — same for D
    (inversion/networks.py:1446-1502 naming) and Encoder/HybridEncoder
    (:1560-1665, whose interiors are repo-visible and hosted 1:1).

Generator .pkl note: reference G checkpoints are source-embedding pickles
(torch_utils/persistence.py:35-132) whose classes exist only inside the pickle; a
faithful re-EXECUTION would require running embedded code, which this framework
intentionally does not do. Instead `load_pickle_tensors` stubs unknown classes
(tensor payloads still deserialize through torch's public reducers) and the
walker above recovers the named tensors for the importer.
"""

from __future__ import annotations

import dataclasses
import io as _io
import pickle
import re
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if isinstance(obj, dict) and "state_dict" in obj and isinstance(obj["state_dict"], dict):
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
    return out


def _convert_leaf(name: str, arr: np.ndarray) -> np.ndarray:
    last = name.rsplit(".", 1)[-1]
    if last == "weight" and arr.ndim == 4:
        # conv OIHW -> HWIO
        return np.ascontiguousarray(np.transpose(arr, (2, 3, 1, 0)))
    if last == "weight" and arr.ndim == 2:
        # linear [out, in] -> [in, out]
        return np.ascontiguousarray(arr.T)
    if last == "weight" and arr.ndim == 5:
        # conv3d OIDHW -> DHWIO
        return np.ascontiguousarray(np.transpose(arr, (2, 3, 4, 1, 0)))
    return arr


def state_dict_to_tree(sd: Dict[str, np.ndarray], convert: bool = True) -> dict:
    tree: dict = {}
    for name, arr in sd.items():
        if name.endswith("num_batches_tracked"):
            continue
        leaf = _convert_leaf(name, arr) if convert else arr
        parts = name.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf
    return tree


def import_bisenet(path: str) -> dict:
    """segNet-20Class.pth -> params for models/bisenet.BiSeNet (keys match 1:1)."""
    return state_dict_to_tree(load_torch_state_dict(path))


# ------------------------------------------------------------------ pkl inspection


class _TensorStubUnpickler(pickle.Unpickler):
    """Unpickler that stubs every unknown class so the tensor payload of a
    source-embedding reference .pkl (legacy.py:101) can be walked without executing
    embedded code."""

    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except Exception:
            class _Stub(dict):
                _module, _name = module, name

                def __setstate__(self, state):
                    if isinstance(state, dict):
                        self.update(state)

            _Stub.__name__ = name
            return _Stub

    def persistent_load(self, pid):
        return pid


def load_pickle_tensors(path: str) -> dict:
    """Best-effort raw object graph of a reference .pkl (for name-mapping work)."""
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=False)
    except Exception:
        with open(path, "rb") as f:
            return _TensorStubUnpickler(f).load()


def _module_named_tensors(obj, prefix: str, out: Dict[str, np.ndarray]) -> None:
    """Recurse a (possibly stubbed) torch nn.Module object graph, collecting
    parameters and buffers with `misc.named_params_and_buffers` dotted naming
    (reference torch_utils/misc.py:151). Works on live Modules and on
    _TensorStubUnpickler stubs (whose __dict__/dict payload preserves the
    _parameters/_buffers/_modules internals)."""

    def _state(o):
        if isinstance(o, dict):
            return o
        return getattr(o, "__dict__", None) or {}

    st = _state(obj)
    for bucket in ("_parameters", "_buffers"):
        d = st.get(bucket) or {}
        for name, t in d.items():
            if t is None:
                continue
            arr = t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)
            out[prefix + name] = arr
    for name, child in (st.get("_modules") or {}).items():
        if child is not None:
            _module_named_tensors(child, f"{prefix}{name}.", out)


def pickle_payload_to_state_dicts(obj) -> Dict[str, Dict[str, np.ndarray]]:
    """Reference checkpoint object graph -> {entry: state_dict}.

    `obj` is the dict a reference .pkl deserializes to (legacy.py:22-63:
    keys 'G', 'D', 'G_ema', optionally 'E', 'augment_pipe', ...)."""
    out = {}
    if not isinstance(obj, dict):
        obj = {"G": obj}
    for key, val in obj.items():
        if val is None or isinstance(val, (int, float, str, bool)):
            continue
        sd: Dict[str, np.ndarray] = {}
        _module_named_tensors(val, "", sd)
        if sd:
            out[key] = sd
    return out


# --------------------------------------------------------------- name-mapped import


_SKIP_SUFFIXES = ("resample_filter", "num_batches_tracked")


@dataclasses.dataclass
class ImportReport:
    imported: int = 0
    skipped_source: tuple = ()   # state-dict names with no destination
    missing_dest: tuple = ()     # framework leaves left at their init values
    auto_mapped: tuple = ()      # "src -> dest [xS]" shape-signature matches

    def __str__(self):
        return (
            f"imported {self.imported} tensors; "
            f"{len(self.skipped_source)} source tensors unmapped; "
            f"{len(self.auto_mapped)} shape-auto-mapped; "
            f"{len(self.missing_dest)} destination leaves left initialized"
        )


def _strip_prefix(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Drop a uniform leading module prefix (e.g. 'module.' from DDP wrapping)."""
    if sd and all(k.startswith("module.") for k in sd):
        return {k[len("module."):]: v for k, v in sd.items()}
    return sd


def _res_of(sd: Dict[str, np.ndarray], pattern: str) -> list:
    found = set()
    for k in sd:
        m = re.match(pattern, k)
        if m:
            found.add(int(m.group(1)))
    return sorted(found)


def _set_leaf(tree: dict, path: tuple, val: np.ndarray, strict_shape: bool = True):
    node = tree
    for p in path[:-1]:
        if p not in node:
            raise KeyError(f"no destination node {'.'.join(path)}")
        node = node[p]
    leaf = path[-1]
    if leaf not in node:
        raise KeyError(f"no destination leaf {'.'.join(path)}")
    dst = node[leaf]
    if strict_shape and tuple(dst.shape) != tuple(val.shape):
        raise ValueError(
            f"shape mismatch at {'.'.join(path)}: checkpoint {val.shape} vs "
            f"framework {tuple(dst.shape)}"
        )
    node[leaf] = jnp.asarray(val, dtype=jnp.float32)


def _layer_dest(tree_path: tuple, torch_tail: str, arr: np.ndarray):
    """Map a layer-local torch name (weight/bias/affine.*/noise_*/const) to the
    framework leaf path + converted array."""
    parts = torch_tail.split(".")
    if parts[-1] in ("weight", "bias") and len(parts) == 2 and parts[0] == "affine":
        conv = arr.T if parts[-1] == "weight" and arr.ndim == 2 else arr
        return tree_path + ("affine", parts[-1]), conv
    if len(parts) == 1:
        name = parts[0]
        if name == "weight":
            return tree_path + ("weight",), _convert_leaf("weight", arr)
        if name in ("bias", "noise_strength", "noise_const"):
            return tree_path + (name,), arr
        if name == "const":
            # torch [C, H, W] (networks.py:1012) -> framework [H, W, C]
            return tree_path + ("const",), np.ascontiguousarray(np.transpose(arr, (1, 2, 0)))
    return None


def _map_block_tensors(sd, src_prefix, dst_prefix, params, report_lists):
    """Copy every tensor under `src_prefix` (e.g. 'synthesis.vb8.') into
    params[dst_prefix...] with layout conversion."""
    imported, skipped = report_lists
    for name, arr in sd.items():
        if not name.startswith(src_prefix):
            continue
        tail = name[len(src_prefix):]
        if tail.endswith(_SKIP_SUFFIXES):
            continue
        # tail is like 'conv0.weight', 'conv0.affine.weight', 'const', 'torgb.bias'
        parts = tail.split(".", 1)
        if len(parts) == 1:
            dest = _layer_dest(dst_prefix, parts[0], arr)
        else:
            dest = _layer_dest(dst_prefix + (parts[0],), parts[1], arr)
        if dest is None:
            skipped.append(name)
            continue
        try:
            _set_leaf(params, dest[0], dest[1])
            imported.append(name)
        except KeyError:
            skipped.append(name)


def _import_mapping(sd, prefix, params_mapping, imported, skipped):
    for name, arr in sd.items():
        if not name.startswith(prefix):
            continue
        tail = name[len(prefix):]
        if tail.endswith(_SKIP_SUFFIXES):
            continue
        parts = tail.split(".")
        if parts[0] == "w_avg":
            # reference w_avg may be [w_dim] or broadcast [num_ws, w_dim]
            arr2 = arr[0] if arr.ndim == 2 else arr
            try:
                _set_leaf(params_mapping, ("w_avg",), arr2)
                imported.append(name)
            except (KeyError, ValueError):
                skipped.append(name)
            continue
        if len(parts) == 2 and parts[1] in ("weight", "bias"):
            conv = arr.T if (parts[1] == "weight" and arr.ndim == 2) else arr
            try:
                _set_leaf(params_mapping, (parts[0], parts[1]), conv)
                imported.append(name)
            except (KeyError, ValueError):
                skipped.append(name)
            continue
        skipped.append(name)


def _leaf_paths(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _leaf_paths(v, prefix + (k,))
        else:
            yield prefix + (k,)


def _auto_map_renderer(sd, candidates, params, imported):
    """Shape-signature matching of UNNAMED source tensors onto the framework
    renderer-decoder leaves (the pickled renderer's naming is not recoverable
    from the reference tree, but its tensor shapes are distinctive).

    Only UNAMBIGUOUS matches are applied: a (converted) source shape that occurs
    exactly once among the candidates AND exactly once among the unfilled
    renderer leaves. Equalized-lr heuristic: the framework decoder applies
    1/sqrt(fan_in) at call time (StyleGAN convention); if a matched 2-D weight
    looks like a plain trained nn.Linear (std << 1), it is rescaled by
    sqrt(fan_in) so the effective matmul weight is preserved. Returns the list
    of applied "src -> dest [xS]" records."""
    dest = {p: np.asarray(_get_leaf(params, p))
            for p in _leaf_paths(params) if p[:2] == ("synthesis", "renderer")}
    by_shape_dest: Dict[tuple, list] = {}
    for p, leaf in dest.items():
        by_shape_dest.setdefault(tuple(leaf.shape), []).append(p)
    by_shape_src: Dict[tuple, list] = {}
    for name in candidates:
        conv = _convert_leaf(name, sd[name])
        by_shape_src.setdefault(tuple(conv.shape), []).append(name)
    applied = []
    for shape, srcs in by_shape_src.items():
        dsts = by_shape_dest.get(shape, [])
        if len(srcs) == 1 and len(dsts) == 1:
            name, p = srcs[0], dsts[0]
            arr = _convert_leaf(name, sd[name]).astype(np.float32)
            scale = 1.0
            if arr.ndim == 2 and float(np.std(arr)) < 0.25:
                # plain-Linear semantics: fold the missing equalized-lr gain in
                scale = float(np.sqrt(arr.shape[0]))
            _set_leaf(params, p, arr * scale)
            imported.append(name)
            applied.append(f"{name} -> {'.'.join(p)}"
                           + (f" [x{scale:.3g}]" if scale != 1.0 else ""))
    return applied


def _get_leaf(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def import_generator(
    sd: Dict[str, np.ndarray],
    render_size: int = 64,
    num_steps: int = 96,
    dtype: str = "bfloat16",
    extra_map: Optional[Dict[str, tuple]] = None,
    auto_map_renderer: bool = True,
):
    """Reference generator state dict -> (Ide3dGenerator, params, ImportReport).

    Architecture is inferred from the state dict (resolutions, channels, mapping
    depth, latent counts), then hosted by GeneratorConfig(vb_ref_compat=True):
    the reference two-conv vb interior (inversion/networks.py:1008-1043) and
    reference w-row slicing. The volume renderer's decoder MLP is framework-owned
    (the pickled renderer's naming is not recoverable from the reference tree);
    with auto_map_renderer=True, leftover source tensors whose SHAPES match a
    decoder leaf unambiguously are recovered anyway (report.auto_mapped), and
    only genuinely ambiguous leaves stay initialized (report.missing_dest).
    """
    import jax

    from ..models.generator import GeneratorConfig, Ide3dGenerator
    from ..render.renderer import RenderParams

    sd = _strip_prefix(sd)

    # ---- infer mapping dims
    n_fc = len(_res_of(sd, r"mapping\.fc(\d+)\.weight$"))
    assert n_fc > 0, "state dict has no mapping.fc* layers"
    w_dim = int(sd[f"mapping.fc{n_fc - 1}.bias"].shape[0])
    has_embed = "mapping.embed.weight" in sd
    c_dim = int(sd["mapping.embed.weight"].shape[1]) if has_embed else 0
    embed_out = int(sd["mapping.embed.weight"].shape[0]) if has_embed else 0
    if has_embed and embed_out != w_dim:
        raise ValueError(
            f"mapping.embed out_features {embed_out} != w_dim {w_dim}: "
            "unsupported embed_features override"
        )
    z_dim = int(sd["mapping.fc0.weight"].shape[1]) - embed_out

    # ---- infer vb stack
    vb_res = _res_of(sd, r"synthesis\.vb(\d+)\.")
    sr_res = _res_of(sd, r"synthesis\.b(\d+)\.")
    assert vb_res and sr_res, "state dict has no synthesis.vb*/b* blocks"
    vb_ch = tuple(int(sd[f"synthesis.vb{r}.conv1.bias"].shape[0]) for r in vb_res)
    sr_ch = tuple(int(sd[f"synthesis.b{r}.conv1.bias"].shape[0]) for r in sr_res)
    feature_channels = int(sd[f"synthesis.vb{vb_res[0]}.torgb.bias"].shape[0]) // 3
    seg_channels = int(sd[f"synthesis.vb{vb_res[0]}.toseg.bias"].shape[0]) // 3
    img_channels = int(sd[f"synthesis.b{sr_res[-1]}.torgb.bias"].shape[0])
    img_resolution = sr_res[-1]

    cfg = GeneratorConfig(
        z_dim=z_dim,
        c_dim=c_dim,
        w_dim=w_dim,
        img_resolution=img_resolution,
        img_channels=img_channels,
        seg_channels=seg_channels,
        feature_channels=feature_channels,
        render_size=render_size,
        plane_resolution=vb_res[-1],
        dtype=dtype,
        render=RenderParams(img_size=render_size, num_steps=num_steps),
        vb_ref_compat=True,
        raw_head="slice",
        vb_resolutions_override=tuple(vb_res),
        vb_channels_override=vb_ch,
        sr_resolutions_override=tuple(sr_res),
        sr_channels_override=sr_ch,
        mapping_num_layers=n_fc,
    )
    G = Ide3dGenerator(cfg)
    params = jax.jit(G.init)(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(np.asarray, params)

    imported: list = []
    skipped: list = []
    _import_mapping(sd, "mapping.", params["mapping"], imported, skipped)
    for r in vb_res:
        _map_block_tensors(
            sd, f"synthesis.vb{r}.", ("synthesis", f"vb{r}"), params, (imported, skipped)
        )
    for r in sr_res:
        _map_block_tensors(
            sd, f"synthesis.b{r}.", ("synthesis", f"b{r}"), params, (imported, skipped)
        )
    # explicit extra mappings (e.g. the pickled renderer's decoder once its
    # names are known from inspecting a real checkpoint):
    # {torch_name: ("synthesis", "renderer", "dec_w1")}; 2D weights are
    # transposed like FC weights, 4D like convs.
    for src, dest in (extra_map or {}).items():
        if src in sd:
            _set_leaf(params, tuple(dest), _convert_leaf(src, sd[src]))
            imported.append(src)

    # anything else under synthesis.* (renderer internals etc.)
    handled = set(imported) | set(skipped)
    leftovers = [name for name in sd
                 if name not in handled and not name.endswith(_SKIP_SUFFIXES)]

    # the pickled renderer-decoder's names are unknown — recover what the
    # shapes pin down unambiguously (report records every applied match)
    auto_mapped: list = []
    if auto_map_renderer and leftovers:
        auto_mapped = _auto_map_renderer(sd, leftovers, params, imported)
        handled = set(imported)
        leftovers = [n for n in leftovers if n not in handled]
    skipped.extend(leftovers)

    auto_dest = {rec.split(" -> ")[1].split(" ")[0] for rec in auto_mapped}
    missing = tuple(
        ".".join(p)
        for p in _leaf_paths(params)
        if p[:2] == ("synthesis", "renderer") and ".".join(p) not in auto_dest
    )
    report = ImportReport(
        imported=len(imported),
        skipped_source=tuple(sorted(skipped)),
        missing_dest=missing,
        auto_mapped=tuple(auto_mapped),
    )
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return G, params, report


def import_discriminator(sd: Dict[str, np.ndarray], dtype: str = "bfloat16"):
    """Reference Discriminator state dict (inversion/networks.py:1446-1502 naming:
    b{res}.{fromrgb,conv0,conv1,skip}, mapping.fc*, b4.{conv,fc,out}) ->
    (Discriminator, params, ImportReport)."""
    import jax

    from ..models.discriminator import Discriminator, DiscriminatorConfig

    sd = _strip_prefix(sd)
    res = [r for r in _res_of(sd, r"b(\d+)\.") if r > 4]
    assert res, "state dict has no b{res} blocks"
    img_resolution = res[-1]
    img_channels = int(sd[f"b{img_resolution}.fromrgb.weight"].shape[1])
    # channel schedule check: tmp_channels(res) = conv0 out at that res; the
    # epilogue's conv output pins channels(4) (networks.py:1411)
    ch = {r: int(sd[f"b{r}.conv0.bias"].shape[0]) for r in res}
    ch[4] = int(sd["b4.conv.bias"].shape[0])
    channel_max = max(ch.values())
    channel_base = ch[img_resolution] * img_resolution
    # D's conditioning mapping has z_dim=0: fc0 consumes the label EMBEDDING
    # (networks.py:246-325), so c_dim comes from embed.weight's in-features; the
    # mapping DEPTH comes from the fc count (a shallower checkpoint mapping must
    # not leave extra framework layers at their random init).
    has_cmap = "mapping.embed.weight" in sd
    c_dim = int(sd["mapping.embed.weight"].shape[1]) if has_cmap else 0
    cmap_dim = int(sd["mapping.embed.weight"].shape[0]) if has_cmap else None
    n_map_fc = len(_res_of(sd, r"mapping\.fc(\d+)\.weight$")) if has_cmap else 8

    cfg = DiscriminatorConfig(
        c_dim=c_dim,
        img_resolution=img_resolution,
        img_channels=img_channels,
        channel_base=channel_base,
        channel_max=channel_max,
        cmap_dim=cmap_dim,
        mapping_num_layers=n_map_fc or 8,
        dtype=dtype,
    )
    D = Discriminator(cfg)
    for r in res + [4]:  # verify the formula reproduces the checkpoint schedule
        want = min(channel_base // r, channel_max)
        if want != ch[r]:
            raise ValueError(
                f"discriminator channel schedule at b{r} ({ch[r]}) does not follow "
                f"min({channel_base}//res, {channel_max}); explicit override needed"
            )

    params = jax.jit(D.init)(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(np.asarray, params)
    imported: list = []
    skipped: list = []
    # Epilogue fc consumes a FLATTENED feature map: torch flattens NCHW (CHW
    # element order, networks.py:1432), this framework flattens NHWC. Permute the
    # fc weight columns accordingly before generic conversion.
    sd = dict(sd)
    if "b4.fc.weight" in sd:
        fcw = sd.pop("b4.fc.weight")  # [out, C*R*R]
        C = int(sd["b4.conv.bias"].shape[0])
        R = int(np.sqrt(fcw.shape[1] // C))
        fcw = (
            fcw.reshape(fcw.shape[0], C, R, R)
            .transpose(0, 2, 3, 1)
            .reshape(fcw.shape[0], -1)
            .T
        )  # -> [R*R*C (HWC order), out]
        _set_leaf(params, ("b4", "fc", "weight"), fcw)
        imported.append("b4.fc.weight")
    for r in res:
        _map_block_tensors(sd, f"b{r}.", (f"b{r}",), params, (imported, skipped))
    _map_block_tensors(sd, "b4.", ("b4",), params, (imported, skipped))
    if c_dim:
        _import_mapping(sd, "mapping.", params["mapping"], imported, skipped)
    report = ImportReport(imported=len(imported), skipped_source=tuple(sorted(skipped)))
    return D, jax.tree_util.tree_map(jnp.asarray, params), report


def import_encoder(sd: Dict[str, np.ndarray], w_dim: int = 512):
    """Reference Encoder/HybridEncoder state dict -> (module, params, ImportReport).

    The reference interiors are repo-visible (inversion/networks.py:1560-1665) and
    hosted 1:1: convs*.0 -> stem, convs*.{i} -> block{i-1}, projector* verbatim."""
    import jax

    from ..models.encoder import Encoder, HybridEncoder

    sd = _strip_prefix(sd)
    hybrid = any(k.startswith("convs_img.") for k in sd)
    imported: list = []
    skipped: list = []

    def _stream(src_convs: str, src_proj: str) -> tuple:
        n_blocks = len(_res_of(sd, rf"{src_convs}\.(\d+)\.conv1\.weight$"))
        size = 2 ** (n_blocks + 2)
        input_dim = int(sd[f"{src_convs}.0.weight"].shape[1])
        out_dim = int(sd[f"{src_proj}.weight"].shape[0])
        return size, input_dim, out_dim

    if hybrid:
        size, img_dim, app_out = _stream("convs_img", "projector_img")
        _, seg_dim, geo_out = _stream("convs_seg", "projector_seg")
        E = HybridEncoder(
            size=size,
            n_latents_app=app_out // w_dim,
            n_latents_geo=geo_out // w_dim,
            w_dim=w_dim,
            input_img_dim=img_dim,
            input_seg_dim=seg_dim,
        )
        streams = {"img": ("convs_img", "projector_img"), "seg": ("convs_seg", "projector_seg")}
    else:
        size, input_dim, out_dim = _stream("convs", "projector")
        E = Encoder(size=size, n_latents=out_dim // w_dim, w_dim=w_dim, input_dim=input_dim)
        streams = {None: ("convs", "projector")}

    params = jax.jit(E.init)(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(np.asarray, params)

    for dst_name, (src_convs, src_proj) in streams.items():
        base = (dst_name,) if dst_name else ()
        _map_block_tensors(sd, f"{src_convs}.0.", base + ("stem",), params, (imported, skipped))
        n_blocks = len(_res_of(sd, rf"{src_convs}\.(\d+)\.conv1\.weight$"))
        for i in range(1, n_blocks + 1):
            _map_block_tensors(
                sd, f"{src_convs}.{i}.", base + (f"block{i - 1}",), params, (imported, skipped)
            )
        _map_block_tensors(sd, f"{src_proj}.", base + ("projector",), params, (imported, skipped))

    report = ImportReport(imported=len(imported), skipped_source=tuple(sorted(skipped)))
    return E, jax.tree_util.tree_map(jnp.asarray, params), report


def load_network_pkl(path: str, **gen_kwargs) -> dict:
    """Reference .pkl -> dict of imported framework networks (legacy.py:22-63
    semantics, minus TF1-era conversion). Returns
    {'G'|'G_ema': (G, params, report), 'D': (...), 'E': (...)} for each entry whose
    tensors deserialize. TF1-era pickles — a (G, D, Gs) tuple of tflib Network
    states (legacy.py:27-33) — are converted through io/tf_legacy.py first."""
    payload = load_pickle_tensors(path)
    from .tf_legacy import convert_tf_payload, is_tf_legacy_payload
    if is_tf_legacy_payload(payload):
        return convert_tf_payload(payload)
    sds = pickle_payload_to_state_dicts(payload)
    out = {}
    # w_dim is not recoverable from an encoder state dict alone (projector rows
    # are n_latents * w_dim); take it from the generator in the same pkl.
    w_dim = 512
    for gkey in ("G_ema", "G"):
        if gkey in sds and "mapping.fc0.bias" in sds[gkey]:
            n_fc = len(_res_of(sds[gkey], r"mapping\.fc(\d+)\.weight$"))
            w_dim = int(sds[gkey][f"mapping.fc{n_fc - 1}.bias"].shape[0])
            break
    for key, sd in sds.items():
        try:
            if key in ("G", "G_ema"):
                out[key] = import_generator(sd, **gen_kwargs)
            elif key == "D":
                out[key] = import_discriminator(sd)
            elif key == "E":
                out[key] = import_encoder(sd, w_dim=w_dim)
        except Exception as e:  # keep going; report per-entry failures
            out[key] = e
    return out
