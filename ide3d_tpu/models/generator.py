"""The IDE-3D generator, rebuilt TPU-native.

Top-level API (behavioral contract, SURVEY.md §2.1, recovered from
gen_images.py:92-109, apps/train_hybrid_encoder.py:300, inversion/scripts/run_pti.py:170):

    G.mapping(params, z, c, truncation_psi, truncation_cutoff) -> ws [B, 18, 512]
    G.synthesis(params, ws, c, render_params=..., noise_mode=..., return_seg=False,
                return_raw=False) -> img | (img, seg) | (img, img_raw)

  * c is the 25-dim label: flattened 4x4 cam2world ++ flattened 3x3 intrinsics,
  * render_params override fov / num_steps / noise (pose always comes from c),
  * seg is the 19-channel semantic output, upsampled to img_resolution,
  * img_raw is the 64^2 neural render (RGB head on the feature image).

w+ latent layout (num_ws = 18, the 8 geometry + 10 appearance split pinned by
HybridEncoder(n_latents_geo=8, n_latents_app=10) at apps/train_hybrid_encoder.py:208
and the Painter appearance lock `rec_ws[:, 8:] = w_prev[:, 8:]` at Painter/run_UI.py:198):

    row 0..6   vb4..vb256 modulated convs          (geometry)
    row 7      shared tri-plane ToRGB/ToSEG head   (geometry)
    row 8      raw RGB head on the 64^2 feature image   (appearance)
    rows 9..17 superres: b64(9,10) b128(11,12) b256(13,14) b512(15,16) + final
               ToRGB(17); intermediate skip ToRGBs share the next block's first row
               (StyleGAN2 convention, inversion/networks.py:1183-1200)

Structure attributes preserved for tooling parity: `voxel_block_resolutions`,
`block_resolutions`, `render_size`, `num_ws`, `w_dim`, and `renderer.sample_voxel`
(extract_shapes.py:110-147).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..render.renderer import RenderParams, TriplaneRenderer
from .blocks import SegSynthesisBlock, SynthesisBlock
from .layers import ToRGBLayer
from .mapping import MappingNetwork


@dataclasses.dataclass(frozen=True)
class GeneratorConfig:
    z_dim: int = 512
    c_dim: int = 25
    w_dim: int = 512
    img_resolution: int = 512
    img_channels: int = 3
    seg_channels: int = 19
    feature_channels: int = 32
    render_size: int = 64
    plane_resolution: int = 256
    # channel multipliers, reference StyleGAN2 convention (networks.py:1162-1163)
    channel_base: int = 32768
    channel_max: int = 512
    sr_channel_base: int = 16384
    sr_channel_max: int = 256
    dtype: str = "bfloat16"  # compute dtype for conv stacks; accumulators stay fp32
    render: RenderParams = RenderParams()
    # Optional image-conditioning encoder built into G (reference contract:
    # Generator.encoder inferring ws (+camera) from an input image,
    # inversion/networks.py:1237-1251; consumed by the avatar style-transfer path
    # apps/infer_face_animation_avatar.py:114 via cond_img).
    use_encoder: bool = False
    encoder_predicts_camera: bool = True
    # --- hybrid tri-plane/voxel representation (IDE-3D paper Sec. 3.1) ----------
    # When on, a VolumeGAN FeatureVolume (models/feature_volume.py; contract
    # inversion/networks.py:1853-1917) conditioned on the first geometry w row
    # produces a 3D feature grid whose trilinearly-sampled features are added to
    # the tri-plane features before the sigma/feature decoder.
    use_feature_volume: bool = False
    fv_resolution: int = 32
    fv_base_channels: int = 128
    # --- superres architecture: "sg2" (skip blocks, the shipped model family) or
    # "sg3" (alias-free SynthesisLayer3 stack, contract networks.py:519-665 +
    # the filtered_lrelu op family). Same w-row budget either way.
    sr_arch: str = "sg2"
    # --- reference-checkpoint compatibility (round-2 parity gate) ---------------
    # vb_ref_compat=True uses the reference two-conv vb interior
    # (SegSynthesisBlock(ref_compat=True)) with the reference w-row slicing
    # convention (extract_shapes.py:110-124: each block reads num_conv+1 rows and
    # advances num_conv; the shared ToRGB/ToSEG row overlaps the next stack).
    vb_ref_compat: bool = False
    # raw_head: "torgb" = dedicated w-consuming raw-RGB head (clean-room design);
    # "slice" = raw image is the first 3 feature channels (EG3D convention, used by
    # imported reference checkpoints where no raw head exists in the state_dict).
    raw_head: str = "torgb"
    # Explicit per-block channel/resolution lists for imported checkpoints whose
    # schedule does not follow the channel_base formula. None = formula.
    vb_resolutions_override: Optional[tuple] = None
    vb_channels_override: Optional[tuple] = None
    sr_resolutions_override: Optional[tuple] = None
    sr_channels_override: Optional[tuple] = None
    mapping_num_layers: int = 8

    @property
    def voxel_block_resolutions(self) -> tuple:
        if self.vb_resolutions_override is not None:
            return tuple(self.vb_resolutions_override)
        res, out = [], 4
        while out <= self.plane_resolution:
            res.append(out)
            out *= 2
        return tuple(res)

    @property
    def block_resolutions(self) -> tuple:
        """Superres stack: render_size (refine, no upsample) then x2 up to output."""
        if self.sr_resolutions_override is not None:
            return tuple(self.sr_resolutions_override)
        res, out = [], self.render_size
        while out <= self.img_resolution:
            res.append(out)
            out *= 2
        return tuple(res)

    def vb_channels(self, res: int) -> int:
        if self.vb_channels_override is not None:
            return self.vb_channels_override[self.voxel_block_resolutions.index(res)]
        return min(self.channel_base // res, self.channel_max)

    def sr_channels(self, res: int) -> int:
        if self.sr_channels_override is not None:
            return self.sr_channels_override[self.block_resolutions.index(res)]
        return min(self.sr_channel_base // res, self.sr_channel_max)


@dataclasses.dataclass(frozen=True)
class Ide3dSynthesisNetwork:
    cfg: GeneratorConfig

    # ------------------------------------------------------------------ structure

    @property
    def voxel_block_resolutions(self):
        return self.cfg.voxel_block_resolutions

    @property
    def block_resolutions(self):
        return self.cfg.block_resolutions

    @property
    def render_size(self):
        return self.cfg.render_size

    @property
    def w_dim(self):
        return self.cfg.w_dim

    @property
    def _vb_num_conv_total(self) -> int:
        """Total w-row advance of the vb stack (reference slicing convention)."""
        return sum(
            self._vb_block(i, res).num_conv
            for i, res in enumerate(self.voxel_block_resolutions)
        )

    @property
    def num_ws(self) -> int:
        if self.cfg.vb_ref_compat:
            # reference convention: vb stack advances sum(num_conv); its shared
            # ToRGB/ToSEG row overlaps the first superres conv row; superres
            # advances 2 per block + 1 final ToRGB (networks.py:1178-1193).
            n = self._vb_num_conv_total + 2 * len(self.block_resolutions) + 1
            if self.cfg.raw_head == "torgb":
                n += 1
            return n
        # clean-room: 7 vb convs + 1 shared plane head + 1 raw-RGB head
        # + 2 convs per superres block + 1 final ToRGB
        return len(self.voxel_block_resolutions) + 2 + 2 * len(self.block_resolutions) + 1

    @property
    def num_ws_geo(self) -> int:
        if self.cfg.vb_ref_compat:
            return self._vb_num_conv_total + 1
        return len(self.voxel_block_resolutions) + 1  # 8

    @property
    def renderer(self) -> TriplaneRenderer:
        return TriplaneRenderer(
            feature_channels=self.cfg.feature_channels, seg_channels=self.cfg.seg_channels
        )

    def _vb_block(self, i: int, res: int) -> SegSynthesisBlock:
        cfg = self.cfg
        prev_res = self.voxel_block_resolutions[i - 1] if i > 0 else None
        return SegSynthesisBlock(
            in_channels=0 if i == 0 else cfg.vb_channels(prev_res),
            out_channels=cfg.vb_channels(res),
            w_dim=cfg.w_dim,
            resolution=res,
            img_plane_channels=3 * cfg.feature_channels,
            seg_plane_channels=3 * cfg.seg_channels,
            up=1 if i == 0 else 2,
            dtype=cfg.dtype,
            ref_compat=cfg.vb_ref_compat,
        )

    def _sr_block(self, i: int, res: int) -> SynthesisBlock:
        cfg = self.cfg
        prev_res = self.block_resolutions[i - 1] if i > 0 else None
        in_ch = cfg.feature_channels if i == 0 else cfg.sr_channels(prev_res)
        return SynthesisBlock(
            in_channels=in_ch,
            out_channels=cfg.sr_channels(res),
            w_dim=cfg.w_dim,
            resolution=res,
            img_channels=cfg.img_channels,
            up=1 if (i == 0 and res == cfg.render_size) else 2,
            dtype=cfg.dtype,
        )

    def _raw_rgb(self) -> ToRGBLayer:
        return ToRGBLayer(self.cfg.feature_channels, self.cfg.img_channels, self.cfg.w_dim)

    def _feature_volume(self):
        from .feature_volume import FeatureVolume

        return FeatureVolume(
            feat_res=self.cfg.fv_resolution,
            base_channels=self.cfg.fv_base_channels,
            output_channels=self.cfg.feature_channels,
            z_dim=self.cfg.w_dim,
        )

    def _sg3_layers(self):
        """Alias-free superres stack (sr_arch='sg3'): an 8-conv SynthesisLayer3
        chain from render_size to img_resolution + final ToRGB — consumes the SAME
        9 w rows as the SG2 skip stack, so the 18-row w+ layout is unchanged.
        Schedule: one refine + one upsample layer per octave, cutoff 0.4*rate,
        transition half-width 0.1*rate (simplified alias-free schedule; the full
        StyleGAN3 progression lives in layers_sg3.sg3_layer_schedule)."""
        from .layers_sg3 import SynthesisLayer3

        cfg = self.cfg
        rs, R = cfg.render_size, cfg.img_resolution
        rates = [rs]
        while rates[-1] < R:
            rates.append(rates[-1] * 2)
        # (in_rate, out_rate) pairs: refine at rs, then (up, refine) per octave,
        # padded with refines at R so the conv count always matches the SG2 row
        # budget (2 * len(block_resolutions)).
        pairs = [(rs, rs)]
        for r in rates[:-1]:
            pairs.append((r, r * 2))
            pairs.append((r * 2, r * 2))
        n_convs = 2 * len(self.block_resolutions)
        while len(pairs) < n_convs:
            pairs.append((R, R))
        pairs = pairs[:n_convs]

        def ch(rate):
            nearest = min(self.block_resolutions, key=lambda b: abs(b - rate))
            return cfg.sr_channels(nearest)

        layers = []
        in_ch = cfg.feature_channels
        for (ri, ro) in pairs:
            out_ch = ch(ro)
            layers.append(SynthesisLayer3(
                w_dim=cfg.w_dim, is_torgb=False,
                in_channels=in_ch, out_channels=out_ch,
                in_size=ri, out_size=ro,
                in_sampling_rate=float(ri), out_sampling_rate=float(ro),
                in_cutoff=0.4 * ri, out_cutoff=0.4 * ro,
                in_half_width=0.1 * ri, out_half_width=0.1 * ro,
            ))
            in_ch = out_ch
        torgb = SynthesisLayer3(
            w_dim=cfg.w_dim, is_torgb=True,
            in_channels=in_ch, out_channels=cfg.img_channels,
            in_size=R, out_size=R,
            in_sampling_rate=float(R), out_sampling_rate=float(R),
            in_cutoff=0.4 * R, out_cutoff=0.4 * R,
            in_half_width=0.1 * R, out_half_width=0.1 * R,
        )
        return layers, torgb

    # ----------------------------------------------------------------------- init

    def init(self, key: jax.Array) -> dict:
        cfg = self.cfg
        n_vb = len(self.voxel_block_resolutions)
        n_sr = len(self.block_resolutions)
        keys = jax.random.split(key, n_vb + n_sr + 2)
        params = {}
        for i, res in enumerate(self.voxel_block_resolutions):
            params[f"vb{res}"] = self._vb_block(i, res).init(keys[i])
        params["renderer"] = self.renderer.init(keys[n_vb])
        if cfg.raw_head == "torgb":
            params["raw_rgb"] = self._raw_rgb().init(keys[n_vb + 1])
        if cfg.use_feature_volume:
            params["feature_volume"] = self._feature_volume().init(
                jax.random.fold_in(keys[n_vb], 1)
            )
        if cfg.sr_arch == "sg3":
            layers, torgb = self._sg3_layers()
            sg3 = {}
            for i, layer in enumerate(layers):
                sg3[f"layer{i}"] = layer.init(jax.random.fold_in(keys[n_vb + 2], i))
            sg3["torgb"] = torgb.init(jax.random.fold_in(keys[n_vb + 2], 999))
            params["sg3_sr"] = sg3
        else:
            for i, res in enumerate(self.block_resolutions):
                params[f"b{res}"] = self._sr_block(i, res).init(keys[n_vb + 2 + i])
        return params

    # -------------------------------------------------------------------- forward

    def generate_planes(
        self,
        params: dict,
        ws: jax.Array,  # [B, num_ws, w_dim]
        noise_mode: str = "const",
        noise_key: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Run the vb stack: geometry rows of ws -> (img_v, seg_v) plane stacks."""
        x = img_v = seg_v = None
        if self.cfg.vb_ref_compat:
            # reference slicing: read num_conv+1 rows, advance num_conv
            # (extract_shapes.py:115-120).
            w_idx = 0
            for i, res in enumerate(self.voxel_block_resolutions):
                nk = None
                if noise_key is not None:
                    nk = jax.random.fold_in(noise_key, i)
                blk = self._vb_block(i, res)
                ws_blk = ws[:, w_idx : w_idx + blk.num_conv + 1]
                x, img_v, seg_v = blk(
                    params[f"vb{res}"], x, img_v, ws_blk,
                    condition_img=seg_v, noise_mode=noise_mode, noise_key=nk,
                )
                w_idx += blk.num_conv
            return img_v, seg_v
        n_vb = len(self.voxel_block_resolutions)
        w_planes = ws[:, n_vb]  # shared head row (= row 7)
        for i, res in enumerate(self.voxel_block_resolutions):
            nk = None
            if noise_key is not None:
                nk = jax.random.fold_in(noise_key, i)
            ws2 = jnp.stack([ws[:, i], w_planes], axis=1)
            x, img_v, seg_v = self._vb_block(i, res)(
                params[f"vb{res}"], x, img_v, ws2,
                condition_img=seg_v, noise_mode=noise_mode, noise_key=nk,
            )
        return img_v, seg_v

    def superresolve(
        self,
        params: dict,
        feature: jax.Array,  # [B, render, render, feature_channels]
        img_raw: jax.Array,  # [B, render, render, 3] fp32
        ws: jax.Array,
        noise_mode: str = "const",
        noise_key: Optional[jax.Array] = None,
    ) -> jax.Array:
        n_vb = len(self.voxel_block_resolutions)
        x, img = feature, img_raw
        if self.cfg.vb_ref_compat:
            # first superres conv row overlaps the vb shared head row
            # (reference convention); +1 if a dedicated raw head consumed a row.
            base = self._vb_num_conv_total + (1 if self.cfg.raw_head == "torgb" else 0)
        else:
            base = n_vb + 2  # first superres conv row (= 9)
        if self.cfg.sr_arch == "sg3":
            layers, torgb = self._sg3_layers()
            x = feature.astype(jnp.dtype(self.cfg.dtype))
            for i, layer in enumerate(layers):
                x = layer(params["sg3_sr"][f"layer{i}"], x, ws[:, base + i])
            img = torgb(
                params["sg3_sr"]["torgb"], x, ws[:, base + len(layers)]
            ).astype(jnp.float32)
            return img
        for i, res in enumerate(self.block_resolutions):
            nk = None
            if noise_key is not None:
                nk = jax.random.fold_in(noise_key, 100 + i)
            r0 = base + 2 * i
            ws3 = jnp.stack([ws[:, r0], ws[:, r0 + 1], ws[:, min(r0 + 2, self.num_ws - 1)]], axis=1)
            x, img = self._sr_block(i, res)(
                params[f"b{res}"], x, img, ws3, noise_mode=noise_mode, noise_key=nk
            )
        return img

    def __call__(
        self,
        params: dict,
        ws: jax.Array,  # [B, num_ws, w_dim]
        c: jax.Array,  # [B, 25]
        render_params: Optional[RenderParams] = None,
        noise_mode: str = "const",
        rng: Optional[jax.Array] = None,
        return_seg: bool = False,
        return_raw: bool = False,
        return_all: bool = False,
        force_fp32: bool = False,
    ):
        cfg = self.cfg
        if force_fp32 and cfg.dtype != "float32":
            # API parity with the reference's force_fp32 flag (SURVEY.md §2.1):
            # rebuild this (stateless) module over an fp32 config; params are
            # shared, only the compute dtype changes.
            fp32_cfg = dataclasses.replace(cfg, dtype="float32")
            return Ide3dSynthesisNetwork(fp32_cfg)(
                params, ws, c, render_params=render_params, noise_mode=noise_mode,
                rng=rng, return_seg=return_seg, return_raw=return_raw,
                return_all=return_all,
            )
        rp = render_params or cfg.render
        assert rp.img_size == cfg.render_size
        assert ws.shape[1] == self.num_ws, (
            f"ws has {ws.shape[1]} rows, generator expects {self.num_ws}"
        )

        noise_key = render_key = None
        if rng is not None:
            noise_key, render_key = jax.random.split(rng)
        if noise_mode != "random":
            noise_key = None

        img_v, seg_v = self.generate_planes(params, ws, noise_mode, noise_key)

        cam2world = c[:, :16].reshape(-1, 4, 4).astype(jnp.float32)
        # Sample the planes in the compute dtype (bf16 in production): halves the
        # gather bandwidth of the render hot loop; compositing stays fp32 inside
        # integrate_rays.
        sample_dtype = jnp.dtype(cfg.dtype)
        volume = None
        if cfg.use_feature_volume:
            # hybrid voxel branch, conditioned on the first geometry row
            volume = self._feature_volume()(
                params["feature_volume"], ws[:, 0]
            ).astype(sample_dtype)
        rout = self.renderer.render(
            params["renderer"],
            img_v.astype(sample_dtype),
            seg_v.astype(sample_dtype),
            cam2world,
            rp,
            key=render_key,
            volume=volume,
        )

        n_vb = len(self.voxel_block_resolutions)
        if cfg.raw_head == "slice":
            # EG3D convention: the first 3 feature channels ARE the raw RGB
            # (imported reference checkpoints have no dedicated raw head).
            img_raw = rout["feature"][..., :3].astype(jnp.float32)
        else:
            raw_row = self._vb_num_conv_total if cfg.vb_ref_compat else n_vb + 1
            img_raw = self._raw_rgb()(
                params["raw_rgb"], rout["feature"].astype(jnp.dtype(cfg.dtype)), ws[:, raw_row]
            ).astype(jnp.float32)

        img = self.superresolve(
            params, rout["feature"], img_raw, ws, noise_mode, noise_key
        )

        if return_all:
            seg = self._upsample_seg(rout["seg"])
            return {
                "img": img,
                "img_raw": img_raw,
                "seg": seg,
                "seg_raw": rout["seg"],
                "depth": rout["depth"],
                "weights_sum": rout["weights_sum"],
            }
        if return_seg:
            return img, self._upsample_seg(rout["seg"])
        if return_raw:
            return img, img_raw
        return img

    def _upsample_seg(self, seg_raw: jax.Array) -> jax.Array:
        B, h, w, C = seg_raw.shape
        R = self.cfg.img_resolution
        if h == R:
            return seg_raw
        return jax.image.resize(seg_raw, (B, R, R, C), method="bilinear")


def make_pipelined_frame(
    S: Ide3dSynthesisNetwork,
    render_params: Optional[RenderParams] = None,
    return_seg: bool = True,
    cuts: tuple = ("coarse",),
    epilogue=None,
):
    """Latency-optimized free-view frame: the pipeline split into chained jitted
    XLA programs at chosen stage boundaries. XLA schedules the fused hierarchical
    frame measurably worse than the sum of its stages on v5e (PERF.md round 2);
    chaining smaller programs (dispatch is async, one sync at the end) recovers
    most of that scheduling overhead. Training keeps the fused single program
    (`S.__call__`) for end-to-end differentiation; interactive/serving paths use
    this.

    Stages, in order: "planes" (vb stack + quad table [+ feature volume]),
    "coarse" (ray gen + coarse gather/decode + weights pass + sample_pdf),
    "fine" (fine gather/decode + merged compositing), "sr" (raw head + superres
    + seg upsample). `cuts` names the stages AFTER which to split; every cut
    configuration is numerically identical to the fused frame (pinned by
    tests/test_models.py).

    `epilogue(frame_out) -> aux` (optional) is fused into the LAST program and
    its result appended to the return: latency callers that need a per-frame
    scalar (e.g. bench.py's sync checksum) would otherwise dispatch a third
    tiny XLA program per frame — on the tunneled backend every dispatch adds
    host/protocol overhead even though device execution pipelines.

    Returns frame(params, ws, c) -> img | (img, seg) [| + epilogue aux].
    """
    import jax

    cfg = S.cfg
    rp = render_params or cfg.render
    dt = jnp.dtype(cfg.dtype)
    R = S.renderer
    order = ("planes", "coarse", "fine", "sr")
    assert all(c_ in order[:-1] for c_ in cuts), cuts

    def s_planes(params, ws, c, carry):
        img_v, seg_v = S.generate_planes(params, ws)
        out = {"quad": R.build_table(img_v.astype(dt), seg_v.astype(dt))}
        if cfg.use_feature_volume:
            out["volume"] = S._feature_volume()(
                params["feature_volume"], ws[:, 0]
            ).astype(dt)
        return out

    def s_coarse(params, ws, c, carry):
        cam2world = c[:, :16].reshape(-1, 4, 4).astype(jnp.float32)
        return R.render_coarse(
            params["renderer"], None, None, cam2world, rp,
            quad=carry["quad"], volume=carry.get("volume"),
        )

    def s_fine(params, ws, c, carry):
        return R.render_fine(params["renderer"], carry, rp)

    def s_sr(params, ws, c, carry):
        n_vb = len(S.voxel_block_resolutions)
        if cfg.raw_head == "slice":
            img_raw = carry["feature"][..., :3].astype(jnp.float32)
        else:
            raw_row = S._vb_num_conv_total if cfg.vb_ref_compat else n_vb + 1
            img_raw = S._raw_rgb()(
                params["raw_rgb"], carry["feature"].astype(dt), ws[:, raw_row]
            ).astype(jnp.float32)
        img = S.superresolve(params, carry["feature"], img_raw, ws)
        if return_seg:
            return img, S._upsample_seg(carry["seg"])
        return img

    stages = {"planes": s_planes, "coarse": s_coarse, "fine": s_fine, "sr": s_sr}

    # Group consecutive stages between cuts; each group is one XLA program.
    groups, cur = [], []
    for name in order:
        cur.append(name)
        if name in cuts:
            groups.append(tuple(cur))
            cur = []
    groups.append(tuple(cur))

    def _group_fn(names, last):
        @jax.jit
        def g(params, ws, c, carry):
            for n in names:
                carry = stages[n](params, ws, c, carry)
            if last and epilogue is not None:
                out = carry if isinstance(carry, tuple) else (carry,)
                return out + (epilogue(*out),)
            return carry
        return g

    group_fns = [_group_fn(g, i == len(groups) - 1)
                 for i, g in enumerate(groups)]

    def frame(params, ws, c):
        carry = None
        for g in group_fns:
            carry = g(params, ws, c, carry)
        return carry

    return frame


def make_two_phase_frame(
    S: Ide3dSynthesisNetwork,
    render_params: Optional[RenderParams] = None,
    return_seg: bool = True,
):
    """The shipped two-program frame (split at the coarse/fine renderer
    boundary) — see make_pipelined_frame for the general form and PERF.md for
    the measurements behind the default cut."""
    return make_pipelined_frame(S, render_params, return_seg, cuts=("coarse",))


@dataclasses.dataclass(frozen=True)
class Ide3dGenerator:
    """mapping + synthesis bundle; params = {'mapping': ..., 'synthesis': ...}."""

    cfg: GeneratorConfig

    @property
    def synthesis(self) -> Ide3dSynthesisNetwork:
        return Ide3dSynthesisNetwork(self.cfg)

    @property
    def mapping(self) -> MappingNetwork:
        return MappingNetwork(
            z_dim=self.cfg.z_dim,
            c_dim=self.cfg.c_dim,
            w_dim=self.cfg.w_dim,
            num_ws=self.synthesis.num_ws,
            num_layers=self.cfg.mapping_num_layers,
        )

    @property
    def num_ws(self) -> int:
        return self.synthesis.num_ws

    @property
    def z_dim(self) -> int:
        return self.cfg.z_dim

    @property
    def c_dim(self) -> int:
        return self.cfg.c_dim

    @property
    def w_dim(self) -> int:
        return self.cfg.w_dim

    @property
    def img_resolution(self) -> int:
        return self.cfg.img_resolution

    @property
    def encoder(self):
        """Built-in image encoder (yaw/pitch head optional), or None."""
        if not self.cfg.use_encoder:
            return None
        from .encoder import Encoder

        return Encoder(
            size=self.cfg.img_resolution,
            n_latents=self.num_ws,
            w_dim=self.cfg.w_dim,
            input_dim=self.cfg.img_channels,
        )

    def init(self, key: jax.Array) -> dict:
        km, ks, ke = jax.random.split(key, 3)
        p = {"mapping": self.mapping.init(km), "synthesis": self.synthesis.init(ks)}
        enc = self.encoder
        if enc is not None:
            p["encoder"] = enc.init(ke)
            if self.cfg.encoder_predicts_camera:
                from .layers import FullyConnectedLayer

                p["encoder_cam"] = FullyConnectedLayer(
                    self.num_ws * self.cfg.w_dim, 2
                ).init(jax.random.fold_in(ke, 1))
        return p

    def encode(self, params: dict, img: jax.Array):
        """Infer (ws, yaw_pitch|None) from an image (networks.py:1244-1251)."""
        enc = self.encoder
        assert enc is not None, "GeneratorConfig.use_encoder is False"
        ws = enc(params["encoder"], img)
        ws = ws + params["mapping"]["w_avg"][None, None, :]
        cam = None
        if self.cfg.encoder_predicts_camera and "encoder_cam" in params:
            from .layers import FullyConnectedLayer

            head = FullyConnectedLayer(self.num_ws * self.cfg.w_dim, 2)
            cam = head(params["encoder_cam"], ws.reshape(ws.shape[0], -1))
        return ws, cam

    def __call__(
        self,
        params: dict,
        z: Optional[jax.Array] = None,
        c: Optional[jax.Array] = None,
        styles: Optional[jax.Array] = None,
        truncation_psi: float = 1.0,
        truncation_cutoff: Optional[int] = None,
        cond_img: Optional[jax.Array] = None,
        **synthesis_kwargs,
    ):
        """Top-level forward (contract: networks.py:1244-1258 incl. the optional
        image-conditioning pathway `cond_img`/`img`)."""
        if styles is not None:
            ws = styles
        elif cond_img is not None and self.cfg.use_encoder:
            ws, cam = self.encode(params, cond_img)
            if cam is not None and c is None:
                import math as _math

                from ..render.camera import create_cam2world_matrix, make_label_25, normalize_vecs

                yaw = cam[:, 0] + _math.pi / 2
                pitch = jnp.clip(cam[:, 1] + _math.pi / 2, 1e-5, _math.pi - 1e-5)
                radius = 2.7
                origins = jnp.stack(
                    [
                        radius * jnp.sin(pitch) * jnp.cos(yaw),
                        radius * jnp.cos(pitch),
                        radius * jnp.sin(pitch) * jnp.sin(yaw),
                    ],
                    axis=-1,
                )
                c2w = create_cam2world_matrix(normalize_vecs(-origins), origins)
                c = make_label_25(c2w)
        else:
            assert z is not None
            ws = self.mapping(
                params["mapping"], z, c,
                truncation_psi=truncation_psi, truncation_cutoff=truncation_cutoff,
            )
        return self.synthesis(params["synthesis"], ws, c, **synthesis_kwargs)
