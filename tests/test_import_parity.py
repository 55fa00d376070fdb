"""Round-2 checkpoint-parity gate (SURVEY.md build stage 4/5, VERDICT item 2).

A reference-shaped torch generator/discriminator/encoder is constructed IN THE
TEST (reference math re-implemented on top of the torch oracles in test_ops.py,
with reference state-dict naming from inversion/networks.py), its state dict is
imported via io/torch_import, and forward outputs are compared numerically.

This proves, without any real checkpoint in the environment:
  * the vb_ref_compat generator interior can HOST reference weights
    (conv0/conv1/torgb/toseg/const, networks.py:1008-1043),
  * the name mapping + every layout conversion (OIHW->HWIO, [out,in]->[in,out],
    const CHW->HWC, epilogue-fc flatten order) is exact,
  * the reference w-row slicing convention (extract_shapes.py:110-124) is
    reproduced.
"""

import math
import pickle
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
torch.set_grad_enabled(False)
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from test_ops import (  # noqa: E402
    nchw,
    to_nhwc,
    torch_conv2d_resample_oracle,
    torch_modulated_conv2d_oracle,
    upfirdn2d_oracle,
)

from ide3d_tpu.io.torch_import import (  # noqa: E402
    import_discriminator,
    import_encoder,
    import_generator,
    pickle_payload_to_state_dicts,
    load_pickle_tensors,
)
from ide3d_tpu.ops.upfirdn2d import setup_filter  # noqa: E402

FILTER = setup_filter([1, 3, 3, 1])  # normalized fp32 numpy [4,4]


# --------------------------------------------------------------- torch reference


def t_bias_act(x, b, act="lrelu", gain=None, clamp=256.0):
    if b is not None:
        shape = [1, -1] + [1] * (x.ndim - 2)
        x = x + b.reshape(shape)
    if act == "lrelu":
        x = F.leaky_relu(x, 0.2)
        g = math.sqrt(2.0) if gain is None else gain
    else:
        g = 1.0 if gain is None else gain
    x = x * g
    if clamp is not None:
        x = x.clamp(-clamp * (g if gain is not None else 1.0) / (g if gain is not None else 1.0), clamp)
        x = x.clamp(-clamp, clamp)
    return x


def t_upsample2d(x, gain_extra=1.0):
    """upfirdn2d.upsample2d contract (torch_utils/ops/upfirdn2d.py:313)."""
    p = ((4 + 1) // 2, (4 - 2) // 2)
    out = upfirdn2d_oracle(
        x.detach().numpy(), FILTER, 2, 1, (p[0], p[1], p[0], p[1]), False, 4.0 * gain_extra
    )
    return torch.from_numpy(out)


class TFC(nn.Module):
    """Reference FullyConnectedLayer (networks.py:136-165)."""

    def __init__(self, inf, outf, activation="linear", lr=1.0, bias_init=0.0):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(outf, inf))
        self.bias = nn.Parameter(torch.full((outf,), float(bias_init)))
        self.inf, self.act, self.lr = inf, activation, lr

    def forward(self, x):
        w = self.weight * (self.lr / math.sqrt(self.inf))
        out = F.linear(x, w, self.bias * self.lr)
        if self.act == "lrelu":
            out = F.leaky_relu(out, 0.2) * math.sqrt(2.0)
        return out


class TSynthesisLayer(nn.Module):
    """Reference SynthesisLayer, 'default' mode (networks.py:330-514)."""

    def __init__(self, in_ch, out_ch, w_dim, resolution, up=1, k=3):
        super().__init__()
        self.affine = TFC(w_dim, in_ch, bias_init=1.0)
        self.weight = nn.Parameter(torch.randn(out_ch, in_ch, k, k))
        self.bias = nn.Parameter(torch.zeros(out_ch))
        self.register_buffer("noise_const", torch.randn(resolution, resolution))
        self.noise_strength = nn.Parameter(torch.zeros(()))
        self.up, self.k = up, k

    def forward(self, x, w):
        styles = self.affine(w)
        wt = self.weight if self.up == 1 else torch.flip(self.weight, [2, 3])
        x = torch_modulated_conv2d_oracle(
            x, wt, styles, True, self.up, self.k // 2, FILTER if self.up > 1 else None
        )
        x = x + self.noise_const * self.noise_strength
        return t_bias_act(x, self.bias, act="lrelu", clamp=256.0)


class TToRGB(nn.Module):
    """Reference ToRGBLayer (networks.py:669-713)."""

    def __init__(self, in_ch, out_ch, w_dim):
        super().__init__()
        self.affine = TFC(w_dim, in_ch, bias_init=1.0)
        self.weight = nn.Parameter(torch.randn(out_ch, in_ch, 1, 1))
        self.bias = nn.Parameter(torch.zeros(out_ch))
        self.in_ch = in_ch

    def forward(self, x, w):
        styles = self.affine(w) * (1.0 / math.sqrt(self.in_ch))
        x = torch_modulated_conv2d_oracle(x, self.weight, styles, False, 1, 0, None)
        return t_bias_act(x, self.bias, act="linear", clamp=256.0)


class TSegBlock(nn.Module):
    """Reference SegSynthesisBlock, skip architecture (networks.py:966-1139)."""

    def __init__(self, in_ch, out_ch, w_dim, res, img_pc, seg_pc):
        super().__init__()
        self.in_ch = in_ch
        if in_ch == 0:
            self.const = nn.Parameter(torch.randn(out_ch, res, res))
        else:
            self.conv0 = TSynthesisLayer(in_ch, out_ch, w_dim, res, up=2)
        self.conv1 = TSynthesisLayer(out_ch, out_ch, w_dim, res)
        self.torgb = TToRGB(out_ch, img_pc, w_dim)
        self.toseg = TToRGB(out_ch, seg_pc, w_dim)
        self.num_conv = 1 if in_ch == 0 else 2

    def forward(self, x, img, seg, ws):
        i = 0
        if self.in_ch == 0:
            x = self.const.unsqueeze(0).expand(ws.shape[0], *self.const.shape)
        else:
            x = self.conv0(x, ws[:, 0])
            i = 1
        x = self.conv1(x, ws[:, i])
        w_shared = ws[:, i + 1]
        if img is not None and img.shape[-1] * 2 == x.shape[-1]:
            img = t_upsample2d(img)
        if seg is not None and seg.shape[-1] * 2 == x.shape[-1]:
            seg = t_upsample2d(seg)
        y = self.torgb(x, w_shared)
        img = y if img is None else img + y
        ys = self.toseg(x, w_shared)
        seg = ys if seg is None else seg + ys
        return x, img, seg


class TSynthBlock(nn.Module):
    """Reference SynthesisBlock, skip architecture (networks.py:718-858)."""

    def __init__(self, in_ch, out_ch, w_dim, res, img_ch, up=2):
        super().__init__()
        self.conv0 = TSynthesisLayer(in_ch, out_ch, w_dim, res, up=up)
        self.conv1 = TSynthesisLayer(out_ch, out_ch, w_dim, res)
        self.torgb = TToRGB(out_ch, img_ch, w_dim)
        self.up = up

    def forward(self, x, img, ws3):
        x = self.conv0(x, ws3[:, 0])
        x = self.conv1(x, ws3[:, 1])
        if img is not None and self.up > 1:
            img = t_upsample2d(img)
        y = self.torgb(x, ws3[:, 2])
        return x, (y if img is None else img + y)


class TMapping(nn.Module):
    """Reference MappingNetwork (networks.py:246-325)."""

    def __init__(self, z_dim, c_dim, w_dim, num_ws, num_layers=2):
        super().__init__()
        self.z_dim, self.c_dim, self.num_ws = z_dim, c_dim, num_ws
        if c_dim > 0:
            self.embed = TFC(c_dim, w_dim)
        feats = [z_dim + (w_dim if c_dim else 0)] + [w_dim] * num_layers
        for i in range(num_layers):
            setattr(self, f"fc{i}", TFC(feats[i], feats[i + 1], activation="lrelu", lr=0.01))
        self.register_buffer("w_avg", torch.zeros(w_dim))
        self.num_layers = num_layers

    @staticmethod
    def _norm(x):
        return x * (x.square().mean(dim=-1, keepdim=True) + 1e-8).rsqrt()

    def forward(self, z, c, psi=1.0, cutoff=None):
        x = self._norm(z)
        if self.c_dim > 0:
            x = torch.cat([x, self._norm(self.embed(c))], dim=1)
        for i in range(self.num_layers):
            x = getattr(self, f"fc{i}")(x)
        ws = x.unsqueeze(1).repeat(1, self.num_ws, 1)
        if psi != 1.0:
            if cutoff is None:
                ws = self.w_avg + (ws - self.w_avg) * psi
            else:
                ws[:, :cutoff] = self.w_avg + (ws[:, :cutoff] - self.w_avg) * psi
        return ws


# ------------------------------------------------------------ tiny fixture models

W_DIM, Z_DIM, C_DIM = 16, 8, 25
FCH, SCH = 8, 5  # feature / seg channels
VB = [(0, 12, 4), (12, 10, 8)]  # (in, out, res)
SR = [(FCH, 12, 8, 1), (12, 6, 16, 2)]  # (in, out, res, up)
NUM_WS = 3 + 2 * 2 + 1  # vb advance 3 + 2 per sr block + final torgb


class TinySynthesis(nn.Module):
    def __init__(self):
        super().__init__()
        for in_ch, out_ch, res in VB:
            setattr(self, f"vb{res}", TSegBlock(in_ch, out_ch, W_DIM, res, 3 * FCH, 3 * SCH))
        for in_ch, out_ch, res, up in SR:
            setattr(self, f"b{res}", TSynthBlock(in_ch, out_ch, W_DIM, res, 3, up=up))

    def planes(self, ws):
        x = img = seg = None
        w_idx = 0
        for _, _, res in VB:
            blk = getattr(self, f"vb{res}")
            x, img, seg = blk(x, img, seg, ws[:, w_idx : w_idx + blk.num_conv + 1])
            w_idx += blk.num_conv
        return img, seg

    def superres(self, feature, img_raw, ws):
        x, img = feature, img_raw
        w_idx = 3  # vb advance
        for _, _, res, _ in SR:
            blk = getattr(self, f"b{res}")
            x, img = blk(x, img, ws[:, w_idx : w_idx + 3])
            w_idx += 2
        return img


class TinyG(nn.Module):
    def __init__(self):
        super().__init__()
        self.mapping = TMapping(Z_DIM, C_DIM, W_DIM, NUM_WS)
        self.synthesis = TinySynthesis()


def _randomize(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k, v in sd.items():
        sd[k] = torch.randn(v.shape, generator=g) * 0.4
    module.load_state_dict(sd)


@pytest.fixture(scope="module")
def tiny_g():
    torch.manual_seed(0)
    m = TinyG()
    _randomize(m, 1)
    return m


@pytest.fixture(scope="module")
def imported_g(tiny_g):
    sd = {k: v.numpy() for k, v in tiny_g.state_dict().items()}
    return import_generator(sd, render_size=8, num_steps=4, dtype="float32")


# ----------------------------------------------------------------------- tests


def test_inferred_architecture(imported_g):
    G, params, report = imported_g
    cfg = G.cfg
    assert cfg.vb_ref_compat and cfg.raw_head == "slice"
    assert cfg.z_dim == Z_DIM and cfg.c_dim == C_DIM and cfg.w_dim == W_DIM
    assert cfg.feature_channels == FCH and cfg.seg_channels == SCH
    assert cfg.vb_resolutions_override == (4, 8)
    assert cfg.sr_resolutions_override == (8, 16)
    assert cfg.img_resolution == 16
    assert G.num_ws == NUM_WS
    assert G.synthesis.num_ws_geo == 4  # vb advance 3 + shared head row
    # every source tensor mapped; only the framework renderer stays initialized
    assert report.skipped_source == (), report.skipped_source
    assert all(m.startswith("synthesis.renderer") for m in report.missing_dest)


def test_mapping_parity(tiny_g, imported_g):
    G, params, _ = imported_g
    rng = np.random.RandomState(0)
    z = rng.randn(4, Z_DIM).astype(np.float32)
    c = rng.randn(4, C_DIM).astype(np.float32)
    want = tiny_g.mapping(torch.from_numpy(z), torch.from_numpy(c)).detach().numpy()
    got = np.asarray(G.mapping(params["mapping"], jnp.asarray(z), jnp.asarray(c)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
    # truncation toward the imported w_avg, with cutoff
    want_t = (
        tiny_g.mapping(torch.from_numpy(z), torch.from_numpy(c), psi=0.6, cutoff=3)
        .detach()
        .numpy()
    )
    got_t = np.asarray(
        G.mapping(
            params["mapping"], jnp.asarray(z), jnp.asarray(c),
            truncation_psi=0.6, truncation_cutoff=3,
        )
    )
    np.testing.assert_allclose(got_t, want_t, atol=1e-5, rtol=1e-5)


def test_plane_generation_parity(tiny_g, imported_g):
    G, params, _ = imported_g
    rng = np.random.RandomState(1)
    ws = rng.randn(2, NUM_WS, W_DIM).astype(np.float32)
    img_t, seg_t = tiny_g.synthesis.planes(torch.from_numpy(ws))
    img_j, seg_j = G.synthesis.generate_planes(
        params["synthesis"], jnp.asarray(ws), noise_mode="const"
    )
    np.testing.assert_allclose(np.asarray(img_j), to_nhwc(img_t), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(seg_j), to_nhwc(seg_t), atol=2e-4, rtol=2e-4)


def test_superres_parity(tiny_g, imported_g):
    G, params, _ = imported_g
    rng = np.random.RandomState(2)
    ws = rng.randn(2, NUM_WS, W_DIM).astype(np.float32)
    feat = rng.randn(2, 8, 8, FCH).astype(np.float32)
    img_raw = feat[..., :3]
    want = tiny_g.synthesis.superres(
        nchw(feat), nchw(img_raw), torch.from_numpy(ws)
    )
    got = G.synthesis.superresolve(
        params["synthesis"], jnp.asarray(feat), jnp.asarray(img_raw), jnp.asarray(ws),
        noise_mode="const",
    )
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want), atol=2e-4, rtol=2e-4)


def test_full_synthesis_runs(imported_g):
    """End-to-end: imported G renders 16^2 RGB + seg without shape errors."""
    from ide3d_tpu import render

    G, params, _ = imported_g
    z = jnp.zeros((1, Z_DIM))
    c = jnp.broadcast_to(jnp.asarray(render.CANONICAL_POSE_25), (1, 25))
    img, seg = jax.jit(
        lambda p, z, c: G(p, z, c, return_seg=True)
    )(params, z, c)
    assert img.shape == (1, 16, 16, 3)
    assert seg.shape == (1, 16, 16, SCH)
    assert np.isfinite(np.asarray(img)).all()


def test_renderer_decoder_auto_map(tiny_g):
    """The pickled renderer-decoder's names are unknown, but its tensor shapes
    pin it down: unambiguous shape matches must be recovered (with the
    equalized-lr rescale for plain-Linear-looking weights) and reported."""
    sd = {k: v.numpy() for k, v in tiny_g.state_dict().items()}
    rs = np.random.RandomState(0)
    dec = {
        "synthesis.renderer.net.0.weight": (rs.randn(64, FCH) * 0.05).astype(np.float32),
        "synthesis.renderer.net.0.bias": rs.randn(64).astype(np.float32),
        "synthesis.renderer.net.2.weight": (rs.randn(FCH + 1, 64) * 0.05).astype(np.float32),
        "synthesis.renderer.net.2.bias": rs.randn(FCH + 1).astype(np.float32),
    }
    sd.update(dec)
    G, params, report = import_generator(sd, render_size=8, num_steps=4, dtype="float32")
    assert len(report.auto_mapped) == 4, report.auto_mapped
    assert report.missing_dest == ()
    assert not any("renderer" in s for s in report.skipped_source)
    r = params["synthesis"]["renderer"]
    np.testing.assert_allclose(
        np.asarray(r["dec_w1"]),
        dec["synthesis.renderer.net.0.weight"].T * np.sqrt(FCH), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(r["dec_b1"]),
                               dec["synthesis.renderer.net.0.bias"], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(r["dec_w2"]),
        dec["synthesis.renderer.net.2.weight"].T * np.sqrt(64), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(r["dec_b2"]),
                               dec["synthesis.renderer.net.2.bias"], rtol=1e-6)


def test_renderer_auto_map_ambiguity_safe(tiny_g):
    """Two same-shaped unmapped candidates -> NEITHER is applied; the leaf
    stays initialized and both names stay in skipped_source."""
    sd = {k: v.numpy() for k, v in tiny_g.state_dict().items()}
    rs = np.random.RandomState(1)
    sd["synthesis.renderer.a"] = rs.randn(64).astype(np.float32)
    sd["synthesis.renderer.b"] = rs.randn(64).astype(np.float32)
    G, params, report = import_generator(sd, render_size=8, num_steps=4, dtype="float32")
    assert "synthesis.renderer.dec_b1" in report.missing_dest
    assert "synthesis.renderer.a" in report.skipped_source
    assert "synthesis.renderer.b" in report.skipped_source


# ------------------------------------------------------------- discriminator side


class TConv2dLayer(nn.Module):
    """Reference Conv2dLayer (networks.py:169-226)."""

    def __init__(self, in_ch, out_ch, k, activation="linear", down=1, bias=True):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(out_ch, in_ch, k, k))
        if bias:
            self.bias = nn.Parameter(torch.zeros(out_ch))
        else:
            self.bias = None
        self.in_ch, self.k, self.act, self.down = in_ch, k, activation, down

    def forward(self, x, gain=1.0):
        w = self.weight * (1.0 / math.sqrt(self.in_ch * self.k**2))
        out = torch_conv2d_resample_oracle(
            x, w, FILTER if self.down > 1 else None, 1, self.down, self.k // 2, True
        )
        b = self.bias
        g = (math.sqrt(2.0) if self.act == "lrelu" else 1.0) * gain
        if b is not None:
            out = out + b.reshape(1, -1, 1, 1)
        if self.act == "lrelu":
            out = F.leaky_relu(out, 0.2)
        out = out * g
        return out.clamp(-256.0 * gain, 256.0 * gain)


class TDBlock(nn.Module):
    """Reference DiscriminatorBlock, resnet architecture (networks.py:1271-1358)."""

    def __init__(self, in_ch, tmp_ch, out_ch, img_ch, first):
        super().__init__()
        if first:
            self.fromrgb = TConv2dLayer(img_ch, tmp_ch, 1, activation="lrelu")
        self.conv0 = TConv2dLayer(tmp_ch, tmp_ch, 3, activation="lrelu")
        self.conv1 = TConv2dLayer(tmp_ch, out_ch, 3, activation="lrelu", down=2)
        self.skip = TConv2dLayer(tmp_ch, out_ch, 1, down=2, bias=False)
        self.first = first

    def forward(self, x, img):
        if self.first:
            x = self.fromrgb(img)
        y = self.skip(x, gain=math.sqrt(0.5))
        x = self.conv0(x)
        x = self.conv1(x, gain=math.sqrt(0.5))
        return y + x


def t_mbstd(x, group_size=4, num_ch=1):
    """Reference MinibatchStdLayer (networks.py:1360-1385)."""
    N, C, H, W = x.shape
    G = min(group_size, N)
    Fc = num_ch
    c = C // Fc
    y = x.reshape(G, -1, Fc, c, H, W)
    y = y - y.mean(dim=0)
    y = y.square().mean(dim=0)
    y = (y + 1e-8).sqrt()
    y = y.mean(dim=[2, 3, 4])
    y = y.reshape(-1, Fc, 1, 1)
    y = y.repeat(G, 1, H, W)
    return torch.cat([x, y], dim=1)


class TinyD(nn.Module):
    """Reference Discriminator (networks.py:1446-1502): b16, b8 + b4 epilogue,
    conditioning mapping."""

    IMG_CH = 4
    # follows the reference schedule min(channel_base//res, channel_max)
    # with channel_base=96, channel_max=12 (networks.py:1467)
    CH = {16: 6, 8: 12, 4: 12}
    CMAP = 12

    def __init__(self):
        super().__init__()
        self.b16 = TDBlock(0, self.CH[16], self.CH[8], self.IMG_CH, first=True)
        self.b8 = TDBlock(self.CH[8], self.CH[8], self.CH[4], self.IMG_CH, first=False)
        self.mapping = TMapping(0, C_DIM, self.CMAP, 1)
        b4 = nn.Module()
        b4.conv = TConv2dLayer(self.CH[4] + 1, self.CH[4], 3, activation="lrelu")
        b4.fc = TFC(self.CH[4] * 16, self.CH[4], activation="lrelu")
        b4.out = TFC(self.CH[4], self.CMAP)
        self.b4 = b4

    def forward(self, img, c):
        x = self.b16(None, img)
        x = self.b8(x, None)
        cmap = self.mapping(torch.zeros(img.shape[0], 0), c)[:, 0]
        x = t_mbstd(x)
        x = self.b4.conv(x)
        x = self.b4.fc(x.flatten(1))
        x = self.b4.out(x)
        return (x * cmap).sum(dim=1, keepdim=True) * (1.0 / math.sqrt(self.CMAP))


class TMappingD(TMapping):
    pass


def test_discriminator_import_parity():
    torch.manual_seed(3)
    # D's conditioning mapping has no z input and no w_avg (networks.py:1487)
    tiny_d = TinyD()
    _randomize(tiny_d, 5)
    sd = {
        k: v.numpy()
        for k, v in tiny_d.state_dict().items()
        if k != "mapping.w_avg"
    }
    D, params, report = import_discriminator(sd, dtype="float32")
    assert D.cfg.img_resolution == 16
    assert D.cfg.img_channels == TinyD.IMG_CH
    assert D.cfg.c_dim == C_DIM and D.cmap_dim == TinyD.CMAP
    assert report.skipped_source == (), report.skipped_source

    rng = np.random.RandomState(4)
    img = rng.randn(4, 16, 16, TinyD.IMG_CH).astype(np.float32)
    c = rng.randn(4, C_DIM).astype(np.float32)

    # Stage-wise parity (the final conditioned logit is a near-cancelling dot
    # product ~1e-4, so it is compared with an absolute tolerance at the end).
    x_t = tiny_d.b8(tiny_d.b16(None, nchw(img)), None)
    cmap_t = tiny_d.mapping(torch.zeros(4, 0), torch.from_numpy(c))[:, 0]
    xo_t = tiny_d.b4.out(tiny_d.b4.fc(tiny_d.b4.conv(t_mbstd(x_t)).flatten(1)))

    x_j = D._block(8)(params["b8"], D._block(16)(params["b16"], None, jnp.asarray(img)), None)
    np.testing.assert_allclose(np.asarray(x_j), to_nhwc(x_t), atol=3e-3, rtol=3e-3)
    # the importer must adopt the checkpoint's mapping DEPTH (2 fc layers here);
    # leftover random-init framework layers would shrink cmap by orders of
    # magnitude (lr=0.01 contraction), so compare RELATIVELY with a tiny atol
    assert D.cfg.mapping_num_layers == 2
    mp = dict(params["mapping"])
    mp.setdefault("w_avg", jnp.zeros((D.cmap_dim,), jnp.float32))
    cmap_j = D._mapping()(mp, None, jnp.asarray(c), broadcast=False)
    scale = np.abs(cmap_t.numpy()).mean()
    np.testing.assert_allclose(np.asarray(cmap_j), cmap_t.numpy(),
                               rtol=2e-2, atol=2e-2 * scale)

    from ide3d_tpu.models.discriminator import minibatch_stddev

    epi = D._epilogue()
    conv, fc, out = epi._layers()
    xm_j = minibatch_stddev(x_j.astype(jnp.float32), 4, 1)
    xo_j = out(
        params["b4"]["out"],
        fc(params["b4"]["fc"], conv(params["b4"]["conv"], xm_j).reshape(4, -1)),
    )
    np.testing.assert_allclose(np.asarray(xo_j), xo_t.numpy(), atol=3e-3, rtol=3e-3)

    want = tiny_d(nchw(img), torch.from_numpy(c)).detach().numpy()
    got = np.asarray(D(params, jnp.asarray(img), jnp.asarray(c)))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_minibatch_stddev_oracle_batch_gt_group():
    """mbstd parity vs the reference at N > group_size (round-3 VERDICT Weak #1).

    Groups are STRIDED (s ≡ b mod n) and the scatter-back must be a TILE
    (out[s] = y[s mod n], inversion/networks.py:1378-1379) — a jnp.repeat
    scatter-back hands every sample the wrong group's statistic once
    N > group_size, which N=4-only parity tests cannot see."""
    from ide3d_tpu.models.discriminator import minibatch_stddev

    for N in (8, 16):
        rng = np.random.RandomState(100 + N)
        x = rng.randn(N, 5, 5, 6).astype(np.float32)
        want = t_mbstd(nchw(x), group_size=4, num_ch=2)
        got = np.asarray(minibatch_stddev(jnp.asarray(x), 4, 2))
        np.testing.assert_allclose(got, to_nhwc(want), rtol=1e-5, atol=1e-6)
        # the statistic must differ across strided groups on random input —
        # guards against a scatter-back that accidentally averages groups
        stat = got[..., 0, 0, 6:]
        n = N // 4
        assert not np.allclose(stat[0], stat[1])
        np.testing.assert_allclose(stat[0], stat[n], rtol=1e-6)


# ------------------------------------------------------------------ encoder side


class TEncResBlock(nn.Module):
    """Reference EncoderResBlock (networks.py:1508-1521)."""

    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.conv1 = TConv2dLayer(in_ch, in_ch, 3, activation="lrelu")
        self.conv2 = TConv2dLayer(in_ch, out_ch, 3, activation="lrelu", down=2)
        self.skip = TConv2dLayer(in_ch, out_ch, 1, down=2, bias=False)

    def forward(self, x):
        out = self.conv2(self.conv1(x))
        return (out + self.skip(x)) / math.sqrt(2.0)


class TinyHybridEncoder(nn.Module):
    """Reference HybridEncoder (networks.py:1605-1665) at size 16.

    NOTE: reference channel schedule at 16 is 512-wide; the fixture narrows it by
    monkeypatching the framework schedule in the test to keep CPU time trivial.
    """

    def __init__(self, channels, n_app, n_geo, w_dim):
        super().__init__()
        size = 16
        log_size = int(math.log2(size))
        for stream, in_dim, n_lat in (("img", 3, n_app), ("seg", SCH, n_geo)):
            convs = [TConv2dLayer(in_dim, channels[size], 1)]
            in_ch = channels[size]
            for i in range(log_size, 2, -1):
                out_ch = channels[2 ** (i - 1)]
                convs.append(TEncResBlock(in_ch, out_ch))
                in_ch = out_ch
            setattr(self, f"convs_{stream}", nn.Sequential(*convs))
            proj = nn.Module()
            proj.weight = nn.Parameter(torch.randn(n_lat * w_dim, in_ch, 4, 4))
            setattr(self, f"projector_{stream}", proj)
            setattr(self, f"_scale_{stream}", 1.0 / math.sqrt(in_ch * 16))

    def forward(self, img, seg):
        outs = {}
        for stream, x in (("img", img), ("seg", seg)):
            h = getattr(self, f"convs_{stream}")(x)
            w = getattr(self, f"projector_{stream}").weight
            h = F.conv2d(h, w * getattr(self, f"_scale_{stream}"))
            outs[stream] = h.reshape(x.shape[0], -1, W_DIM)
        return torch.cat([outs["seg"], outs["img"]], dim=1)


def test_hybrid_encoder_import_parity(monkeypatch):
    import ide3d_tpu.models.encoder as enc_mod

    channels = {16: 8, 8: 10, 4: 12}
    monkeypatch.setattr(enc_mod, "_CHANNELS", channels)

    torch.manual_seed(6)
    tiny_e = TinyHybridEncoder(channels, n_app=3, n_geo=2, w_dim=W_DIM)
    _randomize(tiny_e, 7)
    sd = {k: v.numpy() for k, v in tiny_e.state_dict().items()}
    E, params, report = import_encoder(sd, w_dim=W_DIM)
    assert E.size == 16 and E.n_latents_app == 3 and E.n_latents_geo == 2
    assert report.skipped_source == (), report.skipped_source

    rng = np.random.RandomState(8)
    img = rng.randn(2, 16, 16, 3).astype(np.float32)
    seg = rng.randn(2, 16, 16, SCH).astype(np.float32)
    want = tiny_e(nchw(img), nchw(seg)).detach().numpy()
    got = np.asarray(E(params, jnp.asarray(img), jnp.asarray(seg)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


# --------------------------------------------------------- pkl payload walking


def test_pickle_payload_walker_live_modules(tiny_g):
    sds = pickle_payload_to_state_dicts({"G": tiny_g, "meta": 3})
    assert set(sds) == {"G"}
    want = {k: v.numpy() for k, v in tiny_g.state_dict().items()}
    assert set(sds["G"]) == set(want)
    for k in want:
        np.testing.assert_array_equal(sds["G"][k], want[k])


def test_pickle_payload_walker_stubbed_classes(tmp_path, tiny_g):
    """Simulate a reference source-embedding pkl: the module classes are not
    importable at load time, so the stub unpickler kicks in; the tensor payload
    must still round-trip."""
    import types

    fake = types.ModuleType("fake_pickled_networks")
    names = {}
    for cls in (TinyG, TinySynthesis, TSegBlock, TSynthBlock, TSynthesisLayer,
                TToRGB, TFC, TMapping):
        setattr(fake, cls.__name__, cls)
        names[cls] = cls.__module__
        cls.__module__ = "fake_pickled_networks"
    sys.modules["fake_pickled_networks"] = fake
    try:
        path = tmp_path / "net.pkl"
        with open(path, "wb") as f:
            pickle.dump({"G_ema": tiny_g}, f)
    finally:
        del sys.modules["fake_pickled_networks"]
        for cls, mod in names.items():
            cls.__module__ = mod

    payload = load_pickle_tensors(str(path))
    sds = pickle_payload_to_state_dicts(payload)
    assert "G_ema" in sds
    want = {k: v.numpy() for k, v in tiny_g.state_dict().items()}
    assert set(sds["G_ema"]) == set(want)
    for k in want:
        np.testing.assert_array_equal(sds["G_ema"][k], want[k])
    # and the walked payload imports end-to-end
    G, params, report = import_generator(sds["G_ema"], render_size=8, num_steps=4,
                                         dtype="float32")
    assert report.skipped_source == ()


def test_import_generator_extra_map(tiny_g):
    """extra_map routes tensors with unknown names (e.g. a real checkpoint's
    renderer decoder) into explicit destinations with layout conversion."""
    sd = {k: v.numpy() for k, v in tiny_g.state_dict().items()}
    G0, params0, _ = import_generator(sd, render_size=8, num_steps=4, dtype="float32")
    dec = np.asarray(params0["synthesis"]["renderer"]["dec_w1"])
    custom = np.random.RandomState(0).randn(*dec.shape[::-1]).astype(np.float32)
    sd2 = dict(sd)
    sd2["synthesis.renderer.mlp.0.weight"] = custom  # torch [out, in]
    G, params, report = import_generator(
        sd2, render_size=8, num_steps=4, dtype="float32",
        extra_map={"synthesis.renderer.mlp.0.weight": ("synthesis", "renderer", "dec_w1")},
    )
    np.testing.assert_array_equal(np.asarray(params["synthesis"]["renderer"]["dec_w1"]),
                                  custom.T)
    assert "synthesis.renderer.mlp.0.weight" not in report.skipped_source


def test_load_network_pkl_end_to_end(tmp_path, tiny_g, monkeypatch):
    """legacy.load_network_pkl semantics: one .pkl with G_ema + D + E -> all
    three imported frameworks, via the stub unpickler (classes unavailable)."""
    import types

    import ide3d_tpu.models.encoder as enc_mod
    from ide3d_tpu.io.torch_import import load_network_pkl

    # the fixture encoder is built on a narrowed channel schedule (real
    # checkpoints follow the reference _CHANNELS table, networks.py:1564-1574)
    channels = {16: 8, 8: 10, 4: 12}
    monkeypatch.setattr(enc_mod, "_CHANNELS", channels)

    torch.manual_seed(9)
    tiny_d = TinyD()
    _randomize(tiny_d, 10)
    tiny_e = TinyHybridEncoder(channels, n_app=3, n_geo=2, w_dim=W_DIM)
    _randomize(tiny_e, 11)

    classes = (TinyG, TinySynthesis, TSegBlock, TSynthBlock, TSynthesisLayer,
               TToRGB, TFC, TMapping, TinyD, TDBlock, TConv2dLayer,
               TinyHybridEncoder, TEncResBlock)
    fake = types.ModuleType("fake_pickled_networks2")
    orig = {}
    for cls in classes:
        setattr(fake, cls.__name__, cls)
        orig[cls] = cls.__module__
        cls.__module__ = "fake_pickled_networks2"
    sys.modules["fake_pickled_networks2"] = fake
    try:
        path = tmp_path / "net.pkl"
        with open(path, "wb") as f:
            pickle.dump({"G_ema": tiny_g, "D": tiny_d, "E": tiny_e,
                         "training_set_kwargs": {"path": "x"}}, f)
    finally:
        del sys.modules["fake_pickled_networks2"]
        for cls, mod in orig.items():
            cls.__module__ = mod

    out = load_network_pkl(str(path), render_size=8, num_steps=4, dtype="float32")
    assert set(out) >= {"G_ema", "D"}
    G, gp, grep = out["G_ema"]
    assert not isinstance(G, Exception) and grep.skipped_source == ()
    D, dp, drep = out["D"]
    # fixture D lacks mapping.w_avg only (not saved by reference either)
    assert drep.skipped_source == () or drep.skipped_source == ("mapping.w_avg",)
    E, ep, erep = out["E"]
    assert erep.skipped_source == ()
    # imported nets run
    img = jax.jit(lambda p, z, c: G(p, z, c))(gp, jnp.zeros((1, Z_DIM)),
                                              jnp.zeros((1, C_DIM)))
    assert np.isfinite(np.asarray(img)).all()
