"""e4e / pSp first-stage encoder: import round-trip + FULL-forward torch parity.

Oracle: an in-test torch replica of the reference encoder execution
(inversion/models/e4e/encoders/psp_encoders.py + helpers.py + EqualLinear from
stylegan2/model.py:129-158), loaded with strict=True so the param naming
contract is validated too. stylegan_size=32 (8 style heads: 3 coarse + 4
middle + 1 fine) exercises every FPN level at 1/5 the flagship head count.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
torch.set_grad_enabled(False)
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from test_cnn_import import assert_roundtrip, make_torch_sd, nchw  # noqa: E402

from ide3d_tpu.models.e4e import (  # noqa: E402
    E4eEncoder,
    import_e4e,
    pivot_from_image,
)

# ------------------------------------------------------------- torch oracle


class _SEModule(nn.Module):
    def __init__(self, c, r):
        super().__init__()
        self.fc1 = nn.Conv2d(c, c // r, 1, bias=False)
        self.fc2 = nn.Conv2d(c // r, c, 1, bias=False)

    def forward(self, x):
        s = x.mean(dim=(2, 3), keepdim=True)
        s = torch.sigmoid(self.fc2(F.relu(self.fc1(s))))
        return x * s


class _BottleneckIRSE(nn.Module):
    def __init__(self, in_c, depth, stride):
        super().__init__()
        if in_c == depth:
            self.shortcut_layer = nn.MaxPool2d(1, stride)
        else:
            self.shortcut_layer = nn.Sequential(
                nn.Conv2d(in_c, depth, 1, stride, bias=False), nn.BatchNorm2d(depth))
        self.res_layer = nn.Sequential(
            nn.BatchNorm2d(in_c),
            nn.Conv2d(in_c, depth, 3, 1, 1, bias=False), nn.PReLU(depth),
            nn.Conv2d(depth, depth, 3, stride, 1, bias=False), nn.BatchNorm2d(depth),
            _SEModule(depth, 16))

    def forward(self, x):
        return self.res_layer(x) + self.shortcut_layer(x)


class _EqualLinear(nn.Module):
    def __init__(self, in_dim, out_dim):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(out_dim, in_dim))
        self.bias = nn.Parameter(torch.zeros(out_dim))

    def forward(self, x):
        return F.linear(x, self.weight * (1.0 / math.sqrt(self.weight.shape[1])),
                        self.bias)


class _StyleBlock(nn.Module):
    def __init__(self, in_c, out_c, spatial):
        super().__init__()
        num_pools = int(np.log2(spatial))
        mods = [nn.Conv2d(in_c, out_c, 3, 2, 1), nn.LeakyReLU()]
        for _ in range(num_pools - 1):
            mods += [nn.Conv2d(out_c, out_c, 3, 2, 1), nn.LeakyReLU()]
        self.convs = nn.Sequential(*mods)
        self.linear = _EqualLinear(out_c, out_c)

    def forward(self, x):
        return self.linear(self.convs(x).flatten(1))


def _ir_blocks_50():
    cfg = [(64, 64, 3), (64, 128, 4), (128, 256, 14), (256, 512, 3)]
    out = []
    for in_c, depth, n in cfg:
        out.append((in_c, depth, 2))
        out += [(depth, depth, 1)] * (n - 1)
    return out


class _TorchE4e(nn.Module):
    """Reference Encoder4Editing at Inference stage (psp_encoders.py:126-202);
    forward_gradual() runs the GradualStyleEncoder variant (:58-123)."""

    def __init__(self, stylegan_size):
        super().__init__()
        self.input_layer = nn.Sequential(
            nn.Conv2d(3, 64, 3, 1, 1, bias=False), nn.BatchNorm2d(64), nn.PReLU(64))
        self.body = nn.Sequential(
            *[_BottleneckIRSE(*b) for b in _ir_blocks_50()])
        self.style_count = 2 * int(math.log2(stylegan_size)) - 2
        self.coarse_ind, self.middle_ind = 3, 7
        self.styles = nn.ModuleList(
            [_StyleBlock(512, 512, 16 if i < 3 else (32 if i < 7 else 64))
             for i in range(self.style_count)])
        self.latlayer1 = nn.Conv2d(256, 512, 1)
        self.latlayer2 = nn.Conv2d(128, 512, 1)

    def _taps(self, x):
        x = self.input_layer(x)
        for i, m in enumerate(self.body):
            x = m(x)
            if i == 6:
                c1 = x
            elif i == 20:
                c2 = x
            elif i == 23:
                c3 = x
        return c1, c2, c3

    @staticmethod
    def _up_add(x, y):
        return F.interpolate(x, size=y.shape[2:], mode="bilinear",
                             align_corners=True) + y

    def forward(self, x):
        c1, c2, c3 = self._taps(x)
        w0 = self.styles[0](c3)
        w = w0.unsqueeze(1).repeat(1, self.style_count, 1)
        feat, p2 = c3, None
        rows = [w[:, 0]]
        for i in range(1, self.style_count):
            if i == self.coarse_ind:
                p2 = self._up_add(c3, self.latlayer1(c2))
                feat = p2
            elif i == self.middle_ind:
                feat = self._up_add(p2, self.latlayer2(c1))
            rows.append(w[:, i] + self.styles[i](feat))
        return torch.stack(rows, dim=1)

    def forward_gradual(self, x):
        c1, c2, c3 = self._taps(x)
        lat = [self.styles[j](c3) for j in range(self.coarse_ind)]
        p2 = self._up_add(c3, self.latlayer1(c2))
        lat += [self.styles[j](p2) for j in range(self.coarse_ind, self.middle_ind)]
        p1 = self._up_add(p2, self.latlayer2(c1))
        lat += [self.styles[j](p1) for j in range(self.middle_ind, self.style_count)]
        return torch.stack(lat, dim=1)


# -------------------------------------------------------------------- tests


def _fixture(seed=11):
    model = E4eEncoder(stylegan_size=32)
    tree0 = model.init()
    sd, want = make_torch_sd(tree0, seed=seed)
    # make_torch_sd's 0.2-std weights explode through 24 residual blocks;
    # shrink convs/linears to keep the full forward in a comparable range.
    for k in list(sd):
        if k.endswith("weight") and sd[k].ndim in (2, 4):
            sd[k] = sd[k] * 0.25
            want[k] = want[k] * 0.25
    params = assert_roundtrip(tree0, sd, want)
    oracle = _TorchE4e(32).eval()
    missing, unexpected = oracle.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=False)
    assert not unexpected, unexpected
    assert all(m.endswith("num_batches_tracked") for m in missing), missing
    return model, params, sd, oracle


MODEL, PARAMS, SD, ORACLE = None, None, None, None


def _get_fixture():
    global MODEL, PARAMS, SD, ORACLE
    if MODEL is None:
        MODEL, PARAMS, SD, ORACLE = _fixture()
    return MODEL, PARAMS, SD, ORACLE


def test_e4e_full_forward_parity():
    model, params, sd, oracle = _get_fixture()
    x = np.random.RandomState(3).randn(1, 256, 256, 3).astype(np.float32)
    want = oracle(nchw(x)).numpy()
    got = np.asarray(jax.jit(model.__call__)(params, jnp.asarray(x)))
    assert got.shape == (1, 8, 512)
    assert np.isfinite(got).all() and np.isfinite(want).all()
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_gradual_variant_parity():
    model, params, sd, oracle = _get_fixture()
    gradual = E4eEncoder(stylegan_size=32, variant="gradual")
    x = np.random.RandomState(4).randn(1, 256, 256, 3).astype(np.float32)
    want = oracle.forward_gradual(nchw(x)).numpy()
    got = np.asarray(gradual(params, jnp.asarray(x)))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_import_e4e_psp_checkpoint_namespace():
    model, params, sd, oracle = _get_fixture()
    latent_avg = np.random.RandomState(5).randn(512).astype(np.float32)
    ckpt_sd = {f"encoder.{k}": v for k, v in sd.items()}
    ckpt_sd["latent_avg"] = latent_avg
    m2, p2, avg, report = import_e4e(ckpt_sd)
    assert m2.stylegan_size == 32 and m2.style_count == 8
    assert report.style_count == 8 and report.has_latent_avg
    x = jnp.asarray(np.random.RandomState(6).randn(1, 256, 256, 3).astype(np.float32))
    # param trees are bit-identical; outputs only fp-close (XLA:CPU conv
    # thread partitioning is run-to-run nondeterministic at ~1e-6)
    np.testing.assert_allclose(np.asarray(model(params, x)),
                               np.asarray(m2(p2, x)), atol=1e-4)
    # pSp pivot contract: codes + latent_avg broadcast over rows (psp.py:62-68)
    piv = pivot_from_image(m2, p2, jnp.asarray(avg), x)
    base = m2(p2, x)
    np.testing.assert_allclose(np.asarray(piv), np.asarray(base) + latent_avg[None, None, :],
                               atol=1e-6)
