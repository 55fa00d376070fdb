"""Unit tests for the ops layer against independent oracles.

Mirrors the reference's dual-implementation pattern (every CUDA op had an
`impl='ref'` torch path, torch_utils/ops/*.py): here every TPU op is checked against
either a torch CPU oracle or a hand-written numpy oracle over a grid of shapes,
scale factors and filters.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from ide3d_tpu import ops


def nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(np.transpose(x_nhwc, (0, 3, 1, 2))))


def to_nhwc(x_nchw: torch.Tensor) -> np.ndarray:
    return np.transpose(x_nchw.numpy(), (0, 2, 3, 1))


# ---------------------------------------------------------------------------- bias_act


@pytest.mark.parametrize("act", list(ops.activation_funcs.keys()))
def test_bias_act_matches_torch(rng, act):
    x = rng.randn(2, 5, 7, 8).astype(np.float32)
    b = rng.randn(8).astype(np.float32)
    got = np.asarray(ops.bias_act(jnp.asarray(x), jnp.asarray(b), act=act, clamp=0.5))

    tx = torch.from_numpy(x) + torch.from_numpy(b)
    funcs = {
        "linear": lambda t: t,
        "relu": lambda t: F.relu(t),
        "lrelu": lambda t: F.leaky_relu(t, 0.2),
        "tanh": torch.tanh,
        "sigmoid": torch.sigmoid,
        "elu": F.elu,
        "selu": F.selu,
        "softplus": F.softplus,
        "swish": lambda t: torch.sigmoid(t) * t,
    }
    gains = {"relu": np.sqrt(2), "lrelu": np.sqrt(2), "swish": np.sqrt(2)}
    want = funcs[act](tx) * gains.get(act, 1.0)
    want = want.clamp(-0.5, 0.5).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_bias_act_default_no_clamp(rng):
    x = rng.randn(3, 16).astype(np.float32)
    got = np.asarray(ops.bias_act(jnp.asarray(x), act="lrelu"))
    want = F.leaky_relu(torch.from_numpy(x), 0.2).numpy() * np.sqrt(2)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


# -------------------------------------------------------------------------- upfirdn2d


def upfirdn2d_oracle(x, f, up, down, padding, flip_filter, gain):
    """Numpy oracle implementing the documented contract
    (torch_utils/ops/upfirdn2d.py:118-166) from scratch: zero-insert, pad/crop,
    convolve, decimate. x is NCHW numpy."""
    if f is None:
        f = np.ones((1, 1), dtype=np.float32)
    f = np.asarray(f, dtype=np.float32)
    if f.ndim == 1:
        f = np.outer(f, f)
    upx = upy = up
    downx = downy = down
    px0, px1, py0, py1 = padding

    n, c, h, w = x.shape
    # Zero-insertion upsample.
    z = np.zeros((n, c, h * upy, w * upx), dtype=x.dtype)
    z[:, :, ::upy, ::upx] = x
    # Pad / crop.
    z = np.pad(
        z,
        ((0, 0), (0, 0), (max(py0, 0), max(py1, 0)), (max(px0, 0), max(px1, 0))),
    )
    z = z[
        :,
        :,
        max(-py0, 0) : z.shape[2] - max(-py1, 0),
        max(-px0, 0) : z.shape[3] - max(-px1, 0),
    ]
    # Convolve (true convolution unless flip_filter).
    fk = f * (gain ** (f.ndim / 2))
    if not flip_filter:
        fk = fk[::-1, ::-1]
    fh, fw = fk.shape
    oh = z.shape[2] - fh + 1
    ow = z.shape[3] - fw + 1
    out = np.zeros((n, c, oh, ow), dtype=np.float32)
    for i in range(fh):
        for j in range(fw):
            out += fk[i, j] * z[:, :, i : i + oh, j : j + ow]
    return out[:, :, ::downy, ::downx]


@pytest.mark.parametrize("up,down", [(1, 1), (2, 1), (1, 2), (2, 2), (4, 1)])
@pytest.mark.parametrize(
    "f", [None, [1, 3, 3, 1], [[1.0, 2.0], [2.0, 4.0]], list(range(1, 9))]
)
@pytest.mark.parametrize("padding", [(0, 0, 0, 0), (2, 1, 1, 2), (-1, 2, 2, -1)])
def test_upfirdn2d_matches_oracle(rng, up, down, f, padding):
    x = rng.randn(2, 11, 13, 3).astype(np.float32)
    fker = None if f is None else ops.setup_filter(f)
    got = np.asarray(
        ops.upfirdn2d(jnp.asarray(x), fker, up=up, down=down, padding=padding, gain=1.5)
    )
    want = upfirdn2d_oracle(
        np.transpose(x, (0, 3, 1, 2)), fker, up, down, padding, False, 1.5
    )
    np.testing.assert_allclose(got, np.transpose(want, (0, 2, 3, 1)), atol=1e-4, rtol=1e-4)


def test_setup_filter_normalizes():
    f = ops.setup_filter([1, 3, 3, 1])
    assert f.shape == (4, 4)
    np.testing.assert_allclose(f.sum(), 1.0, atol=1e-6)
    f_sep = ops.setup_filter(list(range(1, 9)))
    assert f_sep.ndim == 1
    np.testing.assert_allclose(f_sep.sum(), 1.0, atol=1e-6)


def test_upsample_downsample_roundtrip_shapes(rng):
    x = rng.randn(1, 8, 8, 4).astype(np.float32)
    f = ops.setup_filter([1, 3, 3, 1])
    up = ops.upsample2d(jnp.asarray(x), f)
    assert up.shape == (1, 16, 16, 4)
    down = ops.downsample2d(up, f)
    assert down.shape == (1, 8, 8, 4)
    # DC preservation: constant input stays constant (away from borders).
    const = jnp.ones((1, 16, 16, 2))
    y = np.asarray(ops.upsample2d(const, f))
    np.testing.assert_allclose(y[:, 4:-4, 4:-4, :], 1.0, atol=1e-4)


def test_filter2d_same_shape(rng):
    x = rng.randn(2, 9, 9, 3).astype(np.float32)
    f = ops.setup_filter([1, 2, 1])
    y = ops.filter2d(jnp.asarray(x), f)
    assert y.shape == x.shape


# -------------------------------------------------------------------- conv2d_resample


def torch_conv2d_resample_oracle(x, w, f, up, down, padding, flip_weight):
    """Oracle built on torch primitives following the documented algorithm
    (torch_utils/ops/conv2d_resample.py:46): upfirdn(up) -> conv -> upfirdn(down),
    with the same padding adjustment."""
    fw, fh = (f.shape[-1], f.shape[0]) if f is not None else (1, 1)
    px0 = px1 = py0 = py1 = padding
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2
    xi = x.numpy()
    xi = upfirdn2d_oracle(
        xi, f if up > 1 else None, up, 1, (px0, px1, py0, py1), False, up**2
    )
    wt = w if flip_weight else torch.flip(w, [2, 3])
    out = F.conv2d(torch.from_numpy(xi), wt)
    if down > 1:
        out = torch.from_numpy(
            upfirdn2d_oracle(out.numpy(), f, 1, down, (0, 0, 0, 0), False, 1)
        )
    return out


@pytest.mark.parametrize("up,down,k", [(1, 1, 3), (1, 1, 1), (2, 1, 3), (1, 2, 3), (2, 1, 1)])
@pytest.mark.parametrize("flip_weight", [True, False])
def test_conv2d_resample_matches_oracle(rng, up, down, k, flip_weight):
    x = rng.randn(2, 8, 8, 5).astype(np.float32)
    w_oihw = rng.randn(6, 5, k, k).astype(np.float32)
    f = ops.setup_filter([1, 3, 3, 1])
    pad = k // 2

    got = np.asarray(
        ops.conv2d_resample(
            jnp.asarray(x),
            jnp.asarray(np.transpose(w_oihw, (2, 3, 1, 0))),  # OIHW -> HWIO
            f=f,
            up=up,
            down=down,
            padding=pad,
            flip_weight=flip_weight,
        )
    )
    want = torch_conv2d_resample_oracle(
        nchw(x), torch.from_numpy(w_oihw), f, up, down, pad, flip_weight
    )
    np.testing.assert_allclose(got, to_nhwc(want), atol=2e-3, rtol=2e-3)


# ------------------------------------------------------------------- modulated_conv2d


def torch_modulated_conv2d_oracle(x, weight, styles, demodulate, up, padding, f):
    """Per-sample-weight oracle (the reference 'fused' path, inversion/networks.py:90-130):
    materialise modulated weights and run per-sample convs. Our op must match exactly
    (it is the algebraically-identical input/output-scaled form)."""
    B = x.shape[0]
    w = weight[None] * styles[:, None, :, None, None]  # [B, O, I, kh, kw]
    if demodulate:
        d = torch.rsqrt(w.square().sum(dim=[2, 3, 4]) + 1e-8)  # [B, O]
        w = w * d[:, :, None, None, None]
    outs = []
    for b in range(B):
        xi = x[b : b + 1]
        if up > 1:
            xi_np = upfirdn2d_oracle(xi.numpy(), None, up, 1, (0, 0, 0, 0), False, 1.0)
            # pad w.r.t. upsampled image with filter margins like conv2d_resample
            fw, fh = f.shape[-1], f.shape[0]
            px0 = padding + (fw + up - 1) // 2
            px1 = padding + (fw - up) // 2
            xi_np = upfirdn2d_oracle(
                xi.numpy(), f, up, 1, (px0, px1, px0, px1), False, up**2
            )
            xi = torch.from_numpy(xi_np)
            outs.append(F.conv2d(xi, w[b]))
        else:
            outs.append(F.conv2d(xi, w[b], padding=padding))
    return torch.cat(outs, 0)


@pytest.mark.parametrize("demodulate", [True, False])
@pytest.mark.parametrize("up", [1, 2])
def test_modulated_conv2d_matches_reference_math(rng, demodulate, up):
    B, H, W, I, O, k = 3, 8, 8, 6, 10, 3
    x = rng.randn(B, H, W, I).astype(np.float32)
    w_oihw = rng.randn(O, I, k, k).astype(np.float32) * 0.3
    styles = (rng.randn(B, I).astype(np.float32) * 0.5 + 1.0).astype(np.float32)
    f = ops.setup_filter([1, 3, 3, 1])

    got = np.asarray(
        ops.modulated_conv2d(
            jnp.asarray(x),
            jnp.asarray(np.transpose(w_oihw, (2, 3, 1, 0))),
            jnp.asarray(styles),
            up=up,
            padding=k // 2,
            resample_filter=f if up > 1 else None,
            demodulate=demodulate,
            flip_weight=(up == 1),
        )
    )
    wt = torch.from_numpy(w_oihw)
    if up != 1:
        # flip_weight=False -> true convolution == correlation with flipped kernel
        wt = torch.flip(wt, [2, 3])
    want = torch_modulated_conv2d_oracle(
        nchw(x), wt, torch.from_numpy(styles), demodulate, up, k // 2, f
    )
    np.testing.assert_allclose(got, to_nhwc(want), atol=3e-3, rtol=3e-3)


# ------------------------------------------------------------------------ grid_sample


@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_2d_matches_torch(rng, align_corners):
    B, H, W, C, N = 2, 7, 9, 4, 50
    img = rng.randn(B, H, W, C).astype(np.float32)
    coords = (rng.rand(B, N, 2).astype(np.float32) * 2.4 - 1.2)  # include out-of-range

    got = np.asarray(
        ops.grid_sample_2d(jnp.asarray(img), jnp.asarray(coords), align_corners=align_corners)
    )
    want = F.grid_sample(
        nchw(img),
        torch.from_numpy(coords).reshape(B, N, 1, 2),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=align_corners,
    )  # [B, C, N, 1]
    want = want[..., 0].permute(0, 2, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_2d_quad_matches_plain(rng, align_corners):
    """The dense-sampling quad-table form (used by the ADA warp) must be
    EXACTLY the 4-corner form — same zeros padding, same lerp order — for
    values AND input gradients, including far-out-of-range coords."""
    B, H, W, C, N = 2, 7, 9, 4, 60
    img = rng.randn(B, H, W, C).astype(np.float32)
    coords = (rng.rand(B, N, 2).astype(np.float32) * 4.0 - 2.0)  # far out-of-range too

    got = np.asarray(ops.grid_sample_2d_quad(
        jnp.asarray(img), jnp.asarray(coords), align_corners=align_corners))
    want = np.asarray(ops.grid_sample_2d(
        jnp.asarray(img), jnp.asarray(coords), align_corners=align_corners))
    np.testing.assert_array_equal(got, want)

    def loss_quad(im):
        return jnp.sum(ops.grid_sample_2d_quad(
            im, jnp.asarray(coords), align_corners=align_corners) ** 2)

    def loss_plain(im):
        return jnp.sum(ops.grid_sample_2d(
            im, jnp.asarray(coords), align_corners=align_corners) ** 2)

    g_quad = np.asarray(jax.grad(loss_quad)(jnp.asarray(img)))
    g_plain = np.asarray(jax.grad(loss_plain)(jnp.asarray(img)))
    np.testing.assert_allclose(g_quad, g_plain, atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("align_corners", [True, False])
def test_grid_sample_3d_matches_torch(rng, align_corners):
    B, D, H, W, C, N = 2, 5, 6, 7, 3, 40
    vol = rng.randn(B, D, H, W, C).astype(np.float32)
    coords = (rng.rand(B, N, 3).astype(np.float32) * 2.4 - 1.2)

    got = np.asarray(
        ops.grid_sample_3d(jnp.asarray(vol), jnp.asarray(coords), align_corners=align_corners)
    )
    tvol = torch.from_numpy(np.ascontiguousarray(np.transpose(vol, (0, 4, 1, 2, 3))))
    want = F.grid_sample(
        tvol,
        torch.from_numpy(coords).reshape(B, N, 1, 1, 3),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=align_corners,
    )  # [B, C, N, 1, 1]
    want = want[..., 0, 0].permute(0, 2, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_sample_from_triplane_sums_three_planes(rng):
    B, H, W, C, N = 1, 8, 8, 5, 20
    planes = rng.randn(B, H, W, 3 * C).astype(np.float32)
    coords = (rng.rand(B, N, 3).astype(np.float32) * 1.8 - 0.9)
    got = np.asarray(ops.sample_from_triplane(jnp.asarray(coords), jnp.asarray(planes)))

    def t2d(plane_nhwc, cc):
        return F.grid_sample(
            nchw(plane_nhwc),
            torch.from_numpy(cc).reshape(B, N, 1, 2),
            mode="bilinear",
            padding_mode="zeros",
            align_corners=False,
        )[..., 0].permute(0, 2, 1)

    want = (
        t2d(planes[..., :C], coords[..., [0, 1]])
        + t2d(planes[..., C : 2 * C], coords[..., [1, 2]])
        + t2d(planes[..., 2 * C :], coords[..., [0, 2]])
    ).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


# --------------------------------------------------------------------- filtered_lrelu


def test_filtered_lrelu_matches_composed_ops(rng):
    x = rng.randn(2, 8, 8, 4).astype(np.float32)
    b = rng.randn(4).astype(np.float32)
    fu = ops.setup_filter([1, 3, 3, 1], gain=1)
    fd = ops.setup_filter([1, 3, 3, 1], gain=1)
    got = ops.filtered_lrelu(
        jnp.asarray(x), fu, fd, jnp.asarray(b), up=2, down=2, padding=2, clamp=10.0
    )
    # Oracle: compose our tested primitives in the documented order
    # (filtered_lrelu.py:146-151).
    y = ops.bias_act(jnp.asarray(x), jnp.asarray(b))
    y = ops.upfirdn2d(y, fu, up=2, padding=2, gain=4)
    y = ops.bias_act(y, act="lrelu", gain=np.sqrt(2), clamp=10.0)
    y = ops.upfirdn2d(y, fd, down=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(y), atol=1e-6)
    assert got.shape[1] == (8 * 2 + 4 - 3 - 3 + 1) // 2
