"""Synthetic-fixture import tests for the four torch CNNs (VERDICT item 9).

No pretrained weights exist in this environment, so each net's torch state dict
is constructed SHAPE-EXACTLY in the test (torch layouts, reference/torchvision
naming), imported via io/torch_import.state_dict_to_tree, and verified:

  * round-trip: every converted leaf equals the framework-layout ground truth,
  * NUMERIC stage parity vs torch ops — specifically the stride-2 convolutions,
    where XLA "SAME" padding shifts windows relative to torch's symmetric k//2
    padding (a 4.88-max-abs-diff bug this file caught; models now use explicit
    torch-convention padding),
  * full-forward smoke at the real input resolution.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
torch.set_grad_enabled(False)
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ide3d_tpu.io.torch_import import state_dict_to_tree  # noqa: E402

# ------------------------------------------------------------------- helpers


def _leaves(tree, prefix=()):
    for k, v in sorted(tree.items()):
        if isinstance(v, dict):
            yield from _leaves(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def make_torch_sd(tree, seed=0):
    """Random torch-layout state dict matching a framework init tree's shapes.

    Returns (sd, want) where want[name] is the framework-layout ground truth the
    importer must reproduce."""
    rs = np.random.RandomState(seed)
    sd, want = {}, {}
    for path, leaf in _leaves(tree):
        name = ".".join(path)
        arr = rs.randn(*leaf.shape).astype(np.float32) * 0.2
        base = path[-1]
        if base == "running_var":
            arr = np.abs(arr) + 0.5
        if base == "weight" and arr.ndim == 4:
            t = np.ascontiguousarray(arr.transpose(3, 2, 0, 1))  # HWIO -> OIHW
        elif base == "weight" and arr.ndim == 2:
            t = np.ascontiguousarray(arr.T)  # [in,out] -> [out,in]
        else:
            t = arr
        sd[name] = t
        want[name] = arr
    return sd, want


def assert_roundtrip(tree_shapes, sd, want):
    tree = state_dict_to_tree(sd)
    for path, leaf in _leaves(tree):
        name = ".".join(path)
        np.testing.assert_array_equal(np.asarray(leaf), want[name], err_msg=name)
    return jax.tree_util.tree_map(jnp.asarray, tree)


def nchw(x):
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


def to_nhwc(t):
    return t.numpy().transpose(0, 2, 3, 1)


def t_bn(x, p, eps=1e-5):
    return F.batch_norm(
        x,
        torch.from_numpy(p["running_mean"]),
        torch.from_numpy(p["running_var"]),
        torch.from_numpy(p["weight"]),
        torch.from_numpy(p["bias"]),
        eps=eps,
    )


def sub(sd, prefix):
    """Torch-layout leaves under a dotted prefix, keyed by the tail name."""
    return {
        k[len(prefix) + 1:]: v for k, v in sd.items() if k.startswith(prefix + ".")
    }


# ---------------------------------------------------------------------- VGG


def test_vgg16_import_and_stage_parity():
    from ide3d_tpu.metrics.features import VGG16Features

    net = VGG16Features()
    tree0 = net.init(jax.random.PRNGKey(0))
    sd, want = make_torch_sd(tree0, seed=1)
    params = assert_roundtrip(tree0, sd, want)

    x = np.random.RandomState(2).randn(2, 32, 32, 3).astype(np.float32) * 0.5
    taps = net.feature_maps(params, jnp.asarray(x))

    # torch: stage 1 = conv0 -> relu -> conv2 -> relu on the 0..255-scaled input
    xt = nchw((x + 1.0) * 127.5)
    for idx in ("0", "2"):
        w = torch.from_numpy(sd[f"features.{idx}.weight"])
        b = torch.from_numpy(sd[f"features.{idx}.bias"])
        xt = F.relu(F.conv2d(xt, w, b, padding=1))
    np.testing.assert_allclose(np.asarray(taps[0]), to_nhwc(xt), atol=1e-2, rtol=1e-4)

    out = net(params, jnp.asarray(x))
    assert out.shape == (2, 4096) and np.isfinite(np.asarray(out)).all()


def test_vgg19_variant_runs():
    from ide3d_tpu.metrics.features import VGG16Features

    net = VGG16Features(cfg_name="vgg19")
    tree0 = net.init(jax.random.PRNGKey(0))
    sd, want = make_torch_sd(tree0, seed=3)
    params = assert_roundtrip(tree0, sd, want)
    out = net(params, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 4096)


# ----------------------------------------------------------------- Inception


def test_inception_import_and_stem_parity():
    from ide3d_tpu.metrics.features import InceptionV3, _conv_bn

    net = InceptionV3()
    tree0 = net.init()
    sd, want = make_torch_sd(tree0, seed=4)
    params = assert_roundtrip(tree0, sd, want)

    # stem: Conv2d_1a_3x3 = conv 3x3 stride 2 VALID + BN(eps 1e-3) + relu
    x = np.random.RandomState(5).randn(1, 31, 31, 3).astype(np.float32)
    got = _conv_bn(jnp.asarray(x), params["Conv2d_1a_3x3"], stride=2, padding="VALID")
    w = torch.from_numpy(sd["Conv2d_1a_3x3.conv.weight"])
    xt = F.conv2d(nchw(x), w, stride=2)
    xt = F.relu(t_bn(xt, sub(sd, "Conv2d_1a_3x3.bn"), eps=1e-3))
    np.testing.assert_allclose(np.asarray(got), to_nhwc(xt), atol=1e-4, rtol=1e-4)

    # branch_pool avg pool matches torch count_include_pad=True semantics
    from ide3d_tpu.metrics.features import _pool

    xp = np.random.RandomState(6).randn(1, 9, 9, 4).astype(np.float32)
    got_p = _pool(jnp.asarray(xp), "avg", 3, 1, "SAME")
    want_p = F.avg_pool2d(nchw(xp), 3, stride=1, padding=1)
    np.testing.assert_allclose(np.asarray(got_p), to_nhwc(want_p), atol=1e-5)

    feats = net(params, jnp.zeros((1, 75, 75, 3)))
    assert feats.shape == (1, 2048) and np.isfinite(np.asarray(feats)).all()


# ------------------------------------------------------------------- ArcFace


def test_arcface_import_and_block_parity():
    from ide3d_tpu.models.arcface import ArcFaceIRSE50, _blocks_50

    net = ArcFaceIRSE50()
    tree0 = net.init()
    sd, want = make_torch_sd(tree0, seed=7)
    params = assert_roundtrip(tree0, sd, want)

    # model_irse shortcut contract: in_channel == depth -> parameter-free
    # MaxPool2d(1, stride) even at stride 2 (body.0); conv shortcut only on
    # channel changes (body.3: 64 -> 128 stride 2)
    assert "shortcut_layer" not in tree0["body"]["0"]
    assert "shortcut_layer" in tree0["body"]["3"]

    # input layer + body.0 (maxpool shortcut) + body.3 (conv shortcut) vs torch
    x = np.random.RandomState(8).randn(1, 16, 16, 3).astype(np.float32)

    xt = F.conv2d(nchw(x), torch.from_numpy(sd["input_layer.0.weight"]), padding=1)
    xt = t_bn(xt, sub(sd, "input_layer.1"))
    a = torch.from_numpy(sd["input_layer.2.weight"]).reshape(1, -1, 1, 1)
    xt = torch.where(xt >= 0, xt, a * xt)

    def torch_block(xt, blk, stride, maxpool_shortcut):
        if maxpool_shortcut:
            sc = F.max_pool2d(xt, 1, stride) if stride > 1 else xt
        else:
            sc = F.conv2d(xt, torch.from_numpy(sd[f"{blk}.shortcut_layer.0.weight"]),
                          stride=stride)
            sc = t_bn(sc, sub(sd, f"{blk}.shortcut_layer.1"))
        y = t_bn(xt, sub(sd, f"{blk}.res_layer.0"))
        y = F.conv2d(y, torch.from_numpy(sd[f"{blk}.res_layer.1.weight"]), padding=1)
        ap = torch.from_numpy(sd[f"{blk}.res_layer.2.weight"]).reshape(1, -1, 1, 1)
        y = torch.where(y >= 0, y, ap * y)
        y = F.conv2d(y, torch.from_numpy(sd[f"{blk}.res_layer.3.weight"]),
                     stride=stride, padding=1)
        y = t_bn(y, sub(sd, f"{blk}.res_layer.4"))
        s = y.mean(dim=(2, 3), keepdim=True)
        s = F.relu(F.conv2d(s, torch.from_numpy(sd[f"{blk}.res_layer.5.fc1.weight"])))
        s = torch.sigmoid(F.conv2d(s, torch.from_numpy(sd[f"{blk}.res_layer.5.fc2.weight"])))
        return y * s + sc

    # framework: run input layer + blocks via the module internals
    from ide3d_tpu.models.arcface import _bn, _conv, _prelu

    def jax_block(xj, bp, stride):
        if "shortcut_layer" in bp:
            scj = _bn(_conv(xj, bp["shortcut_layer"]["0"]["weight"], stride),
                      bp["shortcut_layer"]["1"])
        elif stride == 1:
            scj = xj
        else:
            scj = jax.lax.reduce_window(xj, -jnp.inf, jax.lax.max, (1, 1, 1, 1),
                                        (1, stride, stride, 1), "VALID")
        r = bp["res_layer"]
        yj = _bn(xj, r["0"])
        yj = _prelu(_conv(yj, r["1"]["weight"]), r["2"])
        yj = _bn(_conv(yj, r["3"]["weight"], stride), r["4"])
        sj = jnp.mean(yj, axis=(1, 2), keepdims=True)
        sj = jax.nn.relu(_conv(sj, r["5"]["fc1"]["weight"]))
        sj = jax.nn.sigmoid(_conv(sj, r["5"]["fc2"]["weight"]))
        return yj * sj + scj

    xj = _conv(jnp.asarray(x), params["input_layer"]["0"]["weight"])
    xj = _prelu(_bn(xj, params["input_layer"]["1"]), params["input_layer"]["2"])
    for i in (0, 1, 2, 3):
        ci, depth, stride = _blocks_50()[i]
        want_t = torch_block(xt, f"body.{i}", stride,
                             maxpool_shortcut=(ci == depth))
        got = jax_block(xj, params["body"][str(i)], stride)
        np.testing.assert_allclose(np.asarray(got), to_nhwc(want_t),
                                   atol=1e-4, rtol=1e-4, err_msg=f"body.{i}")
        xt, xj = want_t, got

    emb = net(params, jnp.zeros((1, 112, 112, 3)))
    assert emb.shape == (1, 512) and np.isfinite(np.asarray(emb)).all()


# ------------------------------------------------------------------- BiSeNet


def test_bisenet_import_and_stem_parity():
    from ide3d_tpu.models.bisenet import BiSeNet, batch_norm, conv2d

    net = BiSeNet()
    tree0 = net.init(jax.random.PRNGKey(0))
    sd, want = make_torch_sd(tree0, seed=9)
    params = assert_roundtrip(tree0, sd, want)

    # resnet18 stem: 7x7 stride-2 conv (torch padding=3) + BN + relu + maxpool 3/2/1
    x = np.random.RandomState(10).randn(1, 32, 32, 3).astype(np.float32)
    p = params["cp"]["resnet"] if "cp" in params else params["resnet"]
    sd_prefix = "cp.resnet" if "cp" in params else "resnet"
    got = conv2d(jnp.asarray(x), p["conv1"]["weight"], 2)
    got = jax.nn.relu(batch_norm(got, p["bn1"]))
    xt = F.conv2d(nchw(x), torch.from_numpy(sd[f"{sd_prefix}.conv1.weight"]),
                  stride=2, padding=3)
    xt = F.relu(t_bn(xt, sub(sd, f"{sd_prefix}.bn1")))
    np.testing.assert_allclose(np.asarray(got), to_nhwc(xt), atol=1e-4, rtol=1e-4)

    # full forward smoke: 19-class logits at input resolution
    seg = net(params, jnp.zeros((1, 64, 64, 3)))
    assert seg.shape[0] == 1 and seg.shape[-1] == net.n_classes
    assert np.isfinite(np.asarray(seg)).all()


# ------------------------------------------------------------ ResNetEncoder


def test_resnet_encoder_import_and_block_parity(tmp_path):
    """networks.py:1779 ResNetEncoder: torchvision-resnet18 trunk + global pool.

    Parity target: the layer2.0 BasicBlock (stride-2 + 1x1 downsample branch),
    the configuration the bisenet stem test does not cover."""
    from ide3d_tpu.models.resnet_encoder import ResNetEncoder, import_resnet_encoder

    net = ResNetEncoder()
    tree0 = net.init(jax.random.PRNGKey(0))
    sd, want = make_torch_sd(tree0, seed=11)
    params = assert_roundtrip(tree0, sd, want)

    # torch-side BasicBlock with downsample (torchvision resnet.py semantics)
    from ide3d_tpu.models.bisenet import _basic_block

    x = np.random.RandomState(12).randn(1, 16, 16, 64).astype(np.float32)
    got = _basic_block(jnp.asarray(x), params["layer2"]["0"], 2)
    xt = nchw(x)
    p = "layer2.0"
    out = F.conv2d(xt, torch.from_numpy(sd[f"{p}.conv1.weight"]), stride=2, padding=1)
    out = F.relu(t_bn(out, sub(sd, f"{p}.bn1")))
    out = F.conv2d(out, torch.from_numpy(sd[f"{p}.conv2.weight"]), padding=1)
    out = t_bn(out, sub(sd, f"{p}.bn2"))
    idn = F.conv2d(xt, torch.from_numpy(sd[f"{p}.downsample.0.weight"]), stride=2)
    idn = t_bn(idn, sub(sd, f"{p}.downsample.1"))
    wt = F.relu(out + idn)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(wt), atol=1e-4, rtol=1e-4)

    # file import drops the classifier head
    sd_file = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    sd_file["fc.weight"] = torch.zeros(1000, 512)
    sd_file["fc.bias"] = torch.zeros(1000)
    pth = tmp_path / "resnet18.pth"
    torch.save(sd_file, str(pth))
    imported = import_resnet_encoder(str(pth))
    assert "fc" not in imported
    np.testing.assert_allclose(
        np.asarray(imported["conv1"]["weight"]), want["conv1.weight"], rtol=0, atol=0
    )

    # full forward: resize -> trunk -> pooled [B, 512]
    emb = jax.jit(net.__call__)(params, jnp.zeros((2, 96, 96, 3)))
    assert emb.shape == (2, 512) and np.isfinite(np.asarray(emb)).all()
