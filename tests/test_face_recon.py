"""Deep3DFaceRecon coefficient-net import parity (weight-gated component).

Same strategy as tests/test_cnn_import.py: the ReconNetWrapper torch math
(torchvision ResNet-50 trunk + seven 1×1 coefficient heads) is reproduced
in-test, a shape-exact state dict is imported through models/face_recon, and
forwards are compared. The coeffs→pose glue is checked against the existing
data/preprocess contracts.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
torch.set_grad_enabled(False)
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ide3d_tpu.models.face_recon import (  # noqa: E402
    COEFF_SLICES,
    FaceReconNet,
    coeffs_to_pose_label,
    import_face_recon,
    split_coeffs,
)
from test_cnn_import import make_torch_sd, nchw, sub, t_bn, to_nhwc  # noqa: E402

_STAGES = ((3, 256), (4, 512), (6, 1024), (3, 2048))


def t_conv(x, p, stride=1):
    w = torch.from_numpy(p["weight"])
    pad = w.shape[-1] // 2
    b = torch.from_numpy(p["bias"]) if "bias" in p else None
    return F.conv2d(x, w, b, stride=stride, padding=pad)


def t_bottleneck(x, sd, prefix, stride):
    out = F.relu(t_bn(t_conv(x, sub(sd, f"{prefix}.conv1")), sub(sd, f"{prefix}.bn1")))
    out = F.relu(t_bn(t_conv(out, sub(sd, f"{prefix}.conv2"), stride),
                      sub(sd, f"{prefix}.bn2")))
    out = t_bn(t_conv(out, sub(sd, f"{prefix}.conv3")), sub(sd, f"{prefix}.bn3"))
    if any(k.startswith(f"{prefix}.downsample") for k in sd):
        x = t_bn(t_conv(x, sub(sd, f"{prefix}.downsample.0"), stride),
                 sub(sd, f"{prefix}.downsample.1"))
    return F.relu(out + x)


def torch_forward(sd, x_nhwc):
    x = nchw(x_nhwc)
    x = F.relu(t_bn(t_conv(x, sub(sd, "backbone.conv1"), 2), sub(sd, "backbone.bn1")))
    x = F.max_pool2d(x, 3, 2, padding=1)
    for si, (blocks, _) in enumerate(_STAGES):
        for bi in range(blocks):
            x = t_bottleneck(x, sd, f"backbone.layer{si + 1}.{bi}",
                             2 if (bi == 0 and si > 0) else 1)
    x = F.adaptive_avg_pool2d(x, 1)
    outs = [t_conv(x, sub(sd, f"final_layers.{i}")) for i in range(7)]
    return torch.cat(outs, dim=1)[:, :, 0, 0].numpy()


@pytest.fixture(scope="module")
def fixture():
    net = FaceReconNet()
    tree = net.init(jax.random.PRNGKey(0))
    sd, want = make_torch_sd(tree, seed=0)
    _, params = import_face_recon(sd)
    return net, params, sd, want


def test_roundtrip(fixture):
    from test_cnn_import import _leaves

    net, params, sd, want = fixture
    for path, leaf in _leaves(params):
        np.testing.assert_array_equal(np.asarray(leaf), want[".".join(path)],
                                      err_msg=".".join(path))


def test_forward_parity(fixture):
    net, params, sd, _ = fixture
    # 64×64 input keeps the CPU forward fast; all strides/paddings exercised
    x = np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32)
    got = np.asarray(net(params, jnp.asarray(x)))
    want = torch_forward(sd, x)
    assert got.shape == (1, 257)
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-4)


def test_nested_checkpoint_unwrap(fixture):
    _, _, sd, _ = fixture
    net, params = import_face_recon({"net_recon": sd})
    assert "backbone" in params and "final_layers" in params


def test_split_and_pose():
    coeffs = np.zeros((1, 257), np.float32)
    groups = split_coeffs(jnp.asarray(coeffs))
    assert {k: v.shape[1] for k, v in groups.items()} == {
        "id": 80, "exp": 64, "tex": 80, "angle": 3, "gamma": 27, "trans": 3}
    assert sum(b - a for a, b in COEFF_SLICES.values()) == 257

    label = coeffs_to_pose_label(coeffs[0])
    assert label.shape == (1, 25)
    pose = label[0, :16].reshape(4, 4)
    # fix_pose_orig normalizes the camera to the r=2.7 orbit
    np.testing.assert_allclose(np.linalg.norm(pose[:3, 3]), 2.7, atol=1e-5)
    # intrinsics are the canonical normalized FFHQ matrix
    K = label[0, 16:].reshape(3, 3)
    np.testing.assert_allclose(K[0, 0], 4.2647, atol=1e-3)
    np.testing.assert_allclose(K[2, 2], 1.0)
    # rotation block stays orthonormal
    R = pose[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
