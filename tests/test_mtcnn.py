"""MTCNN import-parity + cascade-mechanics tests (weight-gated component).

Same strategy as tests/test_cnn_import.py: the three cascade nets' torch math
(facenet-pytorch layouts: VALID convs, PReLU, ceil-mode max-pools, the
(W,H,C)-order flatten quirk) is reproduced in-test, shape-exact state dicts are
built, imported via models/mtcnn.import_mtcnn, and forwards compared. The box
pipeline (NMS, rerec, regression, crop) is unit-tested against hand-computed
cases; detect_faces runs end-to-end with random weights.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
torch.set_grad_enabled(False)
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ide3d_tpu.models.mtcnn import (  # noqa: E402
    MTCNN,
    ONet,
    PNet,
    RNet,
    apply_regression,
    generate_bounding_boxes,
    import_mtcnn,
    nms,
    rerec,
    write_detection,
)

# --------------------------------------------------------- torch reference math


def t_conv(x, sd, name, pool=None):
    x = F.conv2d(x, sd[f"{name}.weight"], sd[f"{name}.bias"])
    x = F.prelu(x, sd[f"{name.replace('conv', 'prelu')}.weight"])
    if pool is not None:
        k, s = pool
        x = F.max_pool2d(x, k, s, ceil_mode=True)
    return x


def t_flatten(x):
    return x.permute(0, 3, 2, 1).reshape(x.shape[0], -1)


def t_dense(x, sd, name):
    return F.linear(x, sd[f"{name}.weight"], sd[f"{name}.bias"])


def rand_sd(spec, seed):
    g = torch.Generator().manual_seed(seed)
    sd = {}
    for name, shape in spec:
        # fan-in-ish scale keeps activations O(1) through the cascade so fp32
        # accumulation-order differences stay inside the parity tolerance
        scale = 2.0 / np.sqrt(np.prod(shape[1:])) if len(shape) > 1 else 0.1
        sd[name] = torch.randn(*shape, generator=g) * scale
    return sd


def pnet_sd():
    return rand_sd([
        ("conv1.weight", (10, 3, 3, 3)), ("conv1.bias", (10,)), ("prelu1.weight", (10,)),
        ("conv2.weight", (16, 10, 3, 3)), ("conv2.bias", (16,)), ("prelu2.weight", (16,)),
        ("conv3.weight", (32, 16, 3, 3)), ("conv3.bias", (32,)), ("prelu3.weight", (32,)),
        ("conv4_1.weight", (2, 32, 1, 1)), ("conv4_1.bias", (2,)),
        ("conv4_2.weight", (4, 32, 1, 1)), ("conv4_2.bias", (4,)),
    ], 0)


def rnet_sd():
    return rand_sd([
        ("conv1.weight", (28, 3, 3, 3)), ("conv1.bias", (28,)), ("prelu1.weight", (28,)),
        ("conv2.weight", (48, 28, 3, 3)), ("conv2.bias", (48,)), ("prelu2.weight", (48,)),
        ("conv3.weight", (64, 48, 2, 2)), ("conv3.bias", (64,)), ("prelu3.weight", (64,)),
        ("dense4.weight", (128, 576)), ("dense4.bias", (128,)), ("prelu4.weight", (128,)),
        ("dense5_1.weight", (2, 128)), ("dense5_1.bias", (2,)),
        ("dense5_2.weight", (4, 128)), ("dense5_2.bias", (4,)),
    ], 1)


def onet_sd():
    return rand_sd([
        ("conv1.weight", (32, 3, 3, 3)), ("conv1.bias", (32,)), ("prelu1.weight", (32,)),
        ("conv2.weight", (64, 32, 3, 3)), ("conv2.bias", (64,)), ("prelu2.weight", (64,)),
        ("conv3.weight", (64, 64, 3, 3)), ("conv3.bias", (64,)), ("prelu3.weight", (64,)),
        ("conv4.weight", (128, 64, 2, 2)), ("conv4.bias", (128,)), ("prelu4.weight", (128,)),
        ("dense5.weight", (256, 1152)), ("dense5.bias", (256,)), ("prelu5.weight", (256,)),
        ("dense6_1.weight", (2, 256)), ("dense6_1.bias", (2,)),
        ("dense6_2.weight", (4, 256)), ("dense6_2.bias", (4,)),
        ("dense6_3.weight", (10, 256)), ("dense6_3.bias", (10,)),
    ], 2)


@pytest.fixture(scope="module")
def params():
    return import_mtcnn({k: v.numpy() for k, v in pnet_sd().items()},
                        {k: v.numpy() for k, v in rnet_sd().items()},
                        {k: v.numpy() for k, v in onet_sd().items()})


def test_pnet_parity(params):
    sd = pnet_sd()
    # odd input dims exercise ceil-mode pooling; fully-conv output grid
    x = torch.randn(2, 3, 21, 27, generator=torch.Generator().manual_seed(3))
    h = t_conv(x, sd, "conv1", pool=(2, 2))
    h = t_conv(h, sd, "conv2")
    h = t_conv(h, sd, "conv3")
    want_p = torch.softmax(F.conv2d(h, sd["conv4_1.weight"], sd["conv4_1.bias"]), dim=1)
    want_r = F.conv2d(h, sd["conv4_2.weight"], sd["conv4_2.bias"])
    got_p, got_r = PNet()(params["pnet"], jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(np.asarray(got_p), want_p.permute(0, 2, 3, 1).numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_r), want_r.permute(0, 2, 3, 1).numpy(),
                               atol=1e-4, rtol=1e-4)


def test_rnet_parity(params):
    sd = rnet_sd()
    x = torch.randn(3, 3, 24, 24, generator=torch.Generator().manual_seed(4))
    h = t_conv(x, sd, "conv1", pool=(3, 2))
    h = t_conv(h, sd, "conv2", pool=(3, 2))
    h = t_conv(h, sd, "conv3")
    h = F.prelu(t_dense(t_flatten(h), sd, "dense4"), sd["prelu4.weight"])
    want_p = torch.softmax(t_dense(h, sd, "dense5_1"), dim=1)
    want_r = t_dense(h, sd, "dense5_2")
    got_p, got_r = RNet()(params["rnet"], jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(np.asarray(got_p), want_p.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_r), want_r.numpy(), atol=1e-4, rtol=1e-4)


def test_onet_parity(params):
    sd = onet_sd()
    x = torch.randn(2, 3, 48, 48, generator=torch.Generator().manual_seed(5))
    h = t_conv(x, sd, "conv1", pool=(3, 2))
    h = t_conv(h, sd, "conv2", pool=(3, 2))
    h = t_conv(h, sd, "conv3", pool=(2, 2))
    h = t_conv(h, sd, "conv4")
    h = F.prelu(t_dense(t_flatten(h), sd, "dense5"), sd["prelu5.weight"])
    want_p = torch.softmax(t_dense(h, sd, "dense6_1"), dim=1)
    want_r = t_dense(h, sd, "dense6_2")
    want_l = t_dense(h, sd, "dense6_3")
    got_p, got_r, got_l = ONet()(params["onet"], jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(np.asarray(got_p), want_p.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_r), want_r.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_l), want_l.numpy(), atol=1e-4, rtol=1e-4)


def test_random_init_shapes():
    key = jax.random.PRNGKey(0)
    p, r, o = PNet(), RNet(), ONet()
    probs, reg = p(p.init(key), jnp.zeros((1, 12, 12, 3)))
    assert probs.shape == (1, 1, 1, 2) and reg.shape == (1, 1, 1, 4)
    probs, reg = r(r.init(key), jnp.zeros((1, 24, 24, 3)))
    assert probs.shape == (1, 2) and reg.shape == (1, 4)
    probs, reg, lmk = o(o.init(key), jnp.zeros((1, 48, 48, 3)))
    assert probs.shape == (1, 2) and reg.shape == (1, 4) and lmk.shape == (1, 10)


# -------------------------------------------------------------- box mechanics


def test_nms_union_and_min():
    boxes = np.array([
        [0, 0, 10, 10, 0.9],
        [1, 1, 11, 11, 0.8],   # high IoU with first -> suppressed (union)
        [20, 20, 30, 30, 0.7],
    ], np.float32)
    keep = nms(boxes, 0.5)
    np.testing.assert_allclose(sorted(boxes[keep][:, 4].tolist()), [0.7, 0.9], atol=1e-6)
    # 'min' divides by the smaller area: a box nested inside another is
    # suppressed even when IoU is low
    boxes = np.array([
        [0, 0, 100, 100, 0.9],
        [10, 10, 20, 20, 0.8],
    ], np.float32)
    assert len(nms(boxes, 0.5, method="min")) == 1
    assert len(nms(boxes, 0.5, method="union")) == 2
    assert len(nms(np.zeros((0, 5), np.float32), 0.5)) == 0


def test_rerec_squares():
    b = np.array([[0, 0, 10, 20, 0.5]], np.float32)
    sq = rerec(b)
    assert sq[0, 2] - sq[0, 0] == sq[0, 3] - sq[0, 1] == 20
    # center preserved
    np.testing.assert_allclose((sq[0, 0] + sq[0, 2]) / 2, 5)
    np.testing.assert_allclose((sq[0, 1] + sq[0, 3]) / 2, 10)


def test_apply_regression():
    b = np.array([[0, 0, 9, 9, 0.5]], np.float32)  # w = h = 10
    reg = np.array([[0.1, 0.2, -0.1, -0.2]], np.float32)
    out = apply_regression(b, reg)
    np.testing.assert_allclose(out[0, :4], [1.0, 2.0, 8.0, 7.0])


def test_generate_bounding_boxes():
    probs = np.zeros((5, 6), np.float32)
    probs[2, 3] = 0.95
    reg = np.zeros((5, 6, 4), np.float32)
    boxes = generate_bounding_boxes(probs, reg, scale=0.5, threshold=0.6)
    assert boxes.shape == (1, 9)
    # stride 2, cell 12: x1 = round((2*3+1)/0.5) = 14, y1 = round((2*2+1)/0.5) = 10
    np.testing.assert_allclose(boxes[0, :4], [14, 10, 36, 32])
    assert boxes[0, 4] == pytest.approx(0.95)
    assert generate_bounding_boxes(probs, reg, 0.5, 0.99).shape == (0, 9)


def test_detect_faces_runs_and_contract(tmp_path):
    key = jax.random.PRNGKey(0)
    params = {"pnet": PNet().init(key), "rnet": RNet().init(key),
              "onet": ONet().init(key)}
    det = MTCNN(params=params, min_face_size=20)
    img = (np.random.RandomState(0).rand(64, 80, 3) * 255).astype(np.uint8)
    result = det.detect_faces(img)
    assert isinstance(result, list)
    for r in result:
        assert set(r) == {"box", "confidence", "keypoints"}
        assert len(r["box"]) == 4
        assert set(r["keypoints"]) == {"left_eye", "right_eye", "nose",
                                       "mouth_left", "mouth_right"}
    # write_detection: biggest face, 5 'x y' lines (batch_mtcnn.py:44-70)
    fake = [{"box": [0, 0, 10, 10], "confidence": 0.99,
             "keypoints": {n: (float(i), float(i + 1)) for i, n in enumerate(
                 ("left_eye", "right_eye", "nose", "mouth_left", "mouth_right"))}}]
    path = str(tmp_path / "det.txt")
    assert write_detection(fake, path)
    lm = np.loadtxt(path)
    assert lm.shape == (5, 2)
    np.testing.assert_allclose(lm[2], [2.0, 3.0])
    assert not write_detection([], path)
    fake[0]["confidence"] = 0.5
    assert not write_detection(fake, path)
