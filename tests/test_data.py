"""Dataset pipeline tests with synthetic on-disk data (contracts from
training/dataset_seg.py: label sign flips, one-hot seg, xflip relabel)."""

import json
import os

import numpy as np
import PIL.Image
import pytest

from ide3d_tpu.data import CameraLabeledDataset, infinite_loader


@pytest.fixture(scope="module")
def toy_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    segroot = tmp_path_factory.mktemp("segs")
    rng = np.random.RandomState(0)
    labels = {}
    for i in range(6):
        name = f"img{i:08d}.png"
        PIL.Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)).save(root / name)
        PIL.Image.fromarray(rng.randint(0, 19, (32, 32), dtype=np.uint8)).save(segroot / name)
        lab = np.zeros(25, np.float32)
        lab[:16] = np.eye(4, dtype=np.float32).reshape(-1)
        lab[1] = 0.25  # will be sign-flipped on load
        lab[16:] = [4.2647, 0, 0.5, 0, 4.2647, 0.5, 0, 0, 1]
        labels[name] = lab.tolist()
    with open(root / "dataset.json", "w") as f:
        json.dump({"labels": list(labels.items())}, f)
    return str(root), str(segroot)


def test_dataset_item_contract(toy_dataset):
    root, segroot = toy_dataset
    ds = CameraLabeledDataset(root, segroot, resolution=32)
    img, seg, label = ds[0]
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    assert seg.shape == (32, 32, 19) and seg.dtype == np.float32
    np.testing.assert_allclose(seg.sum(-1), 1.0)  # one-hot
    assert label.shape == (25,)
    # OpenCV -> OpenGL flip applied to index 1
    assert label[1] == -0.25


def test_xflip_relabel(toy_dataset):
    root, segroot = toy_dataset
    ds = CameraLabeledDataset(root, segroot, resolution=32, xflip=True)
    n = len(ds) // 2
    img0, seg0, lab0 = ds[0]
    imgf, segf, labf = ds[n]
    np.testing.assert_array_equal(imgf, img0[:, ::-1])
    np.testing.assert_array_equal(segf, seg0[:, ::-1])
    flip_idx = [1, 2, 3, 4, 8]
    np.testing.assert_allclose(labf[flip_idx], -lab0[flip_idx])
    keep = [i for i in range(25) if i not in flip_idx]
    np.testing.assert_allclose(labf[keep], lab0[keep])


def test_remap_5(toy_dataset):
    root, segroot = toy_dataset
    ds = CameraLabeledDataset(root, segroot, resolution=32, remap_5=True)
    _, seg, _ = ds[0]
    assert seg.shape[-1] == 5


def test_infinite_loader_batches(toy_dataset):
    root, segroot = toy_dataset
    ds = CameraLabeledDataset(root, segroot, resolution=32)
    it = infinite_loader(ds, batch_size=4, seed=0)
    batch = next(it)
    assert batch["img"].shape == (4, 32, 32, 3)
    assert batch["seg"].shape == (4, 32, 32, 19)
    assert batch["c"].shape == (4, 25)
    assert batch["img"].min() >= -1.0 and batch["img"].max() <= 1.0
    assert set(np.unique(batch["seg"])) <= {-1.0, 1.0}
    # host sharding yields disjoint streams deterministically per seed
    it0 = infinite_loader(ds, 2, seed=1, host_id=0, num_hosts=2, shuffle=False)
    it1 = infinite_loader(ds, 2, seed=1, host_id=1, num_hosts=2, shuffle=False)
    b0, b1 = next(it0), next(it1)
    assert not np.allclose(b0["img"], b1["img"])


def test_native_host_ops(rng):
    from ide3d_tpu.data import _native as N

    mask = rng.randint(0, 19, (64, 64)).astype(np.uint8)
    img = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
    oh = N.onehot_seg(mask, 19)
    assert oh.shape == (64, 64, 19)
    assert (np.argmax(oh, -1) == mask).all()
    assert set(np.unique(oh)) == {-1.0, 1.0}
    ohf = N.onehot_seg(mask, 19, flip=True)
    assert (np.argmax(ohf, -1) == mask[:, ::-1]).all()
    ni = N.normalize_img(img, flip=True)
    np.testing.assert_allclose(ni, img[:, ::-1].astype(np.float32) / 127.5 - 1, atol=1e-6)
    ib, sb = N.batch_assemble([img, img], [mask, mask], [0, 1])
    assert ib.shape == (2, 64, 64, 3) and sb.shape == (2, 64, 64, 19)
    np.testing.assert_allclose(ib[1], ni, atol=1e-6)


def test_prefetch_loader(toy_dataset):
    from ide3d_tpu.data import CameraLabeledDataset, PrefetchLoader

    root, segroot = toy_dataset
    ds = CameraLabeledDataset(root, segroot, resolution=32, xflip=True)
    loader = PrefetchLoader(ds, batch_size=4, num_threads=2, prefetch=2)
    try:
        for _ in range(3):
            batch = next(loader)
            assert batch["img"].shape == (4, 32, 32, 3)
            assert batch["seg"].shape == (4, 32, 32, 19)
            assert batch["c"].shape == (4, 25)
            assert batch["img"].dtype == np.float32
            assert set(np.unique(batch["seg"])) <= {-1.0, 1.0}
    finally:
        loader.close()


def test_align_crop_scale_translation_invariance():
    """In-the-wild recrop (crop_images_in_the_wild.py:43-61 semantics): the same
    face rendered at different scales/positions aligns to ~the same output crop;
    the POS solve recovers the planted similarity transform."""
    import PIL.Image

    from ide3d_tpu.data.preprocess import LM3D_STD, align_crop, pos_similarity

    rng = np.random.RandomState(0)

    def synth(scale, tx, ty, size):
        """Image with a distinctive pattern placed by a similarity transform of
        the standard landmarks; returns (img, landmarks y-down)."""
        img = np.zeros((size, size, 3), np.uint8)
        # y-up landmark positions: s * lm3d_std[:, :2] + t
        lm_up = LM3D_STD[:, :2] * scale + np.array([tx, ty])
        # a textured box around the face region
        cx, cy = int(tx), int(size - 1 - ty)
        half = int(scale * 0.9)
        y0, y1 = max(cy - half, 0), min(cy + half, size)
        x0, x1 = max(cx - half, 0), min(cx + half, size)
        # scale-invariant content: four colored quadrants about the face center
        yy, xx = np.indices((y1 - y0, x1 - x0))
        qy = (yy + y0) >= cy
        qx = (xx + x0) >= cx
        quad = qy.astype(int) * 2 + qx.astype(int)
        palette = np.array([[255, 40, 40], [40, 255, 40], [40, 40, 255], [255, 255, 40]],
                           np.uint8)
        img[y0:y1, x0:x1] = palette[quad]
        lm_down = lm_up.copy()
        lm_down[:, 1] = size - 1 - lm_down[:, 1]
        return img, lm_down

    # POS recovers the planted scale
    img, lm = synth(120.0, 300.0, 260.0, 600)
    lm_up = lm.copy()
    lm_up[:, 1] = 600 - 1 - lm_up[:, 1]
    t, s = pos_similarity(lm_up, LM3D_STD)
    assert abs(s - 120.0) / 120.0 < 0.05
    assert abs(t[0] - 300.0) < 3 and abs(t[1] - 260.0) < 6

    out1 = align_crop(img, lm, output_size=128, target_size=512,
                      rescale_factor=150, center_crop_size=350)
    img2, lm2 = synth(200.0, 500.0, 430.0, 1000)
    out2 = align_crop(img2, lm2, output_size=128, target_size=512,
                      rescale_factor=150, center_crop_size=350)
    assert out1.shape == out2.shape == (128, 128, 3)
    # same face content lands in the same place (allow resampling tolerance)
    a, b = out1.astype(np.float32), out2.astype(np.float32)
    assert np.abs(a - b).mean() < 12.0
    assert a.max() > 50  # the face actually landed inside the crop


def test_infinite_loader_compact(toy_dataset):
    """compact=True yields the uint8 wire format, and device-side expansion
    (train.gan.expand_compact_batch) reproduces the legacy f32 batch exactly."""
    import jax

    from ide3d_tpu.train.gan import expand_compact_batch

    root, segroot = toy_dataset
    ds = CameraLabeledDataset(root, segroot, resolution=32)
    full = next(infinite_loader(ds, 4, seed=3, shuffle=False))
    comp = next(infinite_loader(ds, 4, seed=3, shuffle=False, compact=True))
    assert comp["img"].dtype == np.uint8 and comp["img"].shape == (4, 32, 32, 3)
    assert comp["seg"].dtype == np.uint8 and comp["seg"].shape == (4, 32, 32)
    exp = jax.jit(expand_compact_batch)(comp)
    np.testing.assert_allclose(np.asarray(exp["img"]), full["img"], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(exp["seg"]), full["seg"])
    np.testing.assert_allclose(np.asarray(exp["c"]), full["c"])
    # expansion is a no-op on batches already in the step format
    exp2 = expand_compact_batch(dict(full))
    np.testing.assert_array_equal(np.asarray(exp2["seg"]), full["seg"])


def test_prefetch_to_device_matches_direct(toy_dataset):
    """prefetch_to_device yields the SAME batch stream as shard_batch(next(...))
    (same seed -> same index stream), device-placed with dim 0 sharded, and an
    img-less (encoder synthetic-mode) batch passes through expand unscathed."""
    import jax

    from ide3d_tpu.parallel import create_mesh, prefetch_to_device, shard_batch
    from ide3d_tpu.train.gan import expand_compact_batch

    root, segroot = toy_dataset
    ds = CameraLabeledDataset(root, segroot, resolution=32)
    mesh = create_mesh(len(jax.devices()))
    direct = infinite_loader(ds, 8, seed=5, compact=True)
    pre = prefetch_to_device(infinite_loader(ds, 8, seed=5, compact=True), mesh)
    for _ in range(3):
        want = shard_batch(mesh, next(direct))
        got = next(pre)
        for k in want:
            np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]))
            assert got[k].sharding == want[k].sharding
    # img-less batch guard (VERDICT r5: the round-4 encoder-CLI regression)
    out = expand_compact_batch({"c": np.zeros((4, 25), np.float32)})
    assert set(out) == {"c"}
