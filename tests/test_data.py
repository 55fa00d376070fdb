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
