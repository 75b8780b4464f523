"""Data pipeline: crawler, transforms, labels, datamodule sampling."""

import numpy as np
import pytest
from PIL import Image

from medfusion_tpu.data import (
    MSIvsMSSDataset,
    SimpleDataModule,
    SimpleDataset2D,
    SimpleDataset3D,
    SyntheticDataset2D,
)
from medfusion_tpu.data.transforms import (
    Compose2D,
    center_crop,
    normalize_minmax,
    random_background,
    resize,
    to_array_16bit,
)


@pytest.fixture
def image_tree(tmp_path):
    rng = np.random.default_rng(0)
    for sub, n in [("MSIMUT", 3), ("MSS", 2)]:
        d = tmp_path / sub
        d.mkdir()
        for i in range(n):
            arr = rng.integers(0, 255, (40, 48, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"img_{i}.png")
    return tmp_path


def test_simple_dataset_crawl_and_range(image_tree):
    ds = SimpleDataset2D(image_tree, crawler_ext="png", image_resize=32, image_crop=32)
    assert len(ds) == 5
    item = ds[0]
    assert item["source"].shape == (32, 32, 3)
    assert item["source"].dtype == np.float32
    assert -1.0 <= item["source"].min() and item["source"].max() <= 1.0
    assert item["source"].min() < -0.3 and item["source"].max() > 0.3  # actually centered
    assert isinstance(item["uid"], str)


def test_msi_dataset_labels_from_parent_dir(image_tree):
    ds = MSIvsMSSDataset(image_tree, crawler_ext="png")
    targets = {str(ds.item_pointers[i].parent): ds[i]["target"] for i in range(len(ds))}
    assert targets == {"MSIMUT": 0, "MSS": 1}


def test_transforms_helpers():
    img = Image.fromarray(np.zeros((40, 20), np.uint8))
    r = resize(img, 10)  # shorter side -> 10, keep aspect
    assert r.size == (10, 20)  # PIL (W, H)
    arr = np.arange(36, dtype=np.float32).reshape(6, 6, 1)
    c = center_crop(arr, 2)
    np.testing.assert_array_equal(c[:, :, 0], [[14, 15], [20, 21]])
    # pad path
    p = center_crop(arr, (8, 4))
    assert p.shape == (8, 4, 1)
    a16 = to_array_16bit(Image.fromarray(np.full((4, 4), 1000, np.int32), mode="I"))
    assert a16.dtype == np.int32 and a16.shape == (4, 4, 1)
    nm = normalize_minmax(np.asarray([[0.0, 5.0], [10.0, 2.5]]))
    assert nm.min() == 0.0 and nm.max() == 1.0
    rb = random_background(np.asarray([0.0, 0.5, 0.0], np.float32), np.random.default_rng(0))
    assert (rb != 0).all()


def test_datamodule_batching_and_weighted_sampling():
    ds = SyntheticDataset2D(n=40, image_size=16, num_classes=2, seed=0)
    # force known targets: even index -> 0, odd -> 1
    ds._targets = np.arange(40) % 2
    weights = [10.0 if t == 1 else 1.0 for t in ds._targets]
    dm = SimpleDataModule(ds, ds_val=ds, batch_size=8, num_workers=2, seed=0, weights=weights)
    targets = []
    n_batches = 0
    for batch in dm.train_dataloader(epoch=0):
        assert batch["source"].shape == (8, 16, 16, 3)
        targets.extend(batch["target"].tolist())
        n_batches += 1
    assert n_batches == 5  # drop_last with 40/8
    # class 1 is 10x oversampled -> dominates
    assert np.mean(np.asarray(targets) == 1) > 0.75
    # determinism per epoch
    b0 = next(iter(dm.train_dataloader(epoch=3)))
    b1 = next(iter(dm.train_dataloader(epoch=3)))
    np.testing.assert_array_equal(b0["source"], b1["source"])
    # val loader keeps order and remainder
    val_counts = sum(b["source"].shape[0] for b in dm.val_dataloader())
    assert val_counts == 40


def test_dataset_3d_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    for i in range(2):
        np.save(tmp_path / f"vol_{i}.npy", rng.normal(size=(8, 12, 12)).astype(np.float32))
    ds = SimpleDataset3D(tmp_path, crawler_ext="npy", image_crop=(8, 10, 10), use_znorm=True)
    item = ds[0]
    assert item["source"].shape == (8, 10, 10, 1)
    np.testing.assert_allclose(item["source"].mean(), 0.0, atol=1e-4)
    ds2 = SimpleDataset3D(tmp_path, crawler_ext="npy", use_znorm=False)
    s = ds2[0]["source"]
    np.testing.assert_allclose([s.min(), s.max()], [-1.0, 1.0], atol=1e-5)


def test_nifti_roundtrip_and_dataset_ingestion(tmp_path):
    """In-repo NIfTI-1 reader (reference ingests .nii via torchio,
    dataset_simple_3d.py:12-58): write->read round-trips across dtypes,
    gzip, and byte order; SimpleDataset3D crawls .nii.gz directly."""
    from medfusion_tpu.data.nifti import read_nifti, write_nifti

    rng = np.random.default_rng(2)
    # dtype round-trips (.nii and .nii.gz)
    for dtype in (np.uint8, np.int16, np.int32, np.float32, np.float64):
        vol = (rng.normal(size=(5, 6, 7)) * 50).astype(dtype)
        for ext in ("nii", "nii.gz"):
            p = tmp_path / f"rt_{np.dtype(dtype).name}.{ext}"
            write_nifti(p, vol)
            got = read_nifti(p)
            assert got.dtype == np.dtype(dtype) and got.shape == vol.shape
            np.testing.assert_array_equal(got, vol)
    # 4-D volume keeps the trailing axis
    vol4 = rng.normal(size=(4, 5, 6, 2)).astype(np.float32)
    write_nifti(tmp_path / "vol4.nii", vol4)
    np.testing.assert_array_equal(read_nifti(tmp_path / "vol4.nii"), vol4)
    # scl_slope / scl_inter scaling is applied on read
    import struct

    raw = (tmp_path / "rt_int16.nii").read_bytes()
    hdr = bytearray(raw)
    struct.pack_into("<f", hdr, 112, 2.0)  # scl_slope
    struct.pack_into("<f", hdr, 116, 3.0)  # scl_inter
    (tmp_path / "scaled.nii").write_bytes(bytes(hdr))
    base = read_nifti(tmp_path / "rt_int16.nii")
    np.testing.assert_allclose(read_nifti(tmp_path / "scaled.nii"),
                               base.astype(np.float32) * 2.0 + 3.0)
    # big-endian header detection
    le = read_nifti(tmp_path / "rt_float32.nii")
    be_hdr = bytearray(348)
    struct.pack_into(">i", be_hdr, 0, 348)
    struct.pack_into(">8h", be_hdr, 40, 3, *le.shape, 1, 1, 1, 1)
    struct.pack_into(">2h", be_hdr, 70, 16, 32)
    struct.pack_into(">f", be_hdr, 108, 352.0)
    be_hdr[344:348] = b"n+1\x00"
    payload = np.asfortranarray(le).astype(">f4").tobytes(order="F")
    (tmp_path / "be.nii").write_bytes(bytes(be_hdr) + b"\x00" * 4 + payload)
    np.testing.assert_array_equal(read_nifti(tmp_path / "be.nii"), le)
    # dataset ingestion: crawl .nii.gz, crop + rescale like the torchio path
    nii_dir = tmp_path / "niis"
    nii_dir.mkdir()
    for i in range(2):
        write_nifti(nii_dir / f"vol_{i}.nii.gz",
                    rng.normal(size=(8, 12, 12)).astype(np.float32))
    ds = SimpleDataset3D(nii_dir, crawler_ext="nii.gz", image_crop=(8, 10, 10),
                         use_znorm=False)
    assert len(ds) == 2
    s = ds[0]["source"]
    assert s.shape == (8, 10, 10, 1)
    np.testing.assert_allclose([s.min(), s.max()], [-1.0, 1.0], atol=1e-5)


def test_grain_loader_and_prefetch():
    from medfusion_tpu.data.grain_loader import make_grain_loader
    from medfusion_tpu.data.prefetch import prefetch_to_device

    ds = SyntheticDataset2D(n=20, image_size=8, num_classes=2, seed=0)
    batches = list(make_grain_loader(ds, batch_size=4, num_epochs=1))
    assert len(batches) == 5
    assert batches[0]["source"].shape == (4, 8, 8, 3)
    assert "uid" not in batches[0]
    # deterministic across loaders with the same seed
    again = list(make_grain_loader(ds, batch_size=4, num_epochs=1))
    np.testing.assert_array_equal(batches[0]["source"], again[0]["source"])
    # prefetch keeps order and materializes on device
    dev = list(prefetch_to_device(batches, size=2))
    assert len(dev) == 5
    np.testing.assert_array_equal(np.asarray(dev[2]["source"]), batches[2]["source"])
