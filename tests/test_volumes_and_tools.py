import json
import os

import numpy as np
import pytest

from bootstrapper_tpu.core.arrays import open_ds, prepare_ds
from bootstrapper_tpu.data.tools import (
    bbox_crop,
    clahe,
    clahe_2d,
    convert_to_zarr,
    make_obj_mask,
    make_raw_mask,
    merge_ids,
    scale_pyramid,
)
from bootstrapper_tpu.data.volumes import prepare_volume, process_zarr


def test_bbox_crop(tmp_path):
    data = np.zeros((8, 16, 16), np.uint8)
    data[2:6, 4:10, 5:12] = 9
    ds = prepare_ds(str(tmp_path / "t.zarr/x"), data.shape, (0, 0, 0), (2, 2, 2), np.uint8)
    ds[ds.roi] = data
    out = bbox_crop(str(tmp_path / "t.zarr/x"), str(tmp_path / "t.zarr/c"), padding=1)
    assert out.spatial_shape == (6, 8, 9)
    assert tuple(out.offset) == (2, 6, 8)  # world units (voxel 2)


def test_convert_npy(tmp_path):
    data = np.random.default_rng(0).integers(0, 1000, (4, 8, 8)).astype(np.uint16)
    np.save(str(tmp_path / "d.npy"), data)
    out = convert_to_zarr(
        str(tmp_path / "d.npy"), str(tmp_path / "t.zarr/raw"),
        voxel_size=(40, 4, 4), dtype="uint8",
    )
    assert out.dtype == np.uint8
    assert out.to_ndarray().max() == 255  # rescaled


def test_convert_image_dir(tmp_path):
    import imageio.v3 as iio

    d = tmp_path / "stack"
    d.mkdir()
    for i in range(3):
        iio.imwrite(
            str(d / f"sec_{i:03}.png"),
            np.full((8, 8), i * 50, np.uint8),
        )
    out = convert_to_zarr(str(d), str(tmp_path / "t.zarr/raw"))
    assert out.spatial_shape == (3, 8, 8)
    assert out.to_ndarray()[2, 0, 0] == 100


def test_masks(tmp_path):
    labels = np.zeros((4, 32, 32), np.uint64)
    labels[:, 8:24, 8:24] = 5
    ds = prepare_ds(str(tmp_path / "t.zarr/labels"), labels.shape, (0, 0, 0), (1, 1, 1), np.uint64)
    ds[ds.roi] = labels
    out = make_obj_mask(str(tmp_path / "t.zarr/labels"), str(tmp_path / "t.zarr/objmask"), num_workers=2)
    np.testing.assert_array_equal(out.to_ndarray(), (labels > 0).astype(np.uint8))

    raw = (labels * 40 + 20).astype(np.uint8)
    rds = prepare_ds(str(tmp_path / "t.zarr/raw"), raw.shape, (0, 0, 0), (1, 1, 1), np.uint8)
    rds[rds.roi] = raw
    m = make_raw_mask(str(tmp_path / "t.zarr/raw"), str(tmp_path / "t.zarr/rawmask"), num_workers=2)
    assert m.to_ndarray()[:, 12:20, 12:20].all()


def test_scale_pyramid(tmp_path):
    data = np.arange(4 * 16 * 16, dtype=np.uint8).reshape(4, 16, 16)
    ds = prepare_ds(str(tmp_path / "t.zarr/raw"), data.shape, (0, 0, 0), (40, 4, 4), np.uint8)
    ds[ds.roi] = data
    paths = scale_pyramid(str(tmp_path / "t.zarr/raw"), scales=2, is_labels=False)
    assert len(paths) == 3
    s1 = open_ds(paths[1])
    assert s1.spatial_shape == (4, 8, 8)
    assert tuple(s1.voxel_size) == (40, 8, 8)
    s2 = open_ds(paths[2])
    assert s2.spatial_shape == (4, 4, 4)


def test_scale_pyramid_labels_strided(tmp_path):
    labels = np.random.default_rng(0).integers(0, 9, (2, 8, 8)).astype(np.uint64)
    ds = prepare_ds(str(tmp_path / "t.zarr/labels"), labels.shape, (0, 0, 0), (1, 1, 1), np.uint64)
    ds[ds.roi] = labels
    paths = scale_pyramid(str(tmp_path / "t.zarr/labels"), scales=1, is_labels=True)
    s1 = open_ds(paths[1]).to_ndarray()
    np.testing.assert_array_equal(s1, labels[:, ::2, ::2])


def test_clahe_2d_increases_local_contrast():
    rng = np.random.default_rng(0)
    img = (rng.normal(100, 3, (64, 64))).astype(np.uint8)  # low contrast
    out = clahe_2d(img)
    assert out.shape == img.shape
    assert out.std() > img.std()


def test_merge_ids(tmp_path):
    seg = np.array([[[1, 2], [3, 4]]], np.uint64)
    ds = prepare_ds(str(tmp_path / "t.zarr/seg"), seg.shape, (0, 0, 0), (1, 1, 1), np.uint64)
    ds[ds.roi] = seg
    out = merge_ids(
        str(tmp_path / "t.zarr/seg"), str(tmp_path / "t.zarr/merged"),
        [[1, 2], [2, 3]], num_workers=1,
    )
    merged = out.to_ndarray()
    assert merged[0, 0, 0] == merged[0, 0, 1] == merged[0, 1, 0]
    assert merged[0, 1, 1] == 4


def test_process_zarr_normalizes_attrs(tmp_path):
    ds = prepare_ds(str(tmp_path / "t.zarr/x"), (4, 4, 4), (0, 0, 0), (1, 1, 1), np.uint8)
    with open(str(tmp_path / "t.zarr/x/.zattrs"), "w") as f:
        json.dump({"resolution": [8, 8, 8]}, f)
    arr = process_zarr(str(tmp_path / "t.zarr/x"))
    assert tuple(arr.voxel_size) == (8, 8, 8)
    attrs = json.load(open(str(tmp_path / "t.zarr/x/.zattrs")))
    assert attrs["voxel_size"] == [8, 8, 8]


def test_prepare_volume(tmp_path):
    data = np.random.default_rng(0).integers(0, 255, (4, 16, 16)).astype(np.uint8)
    np.save(str(tmp_path / "raw.npy"), data)
    labels = np.zeros((4, 16, 16), np.uint64)
    labels[:, :8] = 3
    lds = prepare_ds(str(tmp_path / "c.zarr/labels"), labels.shape, (0, 0, 0), (1, 1, 1), np.uint64)
    lds[lds.roi] = labels
    vol = prepare_volume(
        "v1",
        str(tmp_path / "raw.npy"),
        labels_path=str(tmp_path / "c.zarr/labels"),
        out_container=str(tmp_path / "c.zarr"),
        make_labels_mask_ds=True,
    )
    v = vol["v1"]
    assert os.path.exists(v["raw_dataset"])
    assert "labels_mask_dataset" in v
    mask = open_ds(v["labels_mask_dataset"]).to_ndarray()
    np.testing.assert_array_equal(mask, (labels > 0).astype(np.uint8))


def test_scale_pyramid_on_existing_s0_writes_siblings(tmp_path):
    """Re-running scale-pyramid on a path that already ends in s0 must
    write s1..sN NEXT to it (regression: they nested inside s0)."""
    data = np.arange(4 * 16 * 16, dtype=np.uint8).reshape(4, 16, 16)
    ds = prepare_ds(str(tmp_path / "t.zarr/raw/s0"), data.shape, (0, 0, 0), (40, 4, 4), np.uint8)
    ds[ds.roi] = data
    paths = scale_pyramid(str(tmp_path / "t.zarr/raw/s0"), scales=1, is_labels=False)
    assert paths[0] == str(tmp_path / "t.zarr/raw/s0")
    assert paths[1] == str(tmp_path / "t.zarr/raw/s1")
    assert open_ds(paths[1]).spatial_shape == (4, 8, 8)
    assert not os.path.exists(str(tmp_path / "t.zarr/raw/s0/s1"))


def test_clahe_2d_narrow_section_no_nan():
    """Sections narrower than tiles*tile_width leave empty edge tiles;
    their mapping must be identity, not 0/0 = NaN garbage."""
    rng = np.random.default_rng(0)
    img = rng.integers(40, 200, (64, 12)).astype(np.uint8)
    out = clahe_2d(img)
    assert out.shape == img.shape
    assert np.isfinite(out.astype(np.float64)).all()
    # interpolation against the identity edge tile must stay in range
    assert out.min() >= 0 and out.max() <= 255


def test_merge_ids_survivor_is_pair_target(tmp_path):
    """merge -p a,b keeps b (transitively: a->b then b->c keeps c)."""
    seg = np.array([[[1, 2], [3, 7]]], np.uint64)
    ds = prepare_ds(str(tmp_path / "t.zarr/seg"), seg.shape, (0, 0, 0), (1, 1, 1), np.uint64)
    ds[ds.roi] = seg
    out = merge_ids(
        str(tmp_path / "t.zarr/seg"), str(tmp_path / "t.zarr/merged"),
        [[1, 2], [2, 3]], num_workers=1,
    )
    merged = out.to_ndarray()
    assert merged[0, 0, 0] == merged[0, 0, 1] == merged[0, 1, 0] == 3
    assert merged[0, 1, 1] == 7
    # reversed direction keeps the other endpoint
    out2 = merge_ids(
        str(tmp_path / "t.zarr/seg"), str(tmp_path / "t.zarr/merged2"),
        [[3, 2], [2, 1]], num_workers=1,
    )
    m2 = out2.to_ndarray()
    assert m2[0, 0, 0] == m2[0, 0, 1] == m2[0, 1, 0] == 1
