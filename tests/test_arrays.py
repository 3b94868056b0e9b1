import json
import os

import numpy as np
import pytest

from bootstrapper_tpu.core.arrays import open_ds, prepare_ds
from bootstrapper_tpu.core.geometry import Coordinate, Roi


def test_prepare_open_roundtrip(tmp_path):
    path = str(tmp_path / "test.zarr" / "raw")
    arr = prepare_ds(
        path,
        shape=(16, 32, 32),
        offset=(0, 0, 0),
        voxel_size=(40, 4, 4),
        dtype=np.uint8,
        chunk_shape=(8, 16, 16),
    )
    data = np.random.randint(0, 255, (16, 32, 32), dtype=np.uint8)
    arr[arr.roi] = data

    arr2 = open_ds(path)
    assert arr2.voxel_size == Coordinate(40, 4, 4)
    assert arr2.roi == Roi((0, 0, 0), (640, 128, 128))
    np.testing.assert_array_equal(arr2[arr2.roi], data)


def test_sub_roi_read_write(tmp_path):
    path = str(tmp_path / "t.zarr" / "x")
    arr = prepare_ds(
        path, (8, 8, 8), (80, 8, 8), (40, 4, 4), np.float32
    )
    sub = Roi((120, 12, 12), (80, 8, 8))
    block = np.ones((2, 2, 2), np.float32) * 7
    arr[sub] = block
    out = arr[sub]
    np.testing.assert_array_equal(out, block)
    full = arr[arr.roi]
    assert full.sum() == pytest.approx(7 * 8)


def test_channel_dims(tmp_path):
    path = str(tmp_path / "t.zarr" / "affs")
    arr = prepare_ds(
        path, (3, 4, 8, 8), (0, 0, 0), (40, 4, 4), np.uint8
    )
    assert arr.channel_shape == (3,)
    assert arr.spatial_shape == (4, 8, 8)
    roi = Roi((0, 0, 0), (80, 16, 16))
    data = np.random.randint(0, 255, (3, 2, 4, 4), dtype=np.uint8)
    arr[roi] = data
    np.testing.assert_array_equal(arr[roi], data)


def test_to_ndarray_padding(tmp_path):
    path = str(tmp_path / "t.zarr" / "x")
    arr = prepare_ds(path, (4, 4), (0, 0), (1, 1), np.int32)
    arr[arr.roi] = np.arange(16, dtype=np.int32).reshape(4, 4)
    out = arr.to_ndarray(Roi((-2, -2), (8, 8)))
    assert out.shape == (8, 8)
    assert out[0, 0] == 0
    assert out[2, 2] == 0  # value at (0,0) in array coords
    np.testing.assert_array_equal(out[2:6, 2:6], arr[arr.roi])


def test_legacy_resolution_attr(tmp_path):
    path = str(tmp_path / "t.zarr" / "x")
    arr = prepare_ds(path, (4, 4), (0, 0), (2, 2), np.uint8)
    # rewrite attrs the "legacy" way
    with open(os.path.join(path, ".zattrs"), "w") as f:
        json.dump({"resolution": [8, 8], "offset": [16, 16]}, f)
    arr2 = open_ds(path)
    assert arr2.voxel_size == Coordinate(8, 8)
    assert arr2.offset == Coordinate(16, 16)


def test_out_of_bounds_raises(tmp_path):
    path = str(tmp_path / "t.zarr" / "x")
    arr = prepare_ds(path, (4, 4), (0, 0), (1, 1), np.uint8)
    with pytest.raises(IndexError):
        arr[Roi((0, 0), (8, 8))]


def test_relative_path(tmp_path, monkeypatch):
    """TensorStore rejects relative paths; prepare_ds must absolutise
    (regression: training snapshots silently failed with './...' dirs)."""
    monkeypatch.chdir(tmp_path)
    arr = prepare_ds("./sub/t.zarr/x", (4, 4), (0, 0), (1, 1), np.uint8)
    arr[arr.roi] = np.ones((4, 4), np.uint8)
    again = open_ds("sub/t.zarr/x")
    assert again.to_ndarray().sum() == 16


def test_unaligned_roi_rejected(tmp_path):
    import numpy as np
    import pytest

    from bootstrapper_tpu.core.arrays import prepare_ds
    from bootstrapper_tpu.core.geometry import Roi

    ds = prepare_ds(
        str(tmp_path / "v.zarr/a"), (10, 10), (0, 0), (2, 2), np.uint8
    )
    with pytest.raises(ValueError, match="not aligned"):
        ds[Roi((1, 0), (4, 4))]
    with pytest.raises(ValueError, match="not aligned"):
        ds[Roi((0, 0), (5, 4))] = np.zeros((2, 2), np.uint8)
    # aligned works
    ds[Roi((2, 0), (4, 4))] = np.ones((2, 2), np.uint8)


def test_prepare_ds_preserves_existing_attrs(tmp_path):
    import json

    import numpy as np
    import pytest

    from bootstrapper_tpu.core.arrays import open_ds, prepare_ds

    p = str(tmp_path / "v.zarr/a")
    prepare_ds(p, (10, 10), (4, 4), (2, 2), np.uint8)
    # stash an extra attribute a rewrite would drop
    ap = f"{p}/.zattrs"
    attrs = json.load(open(ap))
    attrs["provenance"] = "keep-me"
    json.dump(attrs, open(ap, "w"))
    # re-open in append mode with the same frame: attrs preserved
    prepare_ds(p, (10, 10), (4, 4), (2, 2), np.uint8, mode="a")
    assert json.load(open(ap))["provenance"] == "keep-me"
    assert open_ds(p).offset == (4, 4)
    # a different world frame must not be silently adopted
    with pytest.raises(ValueError, match="already exists with offset"):
        prepare_ds(p, (10, 10), (0, 0), (2, 2), np.uint8, mode="a")
