import numpy as np
import pytest

from bootstrapper_tpu.core.arrays import open_ds, prepare_ds
from bootstrapper_tpu.post.filter import (
    compute_ids_to_remove,
    filter_segmentation_blockwise,
    outlier_filter,
    size_filter,
)


def test_dust_filter():
    seg = np.zeros((4, 8, 8), np.uint64)
    seg[:, :4, :] = 1  # big
    seg[0, 7, 7] = 2  # dust
    out = compute_ids_to_remove(seg, dust_filter=5)
    assert list(out) == [2]


def test_outlier_removal():
    # twenty segments of 10 voxels + one of 2000: deviation > 4 sigma
    seg = np.zeros((1, 50, 100), np.uint64)
    for i in range(20):
        seg[0, i, :10] = i + 1
    seg[0, 25:45, :] = 21
    out = compute_ids_to_remove(seg, remove_outliers=True)
    assert 21 in out
    assert 1 not in out


def test_z_fragment_removal():
    seg = np.zeros((5, 4, 4), np.uint64)
    seg[:, 0, 0] = 1  # spans all z
    seg[2, 2, 2] = 2  # single-z fragment
    out = compute_ids_to_remove(seg, remove_z_fragments=2)
    assert list(out) == [2]


def test_overlap_filter():
    seg = np.zeros((3, 4, 4), np.uint64)
    seg[:, :2, :] = 1  # perfectly aligned across z
    # id 2 jumps position between slices -> zero overlap
    seg[0, 3, 0] = 2
    seg[1, 3, 3] = 2
    out = compute_ids_to_remove(seg, overlap_filter=0.5)
    assert 2 in out and 1 not in out


def test_filter_blockwise_end_to_end(tmp_path):
    seg = np.zeros((6, 16, 16), np.uint64)
    seg[:, :8, :] = 1
    seg[3, 12, 12] = 7  # dust
    ds = prepare_ds(str(tmp_path / "f.zarr/seg"), seg.shape, (0, 0, 0), (1, 1, 1), np.uint64)
    ds[ds.roi] = seg
    res = filter_segmentation_blockwise(
        str(tmp_path / "f.zarr/seg"),
        str(tmp_path / "f.zarr/pseudo_gt"),
        str(tmp_path / "f.zarr/pseudo_gt_mask"),
        dust_filter=5,
        block_shape=(4, 8, 8),
        num_workers=2,
    )
    assert res["removed_ids"] == 1
    out = open_ds(str(tmp_path / "f.zarr/pseudo_gt")).to_ndarray()
    mask = open_ds(str(tmp_path / "f.zarr/pseudo_gt_mask")).to_ndarray()
    assert 7 not in out
    assert (out[:, :8, :] == 1).all()
    np.testing.assert_array_equal(mask, (out > 0).astype(np.uint8))


def test_filter_blockwise_with_error_mask(tmp_path):
    seg = np.ones((4, 8, 8), np.uint64)
    prepare_ds(str(tmp_path / "f.zarr/seg"), seg.shape, (0, 0, 0), (1, 1, 1), np.uint64)[
        open_ds(str(tmp_path / "f.zarr/seg")).roi
    ] = seg
    err = np.zeros((4, 8, 8), np.uint8)
    err[:, :, :4] = 1
    eds = prepare_ds(str(tmp_path / "f.zarr/err"), err.shape, (0, 0, 0), (1, 1, 1), np.uint8)
    eds[eds.roi] = err
    filter_segmentation_blockwise(
        str(tmp_path / "f.zarr/seg"),
        str(tmp_path / "f.zarr/labels"),
        str(tmp_path / "f.zarr/mask"),
        error_mask_path=str(tmp_path / "f.zarr/err"),
        block_shape=(4, 8, 8),
        num_workers=1,
    )
    mask = open_ds(str(tmp_path / "f.zarr/mask")).to_ndarray()
    assert (mask[:, :, :4] == 0).all()
    assert (mask[:, :, 4:] == 1).all()


def test_size_filter_standalone():
    seg = np.zeros((8, 8), np.uint64)
    seg[:4, :4] = 1
    seg[7, 7] = 2
    out = size_filter(seg, min_size=4, relabel_cc=False)
    assert 2 not in out and 1 in out


def test_outlier_filter_standalone():
    seg = np.zeros((4, 100), np.uint64)
    for i in range(10):
        seg[0, i * 3 : i * 3 + 2] = i + 1
    seg[1:, :] = 11  # huge outlier
    out = outlier_filter(seg, sigma=2.0, relabel_cc=False)
    assert 11 not in out


def test_run_filter_cli_overrides(tmp_path):
    """bs filter -ro/-rs/-n/-bs parity (reference filter.py:155-193):
    CLI kwargs override the config and restrict the filtered ROI."""
    from click.testing import CliRunner

    from bootstrapper_tpu.cli.main import cli
    from bootstrapper_tpu.utils import tomlio

    seg = np.ones((6, 16, 16), np.uint64)
    ds = prepare_ds(
        str(tmp_path / "f.zarr/seg"), seg.shape, (0, 0, 0), (1, 1, 1),
        np.uint64,
    )
    ds[ds.roi] = seg
    tomlio.dump(
        {"filter": {"vol": {
            "seg_dataset": str(tmp_path / "f.zarr/seg"),
            "out_seg_dataset_prefix": str(tmp_path / "f.zarr/labels"),
            "out_mask_dataset_prefix": str(tmp_path / "f.zarr/mask"),
            "dust_filter": 0,
            "remove_outliers": False,
            "remove_z_fragments": 1,
        }}},
        str(tmp_path / "filter.toml"),
    )
    r = CliRunner().invoke(cli, [
        "filter", str(tmp_path / "filter.toml"),
        "-ro", "2", "0", "0", "-rs", "2", "16", "16",
        "-n", "1", "-bs", "2", "8", "8",
    ])
    assert r.exit_code == 0, r.output
    out = open_ds(str(tmp_path / "f.zarr/labels")).to_ndarray()
    assert out.shape == (2, 16, 16)  # ROI-restricted

    # mismatched ROI flags error out rather than TypeError later
    r = CliRunner().invoke(cli, [
        "filter", str(tmp_path / "filter.toml"), "-ro", "0", "0", "0",
    ])
    assert r.exit_code != 0
