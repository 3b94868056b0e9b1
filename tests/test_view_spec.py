"""Headless viewer parity: coordinate spaces, RGB/RG shader selection,
layer typing, and snapshot grouping (reference ``bootstrapper/view.py``
48-186), unit-tested without neuroglancer."""

import os

import numpy as np

from bootstrapper_tpu.cli.view_spec import (
    RGB_SHADER,
    RG_SHADER,
    coordinate_space,
    dataset_layer,
    detect_2d,
    is_segmentation,
    shader_for,
    snapshot_view_spec,
)


class TestDetect2D:
    def test_2d_batch_snapshot(self):
        # 2D nets snapshot (b, c, 1, y, x) predictions with (b, c, y, x) raw
        assert detect_2d((2, 3, 64, 64), (2, 6, 1, 64, 64)) is True

    def test_3d_snapshot_with_real_z(self):
        assert detect_2d((2, 1, 12, 64, 64), (2, 9, 12, 64, 64)) is False

    def test_4d_single_channel_raw_is_3d(self):
        assert detect_2d((1, 12, 64, 64), (3, 12, 64, 64)) is False

    def test_4d_differing_shapes_is_2d(self):
        assert detect_2d((2, 3, 64, 64), (2, 6, 64, 64)) is True

    def test_3d_volume(self):
        assert detect_2d((12, 64, 64), (12, 64, 64)) is False


class TestCoordinateSpace:
    def test_3d(self):
        cs = coordinate_space([50, 8, 8], is_2d=False)
        assert cs.names == ["c^", "z", "y", "x"]
        assert cs.scales == [1, 50, 8, 8]
        assert cs.units == "nm"

    def test_2d_doubles_xy(self):
        cs = coordinate_space([50, 8, 8], is_2d=True)
        assert cs.names == ["b", "c^", "y", "x"]
        assert cs.scales == [8, 8, 8, 8]


class TestShaders:
    def test_3d_everything_rgb(self):
        for ds in ("raw", "pred_affs", "gt_lsds"):
            assert shader_for(ds, is_2d=False) == RGB_SHADER

    def test_2d_raw_rgb_preds_rg(self):
        assert shader_for("raw", is_2d=True) == RGB_SHADER
        assert shader_for("pred_affs", is_2d=True) == RG_SHADER

    def test_segmentation_naming(self):
        assert is_segmentation("labels")
        assert is_segmentation("seg_mean_0_5")
        assert not is_segmentation("pred_affs")


class TestDatasetLayer:
    def test_2d_pred_squeezes_singleton_z(self):
        layer = dataset_layer(
            "pred_affs", (2, 3, 1, 64, 64), [50, 8, 8], [100, 16, 16],
            is_2d=True,
        )
        assert layer.squeeze_axis == 2
        # offset loses z, converts to voxels, pads (b, c)
        assert layer.voxel_offset == [0, 0, 2, 2]
        assert layer.shader == RG_SHADER

    def test_2d_raw_keeps_shape(self):
        layer = dataset_layer(
            "raw", (2, 3, 64, 64), [50, 8, 8], [100, 16, 16], is_2d=True,
        )
        assert layer.squeeze_axis is None
        assert layer.shader == RGB_SHADER

    def test_2d_raw_offset_trims_z_with_voxel_size(self):
        # regression: the z entry must be dropped from offset AND voxel
        # size together, else (z_off, vy) pairs and x is dropped
        layer = dataset_layer(
            "raw", (2, 3, 64, 64), [50, 8, 8], [100, 16, 16], is_2d=True,
        )
        assert layer.voxel_offset == [0, 0, 2, 2]

    def test_3d_offset_in_voxels(self):
        layer = dataset_layer(
            "pred_affs", (9, 12, 64, 64), [50, 8, 8], [100, 16, 16],
            is_2d=False,
        )
        assert layer.voxel_offset == [0, 2, 2, 2]
        assert layer.kind == "image"

    def test_label_dataset_is_segmentation_without_shader(self):
        layer = dataset_layer(
            "gt_labels", (12, 64, 64), [50, 8, 8], [0, 0, 0], is_2d=False,
        )
        assert layer.kind == "segmentation"
        assert layer.shader is None


def test_snapshot_spec_groups_layers():
    datasets = {
        "raw": ((2, 1, 12, 64, 64), [50, 8, 8], [0, 0, 0]),
        "gt_affs": ((2, 9, 12, 64, 64), [50, 8, 8], [0, 0, 0]),
        "pred_affs": ((2, 9, 12, 64, 64), [50, 8, 8], [0, 0, 0]),
        "gt_labels": ((2, 1, 12, 64, 64), [50, 8, 8], [0, 0, 0]),
    }
    spec = snapshot_view_spec(datasets)
    assert spec.is_2d is False
    assert spec.layout == "yz"
    assert [l.name for l in spec.layers] == list(datasets)
    kinds = {l.name: l.kind for l in spec.layers}
    assert kinds["gt_labels"] == "segmentation"
    assert kinds["pred_affs"] == "image"
    shaders = {l.name: l.shader for l in spec.layers}
    assert shaders["raw"] == RGB_SHADER and shaders["gt_labels"] is None


def test_snapshot_spec_detects_2d_with_raw_first():
    """Regression: snapshot_metadata moves ``raw`` to the front, so the
    2D check must compare raw against a PREDICTION dataset — comparing
    raw with itself never fires (the production ``bs view --snapshot``
    path was stuck 3D for every 2D setup)."""
    datasets = {
        "raw": ((2, 3, 64, 64), [50, 8, 8], [0, 0, 0]),
        "pred_affs": ((2, 6, 1, 64, 64), [50, 8, 8], [0, 0, 0]),
        "gt_affs": ((2, 6, 1, 64, 64), [50, 8, 8], [0, 0, 0]),
    }
    spec = snapshot_view_spec(datasets)
    assert spec.is_2d is True
    assert spec.dims.names == ["b", "c^", "y", "x"]
    layers = {l.name: l for l in spec.layers}
    assert layers["pred_affs"].squeeze_axis == 2
    assert layers["pred_affs"].shader == RG_SHADER
    assert layers["raw"].shader == RGB_SHADER


def test_snapshot_spec_raw_only_container():
    spec = snapshot_view_spec(
        {"raw": ((12, 64, 64), [50, 8, 8], [0, 0, 0])}
    )
    assert spec.is_2d is False


def test_snapshot_spec_from_real_snapshot(tmp_path):
    """End-to-end over an actual training snapshot container: the
    metadata walker + spec builder agree with the on-disk layout."""
    from bootstrapper_tpu.cli.viewer import snapshot_metadata
    from bootstrapper_tpu.core.arrays import prepare_ds

    container = str(tmp_path / "batch_10.zarr")
    for name, shape in [
        ("input", (1, 12, 64, 64)),
        ("pred_affs", (9, 12, 64, 64)),
        ("gt_affs", (9, 12, 64, 64)),
    ]:
        ds = prepare_ds(
            os.path.join(container, name), shape,
            (0,) * (len(shape) - 1), (1,) * (len(shape) - 1), np.float32,
        )
    meta = snapshot_metadata(container)
    assert set(meta) == {"input", "pred_affs", "gt_affs"}
    spec = snapshot_view_spec(meta)
    assert not spec.is_2d
    assert len(spec.layers) == 3



