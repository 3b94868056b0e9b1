import numpy as np
import pytest
from click.testing import CliRunner

from bootstrapper_tpu.cli import cli
from bootstrapper_tpu.core.arrays import open_ds, prepare_ds


@pytest.fixture
def runner():
    return CliRunner()


def _vol(tmp_path, name="x", shape=(4, 16, 16), dtype=np.uint8, data=None):
    ds = prepare_ds(str(tmp_path / f"u.zarr/{name}"), shape, (0, 0, 0), (1, 1, 1), dtype)
    if data is None:
        data = np.random.default_rng(0).integers(0, 255, shape).astype(dtype)
    ds[ds.roi] = data
    return str(tmp_path / f"u.zarr/{name}")


def test_utils_bbox_cli(tmp_path, runner):
    data = np.zeros((4, 16, 16), np.uint8)
    data[1:3, 4:9, 5:10] = 7
    src = _vol(tmp_path, data=data)
    res = runner.invoke(
        cli, ["utils", "bbox", src, str(tmp_path / "u.zarr/c")],
        catch_exceptions=False,
    )
    assert res.exit_code == 0
    assert open_ds(str(tmp_path / "u.zarr/c")).spatial_shape == (2, 5, 5)


def test_utils_mask_cli(tmp_path, runner):
    data = np.zeros((4, 16, 16), np.uint64)
    data[:, :8] = 3
    src = _vol(tmp_path, dtype=np.uint64, data=data)
    res = runner.invoke(
        cli, ["utils", "mask", src, str(tmp_path / "u.zarr/m"), "-m", "obj",
              "-n", "1"],
        catch_exceptions=False,
    )
    assert res.exit_code == 0
    m = open_ds(str(tmp_path / "u.zarr/m")).to_ndarray()
    np.testing.assert_array_equal(m, (data > 0).astype(np.uint8))


def test_utils_merge_cli(tmp_path, runner):
    data = np.array([[[1, 2], [3, 4]]], np.uint64)
    src = _vol(tmp_path, shape=(1, 2, 2), dtype=np.uint64, data=data)
    res = runner.invoke(
        cli, ["utils", "merge", src, str(tmp_path / "u.zarr/mg"),
              "-p", "1,2", "-n", "1"],
        catch_exceptions=False,
    )
    assert res.exit_code == 0
    out = open_ds(str(tmp_path / "u.zarr/mg")).to_ndarray()
    assert out[0, 0, 0] == out[0, 0, 1]


def test_utils_scale_pyramid_cli(tmp_path, runner):
    src = _vol(tmp_path, shape=(4, 16, 16))
    res = runner.invoke(
        cli, ["utils", "scale-pyramid", src, "-s", "1", "--image"],
        catch_exceptions=False,
    )
    assert res.exit_code == 0


def test_utils_download_ckpts_missing_setup_message(runner, monkeypatch,
                                                    tmp_path):
    # no shipped artefact for this name -> advises local training
    monkeypatch.setenv("BS_PRETRAINED_DIR", str(tmp_path / "empty"))
    res = runner.invoke(
        cli,
        ["utils", "download-ckpts", "3d_affs_from_2d_lsd",
         str(tmp_path / "setups" / "x")],
        catch_exceptions=False,
    )
    assert res.exit_code == 0
    assert "no shipped checkpoint" in res.output


def test_view_text_inspector(tmp_path):
    """bs view falls back to the text inspector without neuroglancer
    (reference view.py capability, headless path)."""
    import numpy as np
    from click.testing import CliRunner

    from bootstrapper_tpu.cli import cli
    from bootstrapper_tpu.core.arrays import prepare_ds

    ds = prepare_ds(
        str(tmp_path / "v.zarr/labels"), (4, 16, 16), (0, 0, 0),
        (40, 4, 4), np.uint64,
    )
    ds[ds.roi] = np.arange(4 * 16 * 16).reshape(4, 16, 16).astype(np.uint64)
    result = CliRunner().invoke(
        cli, ["view", str(tmp_path / "v.zarr")], catch_exceptions=False
    )
    assert result.exit_code == 0, result.output
    assert "shape=(4, 16, 16)" in result.output
    assert "voxel_size=(40, 4, 4)" in result.output


def test_download_ckpts_installs_shipped(tmp_path):
    """bs utils download-ckpts installs the shipped release checkpoint
    (reference download_checkpoints UX, offline)."""
    from click.testing import CliRunner

    from bootstrapper_tpu.cli import cli

    result = CliRunner().invoke(
        cli,
        ["utils", "download-ckpts", "3d_affs_from_2d_lsd",
         str(tmp_path / "setup")],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    assert "installed" in result.output
    import os

    assert any(
        n.startswith("model_checkpoint")
        for n in os.listdir(tmp_path / "setup")
    )
