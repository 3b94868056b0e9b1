"""Per-stage prepare subcommands (reference ``prepare.py:239-385``)."""

import os

import numpy as np
import pytest
from click.testing import CliRunner

from bootstrapper_tpu.cli import cli
from bootstrapper_tpu.core.arrays import prepare_ds
from bootstrapper_tpu.utils import tomlio


@pytest.fixture()
def project(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    raw = prepare_ds(
        str(tmp_path / "vol.zarr/raw"), (8, 64, 64), (0, 0, 0),
        (1, 1, 1), np.uint8,
    )
    raw[raw.roi] = np.zeros((8, 64, 64), np.uint8)
    volumes = {
        "vol": {
            "raw_dataset": str(tmp_path / "vol.zarr/raw"),
            "labels_dataset": str(tmp_path / "vol.zarr/raw"),
            "output_container": str(tmp_path / "vol.zarr"),
            "voxel_size": [1, 1, 1],
        }
    }
    tomlio.dump({"volumes": volumes}, str(tmp_path / "volumes.toml"))
    return tmp_path


def run_ok(*args):
    result = CliRunner().invoke(cli, list(args), catch_exceptions=False)
    assert result.exit_code == 0, result.output
    return result


def test_prepare_train_stage(project):
    run_ok("prepare", "model", "3d_affs", "-p", "setups")
    run_ok(
        "prepare", "train", "-v", "volumes.toml",
        "-s", "setups/3d_affs", "--max-iterations", "101",
    )
    cfg = tomlio.load("train_3d_affs.toml")["train"]
    assert cfg["max_iterations"] == 101
    assert cfg["samples"][0]["raw"].endswith("vol.zarr/raw")


def test_prepare_predict_stage(project):
    run_ok("prepare", "model", "3d_affs", "-p", "setups")
    run_ok(
        "prepare", "predict", "-v", "volumes.toml",
        "-s", "setups/3d_affs", "-i", "100",
    )
    cfg = tomlio.load("predict.toml")["predict"]["vol"]
    assert cfg["chain"][0]["checkpoint_iteration"] == 100
    assert cfg["chain"][0]["output_prefix"] == "3d_affs/100"


def test_prepare_predict_bare_refiner_name(project, monkeypatch):
    # a bare *_from_* name materialises the setup and installs the
    # shipped checkpoint (the reference's download-checkpoints flow)
    pre = project / "pre" / "3d_affs_from_2d_lsd"
    pre.mkdir(parents=True)
    with open(pre / "model_checkpoint_7000", "wb") as f:
        np.savez(f, **{"params/x": np.zeros(2), "step": np.asarray(7000)})
    monkeypatch.setenv("BS_PRETRAINED_DIR", str(project / "pre"))
    run_ok(
        "prepare", "predict", "-v", "volumes.toml",
        "-s", "3d_affs_from_2d_lsd",
    )
    cfg = tomlio.load("predict.toml")["predict"]["vol"]
    assert cfg["chain"][0]["checkpoint_iteration"] == 7000
    assert os.path.exists("setups/3d_affs_from_2d_lsd/model_checkpoint_7000")


def test_prepare_segment_evaluate_filter_stages(project):
    run_ok(
        "prepare", "segment", "-v", "volumes.toml",
        "-a", "3d_affs/100", "-m", "mws",
    )
    seg = tomlio.load("segment.toml")["segment"]["vol"]
    assert seg["affs_dataset"].endswith("3d_affs/100/3d_affs")
    assert "mws_params" in seg

    run_ok(
        "prepare", "evaluate", "-v", "volumes.toml",
        "-s", "post/100/segmentations_mws",
        "--gt-labels", "gt.zarr/labels",
    )
    ev = tomlio.load("evaluate.toml")["evaluate"]["vol"]
    assert ev["gt"]["labels_dataset"] == "gt.zarr/labels"

    run_ok(
        "prepare", "filter", "-v", "volumes.toml",
        "-s", "post/100/segmentations_mws", "-r", "round_1",
    )
    fl = tomlio.load("filter.toml")["filter"]["vol"]
    assert "pseudo_gt/round_1/labels" in fl["out_seg_dataset_prefix"]
    nxt = tomlio.load("filter_next_volumes.toml")["volumes"]["vol"]
    assert "pseudo_gt/round_1/labels" in nxt["labels_dataset"]


def test_round_configs_segment_last_affs_link(project, tmp_path):
    """make_round_configs segments the LAST 3d_affs output along the
    chain (reference configs.py:534-542) and refuses chains that never
    produce one."""
    from bootstrapper_tpu.configs import make_round_configs

    volumes = tomlio.load(str(tmp_path / "volumes.toml"))["volumes"]
    paths = make_round_configs(
        str(tmp_path / "round_1"), volumes,
        ["2d_mtlsd", "3d_affs_from_2d_mtlsd"], iterations=[10, 10],
    )
    seg = tomlio.load(paths["segment"])["segment"]["vol"]
    assert seg["affs_dataset"].endswith(
        "3d_affs_from_2d_mtlsd/10--from--2d_mtlsd_10/3d_affs"
    )

    with pytest.raises(ValueError, match="no 3d_affs output"):
        make_round_configs(
            str(tmp_path / "round_bad"), volumes, ["2d_lsd"],
            iterations=[10],
        )
