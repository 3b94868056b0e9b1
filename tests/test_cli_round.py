"""End-to-end mini round through the CLI: prepare -> train -> predict ->
segment -> evaluate -> filter (the CREMI-example flow at toy scale,
reference ``examples/cremi/README.md``)."""

import json
import os

import numpy as np
import pytest
from click.testing import CliRunner

from bootstrapper_tpu.cli import cli
from bootstrapper_tpu.core.arrays import open_ds, prepare_ds
from bootstrapper_tpu.utils import tomlio

TINY_3D_NET = dict(
    num_fmaps=2,
    fmap_inc_factor=2,
    input_shape=[12, 48, 48],
    output_shape=[4, 8, 8],
    shape_increase=[0, 0, 0],
    downsample_factors=[[1, 2, 2]] * 2,
    kernel_size_down=[
        [[1, 3, 3], [1, 3, 3]],
        [[3, 3, 3], [3, 3, 3]],
        [[3, 3, 3], [3, 3, 3]],
    ],
    kernel_size_up=[[[1, 3, 3], [1, 3, 3]], [[1, 3, 3], [1, 3, 3]]],
)


@pytest.fixture(scope="module")
def project(tmp_path_factory):
    """A tiny volume with two objects + a full round of configs."""
    base = tmp_path_factory.mktemp("round")
    vs = (1, 1, 1)
    shape = (24, 96, 96)
    rng = np.random.default_rng(0)

    labels = np.zeros(shape, np.uint32)
    labels[:, :48, :] = 1
    labels[:, 48:, :] = 2
    # raw: dark boundary band + noise
    raw = np.full(shape, 200, np.float32)
    raw[:, 46:50, :] = 30
    raw += rng.normal(0, 10, shape)
    raw = np.clip(raw, 0, 255).astype(np.uint8)

    container = str(base / "vol.zarr")
    for name, data, dtype in [
        ("raw", raw, np.uint8),
        ("labels", labels, np.uint32),
    ]:
        ds = prepare_ds(f"{container}/{name}", shape, (0, 0, 0), vs, dtype)
        ds[ds.roi] = data

    volumes = {
        "vol": {
            "raw_dataset": f"{container}/raw",
            "labels_dataset": f"{container}/labels",
            "voxel_size": list(vs),
            "output_container": container,
        }
    }
    tomlio.dump({"volumes": volumes}, str(base / "volumes.toml"))

    runner = CliRunner()
    res = runner.invoke(
        cli,
        [
            "prepare",
            "-b", str(base),
            "-v", str(base / "volumes.toml"),
            "-m", "3d_affs",
            "-r", "round_1",
            "--max-iterations", "30",
            "--gt-labels", f"{container}/labels",
        ],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output

    # shrink the materialised net config so CPU training is fast
    nc_path = str(base / "round_1/setups/3d_affs/net_config.json")
    with open(nc_path) as f:
        nc = json.load(f)
    nc.update(TINY_3D_NET)
    nc["outputs"]["3d_affs"]["neighborhood"] = [
        [-1, 0, 0], [0, -1, 0], [0, 0, -1]
    ]
    nc["outputs"]["3d_affs"]["dims"] = 3
    with open(nc_path, "w") as f:
        json.dump(nc, f)
    return {"base": base, "container": container, "runner": runner}


def test_01_prepare_wrote_configs(project):
    base = project["base"]
    for name in [
        "01_train_3d_affs.toml",
        "02_predict.toml",
        "03_segment.toml",
        "04_evaluate.toml",
        "05_filter.toml",
    ]:
        assert (base / "round_1" / name).exists()


def test_02_train(project):
    base, runner = project["base"], project["runner"]
    res = runner.invoke(
        cli,
        ["train", str(base / "round_1/01_train_3d_affs.toml")],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    assert (base / "round_1/setups/3d_affs/model_checkpoint_30").exists()
    log = base / "round_1/setups/3d_affs/log/loss.jsonl"
    assert log.exists()


def test_03_predict(project):
    base, runner = project["base"], project["runner"]
    res = runner.invoke(
        cli,
        ["predict", str(base / "round_1/02_predict.toml"), "-b", "4"],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    affs = open_ds(f"{project['container']}/3d_affs/29/3d_affs")
    assert affs.shape[0] == 3
    data = affs.to_ndarray()
    assert data.max() > 0  # wrote something


def test_04_segment(project):
    base, runner = project["base"], project["runner"]
    res = runner.invoke(
        cli,
        [
            "segment", str(base / "round_1/03_segment.toml"),
            "-m", "ws", "-p", "thresholds=[0.5]",
        ],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    seg_dir = f"{project['container']}/post/29/segmentations_ws"
    assert os.path.isdir(seg_dir)


def test_05_evaluate(project):
    base, runner = project["base"], project["runner"]
    res = runner.invoke(
        cli,
        ["evaluate", str(base / "round_1/04_evaluate.toml")],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    results_json = f"{project['container']}/eval/vol_results.json"
    assert os.path.exists(results_json)
    with open(results_json) as f:
        results = json.load(f)
    assert results
    entry = next(iter(results.values()))
    assert "voi" in entry and "voi_sum" in entry["voi"]


def test_06_filter(project):
    base, runner = project["base"], project["runner"]
    res = runner.invoke(
        cli,
        ["filter", str(base / "round_1/05_filter.toml")],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    labels = open_ds(f"{project['container']}/pseudo_gt/round_1/labels")
    mask = open_ds(f"{project['container']}/pseudo_gt/round_1/mask")
    assert labels.shape == mask.shape
    # next-round volumes file exists for round chaining
    assert (base / "round_1/next_volumes.toml").exists()


def test_07_run_dispatcher(project):
    """`bs run` must route a segment config to the segment workflow."""
    base, runner = project["base"], project["runner"]
    res = runner.invoke(
        cli,
        ["run", str(base / "round_1/03_segment.toml")],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output


def test_08_view_text_summary(project):
    runner = project["runner"]
    res = runner.invoke(
        cli, ["view", project["container"]], catch_exceptions=False
    )
    assert res.exit_code == 0
    assert "raw" in res.output


def test_09_round_chaining(project):
    """Round 2 prepares from round 1's filtered pseudo-GT and trains."""
    base, runner = project["base"], project["runner"]
    res = runner.invoke(
        cli,
        [
            "prepare",
            "-b", str(base),
            "-v", str(base / "round_1/next_volumes.toml"),
            "-m", "3d_affs",
            "-r", "round_2",
            "--max-iterations", "3",
        ],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    cfg = tomlio.load(str(base / "round_2/01_train_3d_affs.toml"))["train"]
    # samples now point at the pseudo-GT labels + mask
    assert "pseudo_gt" in cfg["samples"][0]["labels"]
    assert "pseudo_gt" in cfg["samples"][0]["mask"]

    # shrink the new setup's net config and train a couple of steps
    nc_path = str(base / "round_2/setups/3d_affs/net_config.json")
    with open(nc_path) as f:
        nc = json.load(f)
    nc.update(TINY_3D_NET)
    nc["outputs"]["3d_affs"]["neighborhood"] = [
        [-1, 0, 0], [0, -1, 0], [0, 0, -1]
    ]
    nc["outputs"]["3d_affs"]["dims"] = 3
    with open(nc_path, "w") as f:
        json.dump(nc, f)
    res = runner.invoke(
        cli,
        ["train", str(base / "round_2/01_train_3d_affs.toml")],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    assert (base / "round_2/setups/3d_affs/model_checkpoint_3").exists()


def test_10_no_gt_round_uses_self_eval(project, tmp_path):
    """Without --gt-labels the eval config scores by prediction errors."""
    base, runner = project["base"], project["runner"]
    res = runner.invoke(
        cli,
        [
            "prepare",
            "-b", str(tmp_path),
            "-v", str(base / "volumes.toml"),
            "-m", "3d_affs",
            "-r", "nogt",
            "--max-iterations", "5",
        ],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    ev = tomlio.load(str(tmp_path / "nogt/04_evaluate.toml"))["evaluate"]["vol"]
    assert "pred" in ev
    assert "aff_neighborhood" in ev["pred"]["params"]
    assert ev["pred"]["pred_dataset"].endswith("3d_affs/4/3d_affs")


def test_11_run_directory_mode(project, tmp_path):
    """`bs run <round_dir>` executes the numbered configs in order
    (here: just the segment + evaluate + filter tail of round_1)."""
    base, runner = project["base"], project["runner"]
    import shutil
    d = tmp_path / "tail"
    d.mkdir()
    for f in ["03_segment.toml", "04_evaluate.toml", "05_filter.toml"]:
        shutil.copy(base / "round_1" / f, d / f)
    res = runner.invoke(cli, ["run", str(d)], catch_exceptions=False)
    assert res.exit_code == 0, res.output


def test_install_pretrained(tmp_path, monkeypatch):
    """Refiner setups pick up shipped checkpoints (the reference's
    download-checkpoints UX, configs.py:354-382, without the network)."""
    import numpy as np

    from bootstrapper_tpu import configs

    pre = tmp_path / "pretrained" / "3d_affs_from_2d_lsd"
    pre.mkdir(parents=True)
    with open(pre / "model_checkpoint_1234", "wb") as f:
        np.savez(f, **{"params/unet/x": np.zeros(3), "step": np.asarray(1234)})
    monkeypatch.setenv(configs.PRETRAINED_ENV, str(tmp_path / "pretrained"))

    dirs = configs.setup_models(
        ["3d_affs_from_2d_lsd", "3d_affs"], str(tmp_path / "setups")
    )
    assert os.path.exists(
        os.path.join(dirs[0], "model_checkpoint_1234")
    )
    # non-refiner setups get no checkpoint
    assert not any(
        n.startswith("model_checkpoint") for n in os.listdir(dirs[1])
    )

    from bootstrapper_tpu.train.loop import load_params

    params = load_params(os.path.join(dirs[0], "model_checkpoint_1234"))
    assert params["unet"]["x"].shape == (3,)
