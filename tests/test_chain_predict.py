"""Chained prediction: 2d_mtlsd -> 3d_affs_from_2d_mtlsd (the reference's
flagship model chain, ``configs.py:198-217``, ``predict.py:144-153``) at
toy scale, including synthetic training of the refiner."""

import json
import os

import numpy as np
import pytest

import jax

from bootstrapper_tpu.configs import create_prediction_configs, setup_models
from bootstrapper_tpu.core.arrays import open_ds, prepare_ds
from bootstrapper_tpu.models import Model
from bootstrapper_tpu.train import create_train_state, make_train_step, save_checkpoint
from bootstrapper_tpu.utils import tomlio
from bootstrapper_tpu.workflows.predict import run_prediction

TINY_2D = dict(
    num_fmaps=2,
    fmap_inc_factor=2,
    input_shape=[48, 48],
    output_shape=[8, 8],
    shape_increase=[0, 0],
    downsample_factors=[[2, 2]] * 2,
    kernel_size_down=[[[3, 3], [3, 3]]] * 3,
    kernel_size_up=[[[3, 3], [3, 3]]] * 2,
)
TINY_FROM = dict(
    num_fmaps=2,
    fmap_inc_factor=2,
    input_shape=[12, 48, 48],
    output_shape=[4, 8, 8],
    shape_increase=[0, 0, 0],
    downsample_factors=[[1, 2, 2]] * 2,
    kernel_size_down=[[[1, 3, 3], [1, 3, 3]], [[3, 3, 3], [3, 3, 3]],
                      [[3, 3, 3], [3, 3, 3]]],
    kernel_size_up=[[[1, 3, 3], [1, 3, 3]], [[1, 3, 3], [1, 3, 3]]],
)


def _shrink(setup_dir, tiny):
    path = os.path.join(setup_dir, "net_config.json")
    with open(path) as f:
        nc = json.load(f)
    nc.update(tiny)
    with open(path, "w") as f:
        json.dump(nc, f)
    return nc


def test_chain_2d_mtlsd_to_3d_affs(tmp_path):
    vs = (1, 1, 1)
    shape = (20, 80, 80)
    container = str(tmp_path / "v.zarr")
    raw = prepare_ds(f"{container}/raw", shape, (0, 0, 0), vs, np.uint8)
    raw[raw.roi] = np.random.default_rng(0).integers(
        0, 255, shape, dtype=np.uint8
    )

    setup_dirs = setup_models(
        ["2d_mtlsd", "3d_affs_from_2d_mtlsd"], str(tmp_path / "setups")
    )
    _shrink(setup_dirs[0], TINY_2D)
    _shrink(setup_dirs[1], TINY_FROM)

    # untrained-but-valid checkpoints for both setups
    for d in setup_dirs:
        model = Model.from_setup(d)
        model.validate_shapes()
        state, tx = create_train_state(model, jax.random.PRNGKey(0))
        save_checkpoint(d, state, 5)

    volumes = {
        "v": {
            "raw_dataset": f"{container}/raw",
            "voxel_size": list(vs),
            "output_container": container,
        }
    }
    cfgs = create_prediction_configs(volumes, setup_dirs, [5, 5])
    cfg_path = str(tmp_path / "predict.toml")
    tomlio.dump({"predict": cfgs}, cfg_path)

    results = run_prediction(cfg_path, batch_tiles=2)

    # stage 1 outputs: 2d lsds + affs stacked into 3D volumes
    lsds = open_ds(f"{container}/2d_mtlsd/5/2d_lsds")
    affs2d = open_ds(f"{container}/2d_mtlsd/5/2d_affs")
    assert lsds.shape[0] == 6 and affs2d.shape[0] == 6
    assert lsds.spatial_shape == shape

    # stage 2: refiner consumed both and wrote 9-channel 3d affs with
    # the chain-encoded dataset name
    chained = f"{container}/3d_affs_from_2d_mtlsd/5--from--2d_mtlsd_5/3d_affs"
    affs3d = open_ds(chained)
    assert affs3d.shape[0] == 9
    assert (affs3d.to_ndarray() > 0).any()
    assert len(results) == 2


def test_align_chain_inputs_reorders_by_name(tmp_path):
    """A reordered input_datasets list must be matched to the model's
    declared inputs by name — positional concat would silently swap
    same-width channel groups (6 lsds + 6 affs)."""
    from types import SimpleNamespace

    from bootstrapper_tpu.workflows.predict import _align_chain_inputs

    model = SimpleNamespace(
        net_config={
            "inputs": {"2d_lsds": {"dims": 6}, "2d_affs": {"dims": 6}}
        }
    )
    lsds = prepare_ds(
        str(tmp_path / "v.zarr/2d_lsds"), (6, 4, 8, 8), (0, 0, 0),
        (1, 1, 1), np.float32,
    )
    affs = prepare_ds(
        str(tmp_path / "v.zarr/2d_affs"), (6, 4, 8, 8), (0, 0, 0),
        (1, 1, 1), np.float32,
    )
    # user listed affs first; model wants lsds first
    arrays, labels = _align_chain_inputs(
        model, [affs, lsds],
        [str(tmp_path / "v.zarr/2d_affs"), str(tmp_path / "v.zarr/2d_lsds")],
    )
    assert arrays[0] is lsds and arrays[1] is affs
    assert labels[0].endswith("2d_lsds")


def test_align_chain_inputs_rejects_wrong_widths(tmp_path):
    from types import SimpleNamespace

    from bootstrapper_tpu.workflows.predict import _align_chain_inputs

    model = SimpleNamespace(
        net_config={
            "inputs": {"3d_lsds": {"dims": 10}, "3d_affs": {"dims": 9}}
        }
    )
    a = prepare_ds(
        str(tmp_path / "v.zarr/a"), (6, 4, 8, 8), (0, 0, 0),
        (1, 1, 1), np.float32,
    )
    b = prepare_ds(
        str(tmp_path / "v.zarr/b"), (6, 4, 8, 8), (0, 0, 0),
        (1, 1, 1), np.float32,
    )
    with pytest.raises(ValueError, match="channel widths"):
        _align_chain_inputs(
            model, [a, b],
            [str(tmp_path / "v.zarr/a"), str(tmp_path / "v.zarr/b")],
        )


def test_align_chain_inputs_selects_subset_by_name(tmp_path):
    """A refiner declaring ONE input must pick it out of a longer
    input_datasets list by name (2d_mtlsd -> 3d_affs_from_2d_affs:
    the previous setup outputs lsds AND affs)."""
    from types import SimpleNamespace

    from bootstrapper_tpu.workflows.predict import _align_chain_inputs

    model = SimpleNamespace(
        net_config={"inputs": {"2d_affs": {"dims": 6}}}
    )
    lsds = prepare_ds(
        str(tmp_path / "v.zarr/2d_lsds"), (6, 4, 8, 8), (0, 0, 0),
        (1, 1, 1), np.float32,
    )
    affs = prepare_ds(
        str(tmp_path / "v.zarr/2d_affs"), (6, 4, 8, 8), (0, 0, 0),
        (1, 1, 1), np.float32,
    )
    arrays, labels = _align_chain_inputs(
        model, [lsds, affs],
        [str(tmp_path / "v.zarr/2d_lsds"), str(tmp_path / "v.zarr/2d_affs")],
    )
    assert len(arrays) == 1 and arrays[0] is affs
    assert labels[0].endswith("2d_affs")


def test_align_chain_inputs_rejects_unmatchable_count(tmp_path):
    from types import SimpleNamespace

    from bootstrapper_tpu.workflows.predict import _align_chain_inputs

    model = SimpleNamespace(
        net_config={"inputs": {"2d_affs": {"dims": 6}}}
    )
    a = prepare_ds(
        str(tmp_path / "v.zarr/x"), (6, 4, 8, 8), (0, 0, 0),
        (1, 1, 1), np.float32,
    )
    b = prepare_ds(
        str(tmp_path / "v.zarr/y"), (6, 4, 8, 8), (0, 0, 0),
        (1, 1, 1), np.float32,
    )
    with pytest.raises(ValueError, match="matched by name"):
        _align_chain_inputs(
            model, [a, b],
            [str(tmp_path / "v.zarr/x"), str(tmp_path / "v.zarr/y")],
        )


def test_prediction_config_filters_chain_inputs_to_declared(tmp_path):
    """create_prediction_configs must feed a refiner only its DECLARED
    inputs: 2d_mtlsd outputs lsds+affs but 3d_affs_from_2d_affs takes
    only 2d_affs (reference matches by name, predict.py:246-265)."""
    setup_dirs = setup_models(
        ["2d_mtlsd", "3d_affs_from_2d_affs"], str(tmp_path / "setups")
    )
    volumes = {
        "v": {
            "raw_dataset": "c.zarr/raw",
            "voxel_size": [1, 1, 1],
            "output_container": "c.zarr",
        }
    }
    cfgs = create_prediction_configs(volumes, setup_dirs, [5, 5])
    link = cfgs["v"]["chain"][1]
    assert link["input_datasets"] == ["c.zarr/2d_mtlsd/5/2d_affs"]


def test_chain_refiner_zstreams_deep_volume(tmp_path, monkeypatch):
    """On a deep volume the chained REFINER stage z-streams with its
    two chained input datasets (6-ch lsds + 6-ch affs read per step)
    and matches the tiled chain output up to bf16 cross-executable
    noise — the multi-input streaming path the CREMI-scale round runs
    in production."""
    vs = (1, 1, 1)
    shape = (40, 40, 40)  # deep vs the tiny refiner's 4-slice z out
    outputs = {}
    for mode in ("1", "0"):  # z-stream on / tiled
        monkeypatch.setenv("BS_ZSTREAM", mode)
        container = str(tmp_path / f"v{mode}.zarr")
        raw = prepare_ds(
            f"{container}/raw", shape, (0, 0, 0), vs, np.uint8
        )
        raw[raw.roi] = np.random.default_rng(0).integers(
            0, 255, shape, dtype=np.uint8
        )
        setup_dirs = setup_models(
            ["2d_mtlsd", "3d_affs_from_2d_mtlsd"],
            str(tmp_path / f"setups{mode}"),
        )
        _shrink(setup_dirs[0], TINY_2D)
        _shrink(setup_dirs[1], TINY_FROM)
        for d in setup_dirs:
            model = Model.from_setup(d)
            model.validate_shapes()
            state, tx = create_train_state(model, jax.random.PRNGKey(0))
            save_checkpoint(d, state, 5)
        volumes = {
            "v": {
                "raw_dataset": f"{container}/raw",
                "voxel_size": list(vs),
                "output_container": container,
            }
        }
        cfgs = create_prediction_configs(volumes, setup_dirs, [5, 5])
        cfg_path = str(tmp_path / f"predict{mode}.toml")
        tomlio.dump({"predict": cfgs}, cfg_path)
        results = run_prediction(cfg_path)
        refiner_stats = results[
            "v/3d_affs_from_2d_mtlsd/5--from--2d_mtlsd_5"
        ]
        if mode == "1":
            assert "columns" in refiner_stats  # streamed
        else:
            assert "columns" not in refiner_stats  # tiled
        outputs[mode] = open_ds(
            f"{container}/3d_affs_from_2d_mtlsd/5--from--2d_mtlsd_5"
            "/3d_affs"
        ).to_ndarray().astype(np.int16)
    monkeypatch.delenv("BS_ZSTREAM")
    diff = np.abs(outputs["1"] - outputs["0"])
    assert diff.max() <= 20  # bf16 cross-executable noise only
    assert diff.mean() < 1.0
