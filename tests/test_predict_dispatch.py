"""run_prediction predictor selection: the sharded path prefers mesh
z-streaming (one xy column per device, zero redundant z-context compute)
on volumes deep enough and wide enough to fill the mesh, and falls back
to batch-of-tiles SPMD otherwise (reference parity: the multi-GPU daisy
path in ``bootstrapper/predict.py:128-153`` always pays the z context)."""

import json
import os

import numpy as np
import pytest

import jax

from bootstrapper_tpu.configs import create_prediction_configs, setup_models
from bootstrapper_tpu.core.arrays import open_ds, prepare_ds
from bootstrapper_tpu.models import Model
from bootstrapper_tpu.train import create_train_state, save_checkpoint
from bootstrapper_tpu.utils import tomlio
from bootstrapper_tpu.workflows.predict import run_prediction

TINY_3D = dict(
    num_fmaps=2,
    fmap_inc_factor=2,
    input_shape=[24, 48, 48],
    output_shape=[4, 8, 8],
    shape_increase=[0, 0, 0],
    downsample_factors=[[1, 2, 2]] * 2,
    kernel_size_down=[[[3, 3, 3], [3, 3, 3]]] * 3,
    kernel_size_up=[[[3, 3, 3], [3, 3, 3]]] * 2,
)


def _make_setup(tmp_path, shape):
    container = str(tmp_path / "v.zarr")
    raw = prepare_ds(
        f"{container}/raw", shape, (0, 0, 0), (1, 1, 1), np.uint8
    )
    raw[raw.roi] = np.random.default_rng(0).integers(
        0, 255, shape, dtype=np.uint8
    )
    setup_dirs = setup_models(["3d_affs"], str(tmp_path / "setups"))
    p = os.path.join(setup_dirs[0], "net_config.json")
    with open(p) as f:
        nc = json.load(f)
    nc.update(TINY_3D)
    with open(p, "w") as f:
        json.dump(nc, f)
    model = Model.from_setup(setup_dirs[0])
    model.validate_shapes()
    state, _ = create_train_state(model, jax.random.PRNGKey(0))
    save_checkpoint(setup_dirs[0], state, 5)
    volumes = {
        "v": {
            "raw_dataset": f"{container}/raw",
            "voxel_size": [1, 1, 1],
            "output_container": container,
        }
    }
    cfgs = create_prediction_configs(volumes, setup_dirs, [5])
    cfg_path = str(tmp_path / "predict.toml")
    tomlio.dump({"predict": cfgs}, cfg_path)
    return cfg_path, container


def test_plan_stream_invariants():
    from bootstrapper_tpu.models.zoo import get_net_config
    from bootstrapper_tpu.predict.zstream import plan_stream

    nc = get_net_config("3d_affs")
    ctx_xy = nc["input_shape"][1] - nc["output_shape"][1]

    inc, s, sw = plan_stream(nc, (4000, 4000, 4000))
    assert inc[0] == 0 and inc[1] == inc[2]
    assert 1 <= sw <= s <= 64
    # steady-graph budget respected (the planner's own memory model)
    assert (s + 8) * (nc["input_shape"][1] + inc[1]) ** 2 <= 22_000_000

    # min_columns forces smaller xy tiles
    inc8, s8, _ = plan_stream(nc, (4000, 1000, 1000), min_columns=8)
    t = nc["output_shape"][1] + inc8[1]
    assert (-(-1000 // t)) ** 2 >= 8

    # shallow volume: step shrinks so >= 2 steps happen
    _, s_shallow, _ = plan_stream(nc, (40, 2000, 2000))
    assert s_shallow <= 20

    # tile never exceeds the volume xy
    inc_s, _, _ = plan_stream(nc, (500, 300, 300))
    assert nc["output_shape"][1] + inc_s[1] <= 300


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)
def test_sharded_deep_volume_uses_mesh_zstream(tmp_path):
    # deep enough for >= 2 z steps; the stream planner retiles xy so at
    # least one column per device exists
    cfg_path, container = _make_setup(tmp_path, (32, 24, 40))
    res = run_prediction(cfg_path, sharded="batch")
    stats = res["v/3d_affs/5"]
    # zstream selected, mesh filled by columns x z-segments (the
    # round-5 measurement-calibrated cost model prefers WIDE tiles
    # with z-segmented columns here — the huge xy context on shrunken
    # tiles outweighs segment warm overhead; see zplan_ab_probe)
    assert (
        stats["columns"] * stats.get("z_segments", 1)
        >= len(jax.devices())
    )
    assert stats["devices"] == len(jax.devices())
    arr = open_ds(f"{container}/3d_affs/5/3d_affs").to_ndarray()
    assert arr.shape[1:] == (32, 24, 40)
    assert (arr > 0).all()  # full coverage, sigmoid outputs quantized


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)
def test_sharded_deep_narrow_volume_z_segments_the_stream(tmp_path):
    # fewer xy columns (2) than devices but deep z: each column's walk
    # is split into per-device z segments (plan_z_groups) so the mesh
    # stays full with zero-redundant-z streaming instead of falling
    # back to context-recomputing batch-of-tiles (round-3 verdict #6)
    cfg_path, container = _make_setup(tmp_path, (32, 8, 16))
    res = run_prediction(cfg_path, sharded="batch")
    stats = res["v/3d_affs/5"]
    assert stats["columns"] == 2  # zstream selected despite 2 < 8
    assert stats["z_segments"] > 1
    assert stats["columns"] * stats["z_segments"] >= 8 // 2
    assert stats["devices"] == len(jax.devices())
    arr = open_ds(f"{container}/3d_affs/5/3d_affs").to_ndarray()
    assert arr.shape[1:] == (32, 8, 16)
    assert (arr > 0).all()  # full coverage despite segment write clips


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)
def test_sharded_narrow_volume_prefers_wide_tiles_over_column_shrink(
    tmp_path,
):
    # (64,32,32): shrinking xy tiles to 12 would give 9 columns (one
    # per device) but ~19x xy-context overhead; the planner must pick
    # the full-width 32 tile (1 column, ~5x overhead) and fill the
    # mesh by z-segmenting instead
    cfg_path, container = _make_setup(tmp_path, (64, 32, 32))
    res = run_prediction(cfg_path, sharded="batch")
    stats = res["v/3d_affs/5"]
    assert stats["columns"] == 1  # wide tile won the plan comparison
    assert stats["z_segments"] > 1
    arr = open_ds(f"{container}/3d_affs/5/3d_affs").to_ndarray()
    assert arr.shape[1:] == (64, 32, 32)
    assert (arr > 0).all()


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)
def test_sharded_shallow_narrow_volume_falls_back_to_batch_tiles(
    tmp_path,
):
    # 2 xy columns AND shallow z (8 slices, only ~2 tiny steps): even
    # z-segmented streaming can't fill the mesh cheaply — the per-
    # segment warm z-context would dominate — so batch-of-tiles SPMD
    # is used instead
    cfg_path, container = _make_setup(tmp_path, (8, 8, 16))
    res = run_prediction(cfg_path, sharded="batch")
    stats = res["v/3d_affs/5"]
    assert "columns" not in stats  # ShardedPredictor stats
    arr = open_ds(f"{container}/3d_affs/5/3d_affs").to_ndarray()
    assert arr.shape[1:] == (8, 8, 16)
    assert (arr > 0).all()


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)
def test_zstream_plan_env_forces_family(tmp_path, monkeypatch):
    """BS_ZSTREAM_PLAN=narrow forces one-column-per-device plans (the
    operator escape hatch for XLA execution cliffs the static model
    cannot see — round-5 A/B)."""
    monkeypatch.setenv("BS_ZSTREAM_PLAN", "narrow")
    cfg_path, container = _make_setup(tmp_path, (32, 24, 40))
    res = run_prediction(cfg_path, sharded="batch")
    stats = res["v/3d_affs/5"]
    assert stats["columns"] >= len(jax.devices())
    arr = open_ds(f"{container}/3d_affs/5/3d_affs").to_ndarray()
    assert (arr > 0).all()
