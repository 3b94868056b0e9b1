import numpy as np
import jax
import pytest

from bootstrapper_tpu.core.arrays import prepare_ds
from bootstrapper_tpu.core.geometry import Coordinate, Roi
from bootstrapper_tpu.models import Model
from bootstrapper_tpu.predict.scan import (
    Predictor,
    prepare_prediction_outputs,
    tile_rois,
)


def test_tile_rois_exact_cover():
    total = Roi((0, 0), (100, 60))
    tiles = tile_rois(total, Coordinate(40, 30))
    # tiles cover the roi and all are full-size
    assert all(t.shape == Coordinate(40, 30) for t in tiles)
    covered = np.zeros((100, 60), bool)
    for t in tiles:
        sl = t.to_slices()
        covered[sl] = True
    assert covered.all()
    # edge tiles shifted inward, never out of bounds
    assert all(total.contains(t) for t in tiles)


def _tiny_3d_model():
    nc = dict(Model.from_setup("3d_affs").net_config)
    nc.update(
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
    nc["outputs"] = {
        "3d_affs": {
            "dtype": "uint8",
            "dims": 3,
            "neighborhood": [[-1, 0, 0], [0, -1, 0], [0, 0, -1]],
            "grow_boundary": 1,
        }
    }
    m = Model(nc)
    m.validate_shapes()
    return m


def test_predict_3d_roundtrip(tmp_path):
    vs = (40, 4, 4)
    shape = (16, 32, 32)
    raw = prepare_ds(str(tmp_path / "t.zarr/raw"), shape, (0, 0, 0), vs, np.uint8)
    rng = np.random.default_rng(0)
    raw[raw.roi] = rng.integers(0, 255, shape, dtype=np.uint8)

    model = _tiny_3d_model()
    params = model.init(jax.random.PRNGKey(0))
    pred = Predictor(model, params, vs, batch_tiles=2)
    outs = prepare_prediction_outputs(
        str(tmp_path / "t.zarr"), model, raw.roi, vs, predictor=pred
    )
    stats = pred.predict(raw, outs)
    assert stats["tiles"] > 0

    affs = outs["3d_affs"].to_ndarray()
    assert affs.shape == (3, 16, 32, 32)
    # every voxel written (sigmoid of random net ~ never exactly 0 everywhere)
    assert (affs > 0).mean() > 0.5


def test_predict_deterministic_tiling(tmp_path):
    """Overlapping edge tiles must produce consistent values (same model,
    same input): re-running prediction gives identical output."""
    vs = (40, 4, 4)
    shape = (12, 40, 40)
    raw = prepare_ds(str(tmp_path / "t.zarr/raw"), shape, (0, 0, 0), vs, np.uint8)
    raw[raw.roi] = np.random.default_rng(1).integers(0, 255, shape, dtype=np.uint8)

    model = _tiny_3d_model()
    params = model.init(jax.random.PRNGKey(0))
    pred = Predictor(model, params, vs, batch_tiles=3)
    outs1 = prepare_prediction_outputs(
        str(tmp_path / "a.zarr"), model, raw.roi, vs, predictor=pred
    )
    pred.predict(raw, outs1)
    outs2 = prepare_prediction_outputs(
        str(tmp_path / "b.zarr"), model, raw.roi, vs, predictor=pred
    )
    pred.predict(raw, outs2)
    np.testing.assert_array_equal(
        outs1["3d_affs"].to_ndarray(), outs2["3d_affs"].to_ndarray()
    )


def test_predict_2d_stacked(tmp_path):
    vs = (50, 8, 8)
    shape = (6, 32, 32)
    raw = prepare_ds(str(tmp_path / "t.zarr/raw"), shape, (0, 0, 0), vs, np.uint8)
    raw[raw.roi] = np.random.default_rng(2).integers(0, 255, shape, dtype=np.uint8)

    nc = dict(Model.from_setup("2d_affs").net_config)
    nc.update(
        num_fmaps=2,
        fmap_inc_factor=2,
        input_shape=[48, 48],
        output_shape=[8, 8],
        shape_increase=[0, 0],
        downsample_factors=[[2, 2]] * 2,
        kernel_size_down=[[[3, 3], [3, 3]]] * 3,
        kernel_size_up=[[[3, 3], [3, 3]]] * 2,
    )
    nc["outputs"] = {
        "2d_affs": {
            "dtype": "uint8",
            "dims": 2,
            "neighborhood": [[-1, 0], [0, -1]],
            "grow_boundary": 1,
        }
    }
    model = Model(nc)
    model.validate_shapes()
    params = model.init(jax.random.PRNGKey(0))
    pred = Predictor(model, params, vs, batch_tiles=2)
    assert pred.input_tile == (3, 48, 48)
    assert pred.output_tile == (1, 8, 8)
    outs = prepare_prediction_outputs(
        str(tmp_path / "t.zarr"), model, raw.roi, vs, predictor=pred
    )
    pred.predict(raw, outs)
    affs = outs["2d_affs"].to_ndarray()
    assert affs.shape == (2, 6, 32, 32)
    assert (affs > 0).mean() > 0.5


def test_auto_shape_increase():
    from bootstrapper_tpu.models import Model
    from bootstrapper_tpu.predict.scan import auto_shape_increase

    nc = Model.from_setup("3d_affs").net_config
    # big volume: z grows to 124 output slices, y/x grow to the budget —
    # the auto tile must land on the measured-best (152,540,540) class
    inc = auto_shape_increase(nc, (200, 2000, 2000))
    in_shape = [a + b for a, b in zip(nc["input_shape"], inc)]
    out_shape = [a + b for a, b in zip(nc["output_shape"], inc)]
    assert out_shape[0] == 124
    import numpy as np
    assert np.prod(in_shape) <= 45_000_000
    assert in_shape == [152, 540, 540]
    # the chosen shape must be conv-valid
    from bootstrapper_tpu.models import Model as M
    from bootstrapper_tpu.models.unet import compute_output_shape
    m = M.from_setup("3d_affs")
    assert list(compute_output_shape(m.unet_config, in_shape)) == out_shape

    # small volume: tile must not exceed it
    inc2 = auto_shape_increase(nc, (40, 150, 150))
    out2 = [a + b for a, b in zip(nc["output_shape"], inc2)]
    assert all(o <= v for o, v in zip(out2, (40, 150, 150)))


def test_setup_id_without_input_datasets_rejected(tmp_path):
    """--setup-id selecting a non-first chain link that lacks
    input_datasets must error: earlier links were skipped, so the model
    would silently run on raw instead of its real inputs."""
    import numpy as np
    import pytest

    from bootstrapper_tpu.core.arrays import prepare_ds
    from bootstrapper_tpu.utils import tomlio
    from bootstrapper_tpu.workflows.predict import run_prediction

    container = str(tmp_path / "v.zarr")
    raw = prepare_ds(
        f"{container}/raw", (8, 16, 16), (0, 0, 0), (1, 1, 1), np.uint8
    )
    raw[raw.roi] = 0
    cfg = {
        "predict": {
            "v": {
                "raw_dataset": f"{container}/raw",
                "output_container": container,
                "chain": [
                    {"setup_dir": str(tmp_path / "2d_mtlsd")},
                    # hand-written config: no input_datasets on link 2
                    {"setup_dir": str(tmp_path / "3d_affs_from_2d_mtlsd")},
                ],
            }
        }
    }
    path = str(tmp_path / "predict.toml")
    tomlio.dump(cfg, path)
    with pytest.raises(ValueError, match="input_datasets"):
        run_prediction(path, setup_id="3d_affs_from_2d_mtlsd")


def test_shrink_shape_increase_fits_small_volume():
    """Volumes smaller than one output tile shrink the tile (the
    reference's fit="shrink" analog, ``predict.py:37``)."""
    from bootstrapper_tpu.predict.scan import shrink_shape_increase

    m = _tiny_3d_model()  # out (4, 8, 8), xy pooling product 4
    inc = shrink_shape_increase(m, (16, 6, 6))
    assert inc == [0, -4, -4]
    # already-fitting volumes are untouched
    assert shrink_shape_increase(m, (16, 32, 32)) == [0, 0, 0]
    # a positive increase shrinks back down to fit
    assert shrink_shape_increase(m, (16, 10, 10), [0, 4, 4]) == [0, 0, 0]
    # z shrinks in steps of 1 (never pooled)
    assert shrink_shape_increase(m, (3, 32, 32)) == [-1, 0, 0]


def test_predict_volume_smaller_than_tile(tmp_path):
    """run_prediction on a sub-tile volume shrinks the tile instead of
    erroring, and covers the whole roi."""
    import json
    import os

    from bootstrapper_tpu.configs import create_prediction_configs, setup_models
    from bootstrapper_tpu.core.arrays import open_ds
    from bootstrapper_tpu.train import create_train_state, save_checkpoint
    from bootstrapper_tpu.utils import tomlio
    from bootstrapper_tpu.workflows.predict import run_prediction

    vs = (1, 1, 1)
    shape = (16, 6, 6)  # xy smaller than the tiny net's (4, 8, 8) output
    container = str(tmp_path / "v.zarr")
    raw = prepare_ds(f"{container}/raw", shape, (0, 0, 0), vs, np.uint8)
    raw[raw.roi] = np.random.default_rng(0).integers(
        0, 255, shape, dtype=np.uint8
    )

    (setup_dir,) = setup_models(["3d_affs"], str(tmp_path / "setups"))
    nc_path = os.path.join(setup_dir, "net_config.json")
    with open(nc_path) as f:
        nc = json.load(f)
    nc.update(
        num_fmaps=2, fmap_inc_factor=2,
        input_shape=[12, 48, 48], output_shape=[4, 8, 8],
        shape_increase=[0, 0, 0],
        downsample_factors=[[1, 2, 2]] * 2,
        kernel_size_down=[[[1, 3, 3], [1, 3, 3]], [[3, 3, 3], [3, 3, 3]],
                          [[3, 3, 3], [3, 3, 3]]],
        kernel_size_up=[[[1, 3, 3], [1, 3, 3]], [[1, 3, 3], [1, 3, 3]]],
    )
    nc["outputs"]["3d_affs"]["neighborhood"] = [
        [-1, 0, 0], [0, -1, 0], [0, 0, -1]
    ]
    nc["outputs"]["3d_affs"]["dims"] = 3
    with open(nc_path, "w") as f:
        json.dump(nc, f)

    model = Model.from_setup(setup_dir)
    model.validate_shapes()
    state, _ = create_train_state(model, jax.random.PRNGKey(0))
    save_checkpoint(setup_dir, state, 5)

    volumes = {
        "v": {
            "raw_dataset": f"{container}/raw",
            "voxel_size": list(vs),
            "output_container": container,
        }
    }
    cfgs = create_prediction_configs(volumes, [setup_dir], [5])
    cfg_path = str(tmp_path / "predict.toml")
    tomlio.dump({"predict": cfgs}, cfg_path)

    run_prediction(cfg_path)

    affs = open_ds(f"{container}/3d_affs/5/3d_affs")
    assert affs.spatial_shape == shape
    assert (affs.to_ndarray() > 0).any()


def test_batch_tiles_auto_defaults():
    """batch_tiles=None -> 32 for 2D setups (sections batch until the
    MXU saturates), 1 for 3D (one tile already fills the chip)."""
    m3 = _tiny_3d_model()
    p3 = Predictor(m3, m3.init(jax.random.PRNGKey(0)), (40, 4, 4))
    assert p3.batch_tiles == 1

    nc = dict(Model.from_setup("2d_affs").net_config)
    nc.update(
        num_fmaps=2,
        fmap_inc_factor=2,
        input_shape=[48, 48],
        output_shape=[8, 8],
        shape_increase=[0, 0],
        downsample_factors=[[2, 2]] * 2,
        kernel_size_down=[[[3, 3], [3, 3]]] * 3,
        kernel_size_up=[[[3, 3], [3, 3]]] * 2,
    )
    nc["outputs"] = {
        "2d_affs": {
            "dtype": "uint8",
            "dims": 2,
            "neighborhood": [[-1, 0], [0, -1]],
            "grow_boundary": 1,
        }
    }
    m2 = Model(nc)
    p2 = Predictor(m2, m2.init(jax.random.PRNGKey(0)), (50, 8, 8))
    assert p2.batch_tiles == 32
    # explicit values still win
    p2b = Predictor(m2, m2.init(jax.random.PRNGKey(0)), (50, 8, 8),
                    batch_tiles=4)
    assert p2b.batch_tiles == 4


def test_uint8_raw_byte_transfer_is_exact(tmp_path):
    """All-uint8 inputs ship as raw bytes and normalise on device in
    float32 — outputs must be bit-identical to the host-normalised
    float path (same IEEE ops, different placement)."""
    vs = (40, 4, 4)
    shape = (16, 32, 32)
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 255, shape, dtype=np.uint8)

    raw8 = prepare_ds(str(tmp_path / "t.zarr/raw8"), shape, (0, 0, 0),
                      vs, np.uint8)
    raw8[raw8.roi] = vals
    rawf = prepare_ds(str(tmp_path / "t.zarr/rawf"), shape, (0, 0, 0),
                      vs, np.float32)
    rawf[rawf.roi] = vals.astype(np.float32) / 255.0

    model = _tiny_3d_model()
    params = model.init(jax.random.PRNGKey(0))
    pred = Predictor(model, params, vs, batch_tiles=2)

    outs = {}
    for name, src in (("u8", raw8), ("f32", rawf)):
        o = prepare_ds(str(tmp_path / f"t.zarr/affs_{name}"),
                       (3, *shape), (0, 0, 0), vs, np.uint8)
        pred.predict(src, {"3d_affs": o})
        outs[name] = o[o.roi]
    np.testing.assert_array_equal(outs["u8"], outs["f32"])


def test_tile_rois_fresh_partition():
    """with_fresh=True: fresh regions tile the total ROI exactly once
    (disjoint, complete) even when edge tiles shift inward."""
    total = Roi((0, 0), (100, 70))
    pairs = tile_rois(total, Coordinate(40, 30), with_fresh=True)
    covered = np.zeros((100, 70), np.int32)
    for tile, fresh in pairs:
        assert tile.contains(fresh.begin)
        sl = tuple(
            slice(b, b + s) for b, s in zip(fresh.begin, fresh.shape)
        )
        covered[sl] += 1
    assert covered.min() == 1 and covered.max() == 1


def test_fetch_device_array_chunked_equals_serial(monkeypatch):
    """Chunked-parallel drain fetch (BS_FETCH_STREAMS) must be
    byte-identical to a serial fetch, including shapes too small to
    split and the axis-selection path."""
    import numpy as np
    import jax.numpy as jnp

    from bootstrapper_tpu.predict._pipeline import fetch_device_array

    rng = np.random.default_rng(0)
    for shape in [(1, 24, 67, 53, 3), (5,), (2, 2), (1, 1, 1)]:
        v = jnp.asarray(
            rng.integers(0, 255, shape, dtype=np.uint8)
        )
        assert np.array_equal(
            fetch_device_array(v, streams=8), np.asarray(v)
        )
    monkeypatch.setenv("BS_FETCH_STREAMS", "4")
    v = jnp.asarray(rng.integers(0, 255, (3, 40, 16), dtype=np.uint8))
    assert np.array_equal(fetch_device_array(v), np.asarray(v))


def test_pipelined_stall_watchdog_fires(monkeypatch):
    """A drain that wedges past the steady timeout triggers the
    predict watchdog's die action (stubbed); fast pipelines don't."""
    import time as _time

    from bootstrapper_tpu.predict._pipeline import run_pipelined
    from bootstrapper_tpu.utils.stall import StallWatchdog

    died = []
    monkeypatch.setattr(
        StallWatchdog, "_die", lambda self: died.append(self.label)
    )
    monkeypatch.setenv("BS_PREDICT_COMPILE_TIMEOUT_S", "0.3")
    monkeypatch.setenv("BS_PREDICT_STALL_TIMEOUT_S", "0.3")

    # fast pipeline: no firing
    run_pipelined(
        [1, 2, 3], read=lambda i: i, dispatch=lambda a: a,
        drain=lambda i, o: None,
    )
    assert not died

    def slow_drain(i, o):
        _time.sleep(1.2)

    run_pipelined(
        [1, 2], read=lambda i: i, dispatch=lambda a: a,
        drain=slow_drain,
    )
    assert "predict" in died


def test_pipelined_watchdog_disabled_by_env(monkeypatch):
    from bootstrapper_tpu.predict._pipeline import run_pipelined
    from bootstrapper_tpu.utils.stall import StallWatchdog

    def boom(self):  # pragma: no cover
        raise AssertionError("watchdog should be disabled")

    monkeypatch.setattr(StallWatchdog, "start", boom)
    monkeypatch.setenv("BS_PREDICT_COMPILE_TIMEOUT_S", "0")
    run_pipelined(
        [1], read=lambda i: i, dispatch=lambda a: a,
        drain=lambda i, o: None,
    )
