"""ZStreamPredictor end-to-end: streamed-z prediction over a deep
volume equals the tiled scan.Predictor through the Zarr IO path (up to
the uint8 x.5 quantization boundary — the step graphs are separate XLA
programs)."""

import numpy as np
import jax.numpy as jnp
import pytest

from bootstrapper_tpu.core.arrays import prepare_ds
from bootstrapper_tpu.core.geometry import Coordinate, Roi
from bootstrapper_tpu.models import Model
from bootstrapper_tpu.predict.scan import Predictor, prepare_prediction_outputs
from bootstrapper_tpu.predict.zstream import ZStreamPredictor


def _tiny_3d_model():
    nc = dict(Model.from_setup("3d_affs").net_config)
    nc.update(
        num_fmaps=2,
        fmap_inc_factor=2,
        input_shape=[24, 48, 48],
        output_shape=[4, 8, 8],
        shape_increase=[0, 0, 0],
        downsample_factors=[[1, 2, 2]] * 2,
        kernel_size_down=[[[3, 3, 3], [3, 3, 3]]] * 3,
        kernel_size_up=[[[3, 3, 3], [3, 3, 3]]] * 2,
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


def _assert_quant_equal(a, b):
    diff = np.abs(a.astype(int) - b.astype(int))
    assert diff.max() <= 1
    assert (diff != 0).mean() < 1e-3


@pytest.mark.parametrize("depth", [20, 22])  # exact multiple + remainder
def test_zstream_matches_tiled_predictor(tmp_path, depth):
    model = _tiny_3d_model()
    params = model.init(__import__("jax").random.PRNGKey(0))
    vs = (40, 4, 4)
    shape = (depth, 60, 40)  # > 1 xy tile in y, deep in z
    raw = prepare_ds(
        str(tmp_path / "t.zarr/raw"), shape, (0, 0, 0), vs, np.uint8
    )
    rng = np.random.default_rng(0)
    raw[raw.roi] = rng.integers(0, 255, shape, dtype=np.uint8)

    tiled = Predictor(model, params, vs, compute_dtype=jnp.float32)
    outs1 = prepare_prediction_outputs(
        str(tmp_path / "a.zarr"), model, raw.roi, vs
    )
    tiled.predict(raw, outs1)

    zp = ZStreamPredictor(model, params, vs, compute_dtype=jnp.float32)
    outs2 = prepare_prediction_outputs(
        str(tmp_path / "b.zarr"), model, raw.roi, vs
    )
    res = zp.predict(raw, outs2)
    assert res["steps_per_column"] == -(-depth // 4)

    a = outs1["3d_affs"].to_ndarray()
    b = outs2["3d_affs"].to_ndarray()
    assert a.shape == b.shape
    _assert_quant_equal(a, b)


@pytest.mark.skipif(
    len(__import__("jax").devices()) < 4, reason="needs virtual devices"
)
def test_mesh_zstream_matches_tiled_predictor(tmp_path):
    """Columns sharded one-per-device over a ('space',) mesh must give
    the tiled single-device result; also exercises the short final
    column group (5 columns over 4 devices)."""
    import jax

    model = _tiny_3d_model()
    params = model.init(jax.random.PRNGKey(0))
    vs = (40, 4, 4)
    shape = (22, 24, 40)  # 3x5 = 15 xy columns, z remainder step
    raw = prepare_ds(
        str(tmp_path / "t.zarr/raw"), shape, (0, 0, 0), vs, np.uint8
    )
    rng = np.random.default_rng(1)
    raw[raw.roi] = rng.integers(0, 255, shape, dtype=np.uint8)

    tiled = Predictor(model, params, vs, compute_dtype=jnp.float32)
    outs1 = prepare_prediction_outputs(
        str(tmp_path / "a.zarr"), model, raw.roi, vs
    )
    tiled.predict(raw, outs1)

    zp = ZStreamPredictor(
        model, params, vs, compute_dtype=jnp.float32,
        devices=jax.devices()[:4],
    )
    assert zp.B == 4
    outs2 = prepare_prediction_outputs(
        str(tmp_path / "b.zarr"), model, raw.roi, vs
    )
    res = zp.predict(raw, outs2)
    assert res["devices"] == 4
    assert res["columns"] > 4  # short final group exercised

    a = outs1["3d_affs"].to_ndarray()
    b = outs2["3d_affs"].to_ndarray()
    assert a.shape == b.shape
    _assert_quant_equal(a, b)


@pytest.mark.parametrize("step_z", [1, 3, 4, 7])
def test_zstream_step_z_is_free_parameter(tmp_path, step_z):
    """Any step_z gives the tiled result — the z step is decoupled from
    the tile geometry (valid convs are exact under z concatenation), so
    production can pick it from a memory model instead of the tile."""
    model = _tiny_3d_model()
    import jax

    params = model.init(jax.random.PRNGKey(0))
    vs = (40, 4, 4)
    shape = (21, 8, 8)  # prime-ish depth: remainder steps for every s
    raw = prepare_ds(
        str(tmp_path / "t.zarr/raw"), shape, (0, 0, 0), vs, np.uint8
    )
    rng = np.random.default_rng(2)
    raw[raw.roi] = rng.integers(0, 255, shape, dtype=np.uint8)

    tiled = Predictor(model, params, vs, compute_dtype=jnp.float32)
    outs1 = prepare_prediction_outputs(
        str(tmp_path / "a.zarr"), model, raw.roi, vs
    )
    tiled.predict(raw, outs1)

    zp = ZStreamPredictor(
        model, params, vs, compute_dtype=jnp.float32, step_z=step_z
    )
    assert zp.s == step_z
    assert zp.input_tile[0] == step_z + 20  # tiny net z context
    outs2 = prepare_prediction_outputs(
        str(tmp_path / "b.zarr"), model, raw.roi, vs
    )
    zp.predict(raw, outs2)

    a = outs1["3d_affs"].to_ndarray()
    b = outs2["3d_affs"].to_ndarray()
    assert a.shape == b.shape
    _assert_quant_equal(a, b)


@pytest.mark.parametrize("warm_s,s", [(1, 5), (2, 4), (3, 3)])
def test_zstream_small_warm_step(tmp_path, warm_s, s):
    """The warm step size is independent of the steady step size: all
    stream caches have s-independent z extents, so a small warm graph
    (the memory-heavy one: it carries the full z context) can feed
    larger steady steps with identical results."""
    model = _tiny_3d_model()
    import jax

    params = model.init(jax.random.PRNGKey(0))
    vs = (40, 4, 4)
    shape = (23, 8, 8)
    raw = prepare_ds(
        str(tmp_path / "t.zarr/raw"), shape, (0, 0, 0), vs, np.uint8
    )
    rng = np.random.default_rng(3)
    raw[raw.roi] = rng.integers(0, 255, shape, dtype=np.uint8)

    tiled = Predictor(model, params, vs, compute_dtype=jnp.float32)
    outs1 = prepare_prediction_outputs(
        str(tmp_path / "a.zarr"), model, raw.roi, vs
    )
    tiled.predict(raw, outs1)

    zp = ZStreamPredictor(
        model, params, vs, compute_dtype=jnp.float32,
        step_z=s, warm_step_z=warm_s,
    )
    assert zp.warm_input_tile[0] == warm_s + 20
    outs2 = prepare_prediction_outputs(
        str(tmp_path / "b.zarr"), model, raw.roi, vs
    )
    zp.predict(raw, outs2)

    a = outs1["3d_affs"].to_ndarray()
    b = outs2["3d_affs"].to_ndarray()
    assert a.shape == b.shape
    _assert_quant_equal(a, b)


def test_zstream_rejects_z_pooling_nets():
    nc = dict(_tiny_3d_model().net_config)
    nc["downsample_factors"] = [[2, 2, 2], [1, 2, 2]]
    nc["input_shape"] = [32, 48, 48]
    with pytest.raises(ValueError):
        ZStreamPredictor(Model(nc), {}, (40, 4, 4))
