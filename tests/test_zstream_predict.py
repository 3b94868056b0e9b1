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


@pytest.mark.skipif(
    len(__import__("jax").devices()) < 8, reason="needs virtual devices"
)
@pytest.mark.parametrize("depth", [36, 38])  # aligned + ragged last seg
def test_mesh_zstream_z_segments_narrow_volume(tmp_path, depth):
    """Deep-but-narrow volume (2 xy columns, 8 devices): each column's
    z walk splits into per-device segments (plan_z_groups), every
    segment an independent stream with its own warm step, and the
    result still equals the tiled single-device prediction.  depth=38
    additionally exercises segment-boundary write clipping (ragged last
    segment, steps overhanging both segment and volume ends)."""
    import jax

    model = _tiny_3d_model()
    params = model.init(jax.random.PRNGKey(0))
    vs = (40, 4, 4)
    shape = (depth, 8, 16)  # 1x2 xy columns
    raw = prepare_ds(
        str(tmp_path / "t.zarr/raw"), shape, (0, 0, 0), vs, np.uint8
    )
    rng = np.random.default_rng(4)
    raw[raw.roi] = rng.integers(0, 255, shape, dtype=np.uint8)

    tiled = Predictor(model, params, vs, compute_dtype=jnp.float32)
    outs1 = prepare_prediction_outputs(
        str(tmp_path / "a.zarr"), model, raw.roi, vs
    )
    tiled.predict(raw, outs1)

    zp = ZStreamPredictor(
        model, params, vs, compute_dtype=jnp.float32,
        devices=jax.devices(),
    )
    outs2 = prepare_prediction_outputs(
        str(tmp_path / "b.zarr"), model, raw.roi, vs
    )
    res = zp.predict(raw, outs2)
    assert res["columns"] == 2
    assert res["z_segments"] > 1  # the mesh was filled by z-splitting
    assert res["devices"] == 8

    a = outs1["3d_affs"].to_ndarray()
    b = outs2["3d_affs"].to_ndarray()
    assert a.shape == b.shape
    _assert_quant_equal(a, b)


def test_plan_z_groups_cost_model():
    """plan_z_groups fills the mesh for deep-narrow volumes, keeps G=1
    when columns already cover the devices, and reports an overhead
    factor that lets the dispatcher fall back when warm z-context per
    segment would dominate (flagship numbers: s=24, s_warm=4,
    ctx_z=28, tiled z-context factor (124+28)/124 ~ 1.226)."""
    from bootstrapper_tpu.predict.zstream import plan_z_groups

    tiled_factor = (124 + 28) / 124

    # 2000-slice volume, 2 columns, 8 devices: G=4 gives 8 virtual
    # columns (one lockstep group), ~7% overhead — streaming wins
    g, seg, f = plan_z_groups(2000, 2, 8, 24, 4, 28)
    assert g == 4
    assert seg == 500
    assert 1.0 < f < tiled_factor

    # enough columns already: no split
    g, _, f = plan_z_groups(2000, 8, 8, 24, 4, 28)
    assert g == 1
    assert f < tiled_factor

    # 9 columns over 8 devices: splitting rebalances the ragged group
    # (G=1 would idle 7 devices for half the run at factor ~1.8)
    g9, _, f9 = plan_z_groups(2000, 9, 8, 24, 4, 28)
    assert g9 > 1
    assert f9 < 1.25

    # shallow narrow volume: warm context dominates any split — the
    # factor exceeds the tiled path's and the dispatcher falls back
    _, _, f = plan_z_groups(130, 1, 8, 24, 4, 28)
    assert f > tiled_factor

    # single device: never splits
    g, _, _ = plan_z_groups(2000, 1, 1, 24, 4, 28)
    assert g == 1


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
