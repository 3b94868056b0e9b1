"""Sharded inference on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bootstrapper_tpu.core.arrays import prepare_ds
from bootstrapper_tpu.models import Model
from bootstrapper_tpu.predict.scan import Predictor, prepare_prediction_outputs
from bootstrapper_tpu.predict.sharded import ShardedPredictor


def _tiny_model():
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


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs virtual devices")
def test_sharded_batch_matches_unsharded():
    """Batch-of-tiles sharding must not change per-tile results."""
    n_dev = 4
    model = _tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    sharded = ShardedPredictor(
        model, params, (1, 1, 1), devices=jax.devices()[:n_dev],
        compute_dtype=jnp.float32,
    )
    assert sharded.in_tile == (12, 48, 48)

    x = jax.random.uniform(
        jax.random.PRNGKey(1), (n_dev, *sharded.in_tile, 1), jnp.float32
    )
    ref_params = jax.tree_util.tree_map(
        lambda p: jnp.asarray(p, jnp.float32), params
    )

    @jax.jit
    def plain(params, x):
        return model.apply(params, x)["3d_affs"]

    a = np.asarray(plain(ref_params, x), np.float64)
    b = (
        np.asarray(sharded._forward(sharded.params, x)["3d_affs"], np.float64)
        / 255.0
    )
    # float closeness: partitioned executables reassociate reductions
    # (and the folded/unfolded decoder graphs sum in different orders;
    # bf16 eps is 2^-8); uint8 rounding sits on knife edges for random
    # params. A structural (halo / batch-mixing) bug would produce
    # O(0.1) errors.
    assert np.abs(a - b).max() < 0.02


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs virtual devices")
def test_sharded_volume_matches_single_device(tmp_path):
    """Whole-volume sharded prediction equals the single-device
    predictor (same tile shape -> same arithmetic)."""
    n_dev = 4
    vs = (1, 1, 1)
    shape = (16, 40, 40)
    raw = prepare_ds(str(tmp_path / "t.zarr/raw"), shape, (0, 0, 0), vs, np.uint8)
    raw[raw.roi] = np.random.default_rng(0).integers(
        0, 255, shape, dtype=np.uint8
    )

    model = _tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    single = Predictor(model, params, vs, compute_dtype=jnp.float32)
    outs1 = prepare_prediction_outputs(
        str(tmp_path / "a.zarr"), model, raw.roi, vs, predictor=single
    )
    single.predict(raw, outs1)

    sharded = ShardedPredictor(
        model, params, vs, devices=jax.devices()[:n_dev],
        compute_dtype=jnp.float32,
    )
    outs2 = prepare_prediction_outputs(
        str(tmp_path / "b.zarr"), model, raw.roi, vs, predictor=single
    )
    stats = sharded.predict(raw, outs2)
    assert stats["devices"] == n_dev

    a = outs1["3d_affs"].to_ndarray().astype(int)
    b = outs2["3d_affs"].to_ndarray().astype(int)
    diff = np.abs(a - b)
    assert diff.max() <= 2  # uint8 rounding jitter only
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.999


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs virtual devices")
def test_sharded_2d_stacked(tmp_path):
    """2D setups shard over the tile batch too (z-slices as tiles)."""
    vs = (50, 8, 8)
    shape = (8, 24, 24)
    raw = prepare_ds(str(tmp_path / "t.zarr/raw"), shape, (0, 0, 0), vs, np.uint8)
    raw[raw.roi] = np.random.default_rng(3).integers(0, 255, shape, dtype=np.uint8)

    nc = dict(Model.from_setup("2d_affs").net_config)
    nc.update(
        num_fmaps=2,
        fmap_inc_factor=2,
        input_shape=[24, 24],
        output_shape=[8, 8],
        shape_increase=[0, 0],
        downsample_factors=[[2, 2]],
        kernel_size_down=[[[3, 3], [3, 3]]] * 2,
        kernel_size_up=[[[3, 3], [3, 3]]],
    )
    nc["outputs"] = {
        "2d_affs": {"dtype": "uint8", "dims": 2,
                    "neighborhood": [[-1, 0], [0, -1]], "grow_boundary": 1}
    }
    model = Model(nc)
    model.validate_shapes()
    params = model.init(jax.random.PRNGKey(0))
    sharded = ShardedPredictor(
        model, params, vs, devices=jax.devices()[:4],
        compute_dtype=jnp.float32,
    )
    assert sharded.in_tile == (3, 24, 24)
    outs = prepare_prediction_outputs(
        str(tmp_path / "o.zarr"), model, raw.roi, vs, predictor=None
    )
    stats = sharded.predict(raw, outs)
    assert stats["devices"] == 4
    a = outs["2d_affs"].to_ndarray()
    assert a.shape == (2, 8, 24, 24)
    assert (a > 0).mean() > 0.3
