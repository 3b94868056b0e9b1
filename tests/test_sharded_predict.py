"""Sharded inference on the virtual 8-device CPU mesh: results must
match the single-device predictor exactly (same valid convs, GSPMD just
inserts halo exchanges)."""

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
def test_sharded_forward_matches_unsharded():
    """The y-sharded jit must produce the same values as an unsharded
    run of the identical super-tile (GSPMD halo exchange correctness)."""
    n_dev = 4
    model = _tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    sharded = ShardedPredictor(
        model, params, (1, 1, 1), devices=jax.devices()[:n_dev],
        compute_dtype=jnp.float32,
    )
    assert sharded.out_tile == (4, 8 * n_dev, 8)

    x = jax.random.uniform(
        jax.random.PRNGKey(1), (1, *sharded.in_tile, 1), jnp.float32
    )
    ref_params = jax.tree_util.tree_map(
        lambda p: jnp.asarray(p, jnp.float32), params
    )

    @jax.jit
    def plain(params, x):
        out = model.apply(params, x)["3d_affs"]
        return jnp.round(jnp.clip(out, 0, 1) * 255).astype(jnp.uint8)

    a = np.asarray(plain(ref_params, x))
    b = np.asarray(sharded._forward(sharded.params, x)["3d_affs"])
    diff = np.abs(a.astype(int) - b.astype(int))
    # identical math modulo float reassociation under the GSPMD
    # partitioning (empirically +-2/255, uniformly distributed)
    assert diff.max() <= 3
    assert diff.mean() < 0.25
    # a halo bug would concentrate large errors at the shard seams
    # (y = 8, 16, 24); check seam rows are no worse than the rest
    per_y = diff[0].max(axis=(0, 2, 3))
    seams = per_y[[7, 8, 15, 16, 23, 24]].max()
    assert seams <= max(2, per_y.max())


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs virtual devices")
def test_sharded_volume_close_to_single_device(tmp_path):
    """Whole-volume sharded prediction vs the single-device predictor.

    Values may differ slightly: tile sizes differ and linear upsampling
    clamps at tile edges (the reference's trilinear Upsample has the
    same tile-size sensitivity), so only closeness is required.
    """
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
    assert diff.mean() < 1.0
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.99
