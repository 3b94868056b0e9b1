"""Spatially-sharded inference (shard_map + ppermute halo exchange) on
the virtual 8-device CPU mesh: one tile's spatial extent split across
devices must reproduce the single-device result exactly.

Reference capability: block-halo prediction
(``bootstrapper/predict.py:128-132``) mapped to mesh parallelism —
the one SURVEY §2.5 TPU capability the batch-sharded predictor
(sharded.py) does not cover, because it cannot pool HBM across chips.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bootstrapper_tpu.core.arrays import prepare_ds
from bootstrapper_tpu.core.geometry import Roi
from bootstrapper_tpu.models import Model
from bootstrapper_tpu.predict.scan import Predictor, prepare_prediction_outputs
from bootstrapper_tpu.predict.spatial import (
    SpatialShardedPredictor,
    pick_shard_axis,
)


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


def test_pick_shard_axis_minimises_halo():
    # out (4, 112, 8), ctx (4, 20, 20), 4 devices: y has the cheapest
    # own/context ratio among divisible axes
    assert pick_shard_axis((4, 112, 8), (4, 20, 20), 4) == 1
    with pytest.raises(ValueError, match="divides"):
        pick_shard_axis((3, 5, 7), (1, 1, 1), 4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs virtual devices")
def test_spatial_forward_matches_single_device():
    """shard_map forward (4-way y split, multi-hop halo) == plain
    forward on the identical tile."""
    n_dev = 4
    model = _tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    # out (4, 112, 8): y splits into 4 slabs of 28 with context 20 ->
    # halo spans more than one input slab (h_l=30 > c_in) so the
    # multi-hop ppermute path is exercised
    sp = SpatialShardedPredictor(
        model, params, (1, 1, 1), devices=jax.devices()[:n_dev],
        shape_increase=[0, 104, 0], compute_dtype=jnp.float32,
    )
    assert sp.in_tile == (12, 152, 48) and sp.out_tile == (4, 112, 8)
    assert sp.shard_axis == 1
    assert sp.hops[0] >= 1

    x = jax.random.uniform(
        jax.random.PRNGKey(1), (1, 12, sp.in_padded, 48, 1), jnp.float32
    )
    ref_params = jax.tree_util.tree_map(
        lambda p: jnp.asarray(p, jnp.float32), params
    )
    model_f32 = Model(model.net_config, compute_dtype=jnp.float32)

    @jax.jit
    def plain(params, x):
        return model_f32.apply(params, x)["3d_affs"]

    b = np.asarray(sp._forward(sp.params, x)["3d_affs"])

    # 1) bit-exact vs per-slab single-device computation: each device's
    # slab is the same valid-conv program a blockwise (daisy-style)
    # prediction would run on that block+context
    own, L = sp.own_out, sp.own_out + 2 * 20
    slabs = []
    for k in range(n_dev):
        xs = x[:, :, k * own : k * own + L]
        slabs.append(np.asarray(plain(ref_params, xs)))
    ref_blockwise = np.concatenate(slabs, axis=2)
    ref8 = np.round(np.clip(ref_blockwise, 0, 1) * 255).astype(np.uint8)
    np.testing.assert_array_equal(ref8, b)

    # 2) vs the whole-tile forward: identical except a narrow band at
    # slab boundaries where the trilinear constant-upsample's edge
    # clamping differs (the reference's own blockwise prediction has the
    # same seams at block boundaries, torch Upsample mode="trilinear")
    a = np.asarray(plain(ref_params, x[:, :, : sp.in_tile[1]]))
    a8 = np.round(np.clip(a, 0, 1) * 255).astype(np.uint8)
    diff = np.abs(a8.astype(int) - b.astype(int))
    assert diff.max() <= 2
    interior = np.ones(diff.shape[2], bool)
    for k in range(1, n_dev):
        interior[k * own - 4 : k * own + 4] = False
    assert diff[:, :, interior].max() == 0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs virtual devices")
def test_spatial_volume_matches_single_device(tmp_path):
    """Whole-volume spatially-sharded prediction == single-device
    predictor output, through the Zarr IO path."""
    n_dev = 4
    model = _tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    vs = (1, 1, 1)
    shape = (16, 140, 40)
    raw = prepare_ds(
        str(tmp_path / "v.zarr/raw"), shape, (0, 0, 0), vs, np.uint8
    )
    raw[raw.roi] = np.random.default_rng(0).integers(
        0, 255, shape, dtype=np.uint8
    )

    # blockwise single-device reference with tile == one device's slab:
    # the spatially-sharded run must reproduce it bit-for-bit (same
    # valid-conv programs, same block boundaries)
    single = Predictor(model, params, vs, shape_increase=[0, 20, 0],
                       compute_dtype=jnp.float32)
    outs1 = prepare_prediction_outputs(
        str(tmp_path / "single.zarr"), model, raw.roi, vs
    )
    single.predict(raw, outs1)

    sp = SpatialShardedPredictor(
        model, params, vs, devices=jax.devices()[:n_dev],
        shape_increase=[0, 104, 0], compute_dtype=jnp.float32,
    )
    assert sp.own_out == single.output_tile[1] == 28
    outs2 = prepare_prediction_outputs(
        str(tmp_path / "spatial.zarr"), model, raw.roi, vs
    )
    res = sp.predict(raw, outs2)
    assert res["devices"] == n_dev

    a = outs1["3d_affs"].to_ndarray()
    b = outs2["3d_affs"].to_ndarray()
    # the slab program (inside shard_map, post-halo) and the tile
    # program are mathematically identical but separately compiled —
    # XLA may reassociate float ops differently, so a value sitting
    # exactly on a x.5 quantization boundary can round either way
    # (observed: 1/268800 elements off by one after a machine change).
    # Require equality up to that boundary effect.
    diff = np.abs(a.astype(int) - b.astype(int))
    assert diff.max() <= 1
    assert (diff != 0).mean() < 1e-4
