"""BS_INT8 dynamic int8 inference path (ops/quant.py): bounded
quantization error at every conv entry point and end to end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bootstrapper_tpu.models.unet import UNetConfig, unet_apply, unet_init
from bootstrapper_tpu.ops import quant


def test_qconv_matches_fp_conv_within_quant_error():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 10, 12, 5))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 5, 7)) * 0.1
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    got = quant.qconv(x, w, out_dtype=jnp.float32)
    denom = float(jnp.abs(ref).mean())
    rel = float(jnp.abs(got - ref).mean()) / denom
    assert rel < 0.02, rel


def test_qconv_per_channel_weight_scales():
    """A channel with tiny weights must not be crushed by a channel
    with huge weights (per-output-channel scales)."""
    x = jnp.ones((1, 3, 3, 3, 2))
    w = jnp.zeros((3, 3, 3, 2, 2))
    w = w.at[..., 0].set(100.0).at[..., 1].set(0.01)
    out = np.asarray(quant.qconv(x, w, out_dtype=jnp.float32))
    ref = np.array([100.0 * 54, 0.01 * 54])
    np.testing.assert_allclose(out[0, 0, 0, 0], ref, rtol=0.02)


@pytest.mark.parametrize("force_lazy", [False, True])
def test_unet_int8_end_to_end(monkeypatch, force_lazy):
    """The whole U-Net (folded + plain + lazy levels) under BS_INT8=1
    stays within ~1% relative error of the fp graph."""
    cfg = small = UNetConfig(
        in_channels=1, num_fmaps=4, fmap_inc_factor=3,
        downsample_factors=[[1, 2, 2]] * 2,
        kernel_size_down=[[[3, 3, 3], [3, 3, 3]]] * 3,
        kernel_size_up=[[[3, 3, 3], [3, 3, 3]]] * 2,
    )
    params = unet_init(jax.random.PRNGKey(7), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(8), (1, 24, 52, 56, 1),
                           jnp.float32)
    ref = np.asarray(unet_apply(params, x, cfg, compute_dtype=jnp.float32)[0])
    assert ref.size > 0
    if force_lazy:
        monkeypatch.setenv("BS_LAZY_UP_BYTES", "0")
    monkeypatch.setenv("BS_INT8", "1")
    got = np.asarray(unet_apply(params, x, cfg, compute_dtype=jnp.float32)[0])
    rel = np.abs(got - ref).mean() / np.abs(ref).mean()
    assert rel < 0.03, rel


def test_int8_flag_off_is_bitwise_default(monkeypatch):
    cfg = UNetConfig(
        in_channels=1, num_fmaps=3, fmap_inc_factor=2,
        downsample_factors=[[1, 2, 2]],
        kernel_size_down=[[[3, 3, 3], [3, 3, 3]]] * 2,
        kernel_size_up=[[[3, 3, 3], [3, 3, 3]]],
    )
    params = unet_init(jax.random.PRNGKey(1), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 16, 28, 32, 1),
                           jnp.float32)
    a = np.asarray(unet_apply(params, x, cfg, compute_dtype=jnp.float32)[0])
    monkeypatch.setenv("BS_INT8", "0")
    b = np.asarray(unet_apply(params, x, cfg, compute_dtype=jnp.float32)[0])
    np.testing.assert_array_equal(a, b)


def test_training_ignores_int8(monkeypatch, tmp_path):
    """BS_INT8 is inference-only: run_training disables it for the train
    step (round/clip have zero gradient) and restores it afterwards so a
    chained predict in the same process still quantizes."""
    import os

    from bootstrapper_tpu.models.zoo import write_net_config
    from bootstrapper_tpu.utils import tomlio
    from bootstrapper_tpu.workflows.train import run_training

    setup_dir = str(tmp_path / "3d_affs_from_3d_lsd")
    write_net_config("3d_affs_from_3d_lsd", setup_dir)
    # shrink for CPU: tiny fmaps + shapes (synthetic refiner pipeline)
    import json

    ncp = os.path.join(setup_dir, "net_config.json")
    nc = json.load(open(ncp))
    nc.update(
        num_fmaps=2, fmap_inc_factor=2, input_shape=[12, 48, 48],
        output_shape=[4, 8, 8], shape_increase=[0, 0, 0],
        downsample_factors=[[1, 2, 2]] * 2,
        kernel_size_down=[
            [[1, 3, 3], [1, 3, 3]],
            [[3, 3, 3], [3, 3, 3]],
            [[3, 3, 3], [3, 3, 3]],
        ],
        kernel_size_up=[[[1, 3, 3], [1, 3, 3]], [[1, 3, 3], [1, 3, 3]]],
    )
    json.dump(nc, open(ncp, "w"))
    toml = str(tmp_path / "train.toml")
    tomlio.dump({"train": {
        "setup_dir": setup_dir, "voxel_size": [1, 1, 1],
        "max_iterations": 2, "save_checkpoints_every": 2,
        "save_snapshots_every": 0,
    }}, toml)
    monkeypatch.setenv("BS_INT8", "1")
    res = run_training(toml)
    assert os.environ["BS_INT8"] == "1"  # restored for chained predict
    assert res["iterations"] >= 2
    import numpy as np

    assert np.isfinite(res["final_loss"])


def test_int8_under_spatial_sharding(monkeypatch):
    """BS_INT8 composes with the shard_map spatial predictor: per-shard
    activation scales make each device's slab exactly the int8 result a
    blockwise single-device prediction would produce on that slab."""
    import sys

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_spatial_predict import _tiny_model

    from bootstrapper_tpu.models import Model
    from bootstrapper_tpu.predict.spatial import SpatialShardedPredictor

    n_dev = 4
    model = _tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    monkeypatch.setenv("BS_INT8", "1")
    sp = SpatialShardedPredictor(
        model, params, (1, 1, 1), devices=jax.devices()[:n_dev],
        shape_increase=[0, 104, 0], compute_dtype=jnp.float32,
    )
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (1, 12, sp.in_padded, 48, 1), jnp.float32
    )
    b = np.asarray(sp._forward(sp.params, x)["3d_affs"])

    model_f32 = Model(model.net_config, compute_dtype=jnp.float32)
    ref_params = jax.tree_util.tree_map(
        lambda p: jnp.asarray(p, jnp.float32), params
    )

    @jax.jit
    def plain(p, x):
        return model_f32.apply(p, x)["3d_affs"]

    own, L = sp.own_out, sp.own_out + 2 * 20
    slabs = [
        np.asarray(plain(ref_params, x[:, :, k * own : k * own + L]))
        for k in range(n_dev)
    ]
    ref = np.concatenate(slabs, axis=2)
    ref8 = np.round(np.clip(ref, 0, 1) * 255).astype(np.uint8)
    np.testing.assert_array_equal(ref8, b)


def test_int8_through_predict_workflow(monkeypatch, tmp_path):
    """BS_INT8 through the production tiled Predictor: uint8 outputs
    stay within a few quantization steps of the bf16 run."""
    import sys

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_predict import _tiny_3d_model

    from bootstrapper_tpu.core.arrays import prepare_ds
    from bootstrapper_tpu.predict.scan import (
        Predictor,
        prepare_prediction_outputs,
    )

    vs = (40, 4, 4)
    shape = (16, 32, 32)
    raw = prepare_ds(
        str(tmp_path / "t.zarr/raw"), shape, (0, 0, 0), vs, np.uint8
    )
    rng = np.random.default_rng(0)
    raw[raw.roi] = rng.integers(0, 255, shape, dtype=np.uint8)

    model = _tiny_3d_model()
    params = model.init(jax.random.PRNGKey(0))

    def run():
        pred = Predictor(model, params, vs, batch_tiles=2)
        outs = prepare_prediction_outputs(
            str(tmp_path / "t.zarr"), model, raw.roi, vs, predictor=pred
        )
        pred.predict(raw, outs)
        return outs["3d_affs"].to_ndarray().astype(int)

    ref = run()
    monkeypatch.setenv("BS_INT8", "1")
    got = run()
    diff = np.abs(ref - got)
    assert diff.mean() < 1.5
    assert diff.max() <= 12  # isolated sigmoid-steep voxels
