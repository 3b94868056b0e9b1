import numpy as np
import jax
import pytest

from bootstrapper_tpu.core.arrays import prepare_ds
from bootstrapper_tpu.models import Model
from bootstrapper_tpu.pipeline.training import SetupSpec, TrainingPipeline
from bootstrapper_tpu.train import create_train_state, make_train_step
from bootstrapper_tpu.train.sampler import Sample


def _make_sample(tmp_path, shape=(16, 64, 64), vs=(40, 4, 4)):
    rng = np.random.default_rng(0)
    raw = prepare_ds(str(tmp_path / "s.zarr/raw"), shape, (0, 0, 0), vs, np.uint8)
    raw[raw.roi] = rng.integers(0, 255, shape, dtype=np.uint8)
    labels = prepare_ds(
        str(tmp_path / "s.zarr/labels"), shape, (0, 0, 0), vs, np.uint32
    )
    lab = np.zeros(shape, np.uint32)
    lab[:, : shape[1] // 2, :] = 1
    lab[:, shape[1] // 2 :, :] = 2
    labels[labels.roi] = lab
    return Sample(raw, labels)


def _small_2d_net():
    nc = dict(Model.from_setup("2d_mtlsd").net_config)
    nc.update(
        num_fmaps=2,
        fmap_inc_factor=2,
        input_shape=[48, 48],
        output_shape=[8, 8],
        downsample_factors=[[2, 2]] * 2,
        kernel_size_down=[[[3, 3], [3, 3]]] * 3,
        kernel_size_up=[[[3, 3], [3, 3]]] * 2,
    )
    nc["outputs"] = {
        "2d_lsds": {"dtype": "uint8", "dims": 6, "sigma": 40, "downsample": 2},
        "2d_affs": {
            "dtype": "uint8",
            "dims": 2,
            "neighborhood": [[-1, 0], [0, -1]],
            "grow_boundary": 1,
        },
    }
    return nc


def _small_3d_net():
    nc = dict(Model.from_setup("3d_affs").net_config)
    nc.update(
        num_fmaps=2,
        fmap_inc_factor=2,
        input_shape=[12, 48, 48],
        output_shape=[4, 8, 8],
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
    return nc


def test_pipeline_with_artifact_source(tmp_path):
    """Artifact blending active when configured (reference DefectAugment
    artifact_source): with prob_artifact=1 and a constant-1 artifact
    volume with full alpha, most input sections become exactly 1.0."""
    nc = _small_3d_net()
    vs = (40, 4, 4)
    shape = (16, 64, 64)
    art = prepare_ds(
        str(tmp_path / "a.zarr/artifacts"), shape, (0, 0, 0), vs, np.float32
    )
    art[art.roi] = np.ones(shape, np.float32)
    msk = prepare_ds(
        str(tmp_path / "a.zarr/mask"), shape, (0, 0, 0), vs, np.uint8
    )
    msk[msk.roi] = np.ones(shape, np.uint8)
    pipe = TrainingPipeline(
        nc, vs, [_make_sample(tmp_path)], batch_size=1, min_masked=0.0,
        artifact_samples=[(art, msk)], prob_artifact=1.0,
    )
    try:
        batch = pipe.next_batch()
    finally:
        pipe.stop()
    x = np.asarray(batch["input"])[0, ..., 0]  # (12, 48, 48) in [-1, 1]
    # blended sections are exactly artifact==1.0 -> scaled to +1.0
    ones = [np.allclose(x[z], 1.0) for z in range(x.shape[0])]
    assert sum(ones) >= x.shape[0] // 2


def test_artifact_source_with_different_voxel_size(tmp_path):
    """Regression: the artifact volume may have its OWN voxel size; the
    sampler must still yield exactly input_tile voxels (the crop is a
    voxel-shape contract, not a world-units one)."""
    nc = _small_3d_net()
    vs = (40, 4, 4)
    art_vs = (50, 8, 8)  # different resolution artifact volume
    shape = (16, 64, 64)
    art = prepare_ds(
        str(tmp_path / "a.zarr/artifacts"), shape, (0, 0, 0), art_vs,
        np.float32,
    )
    art[art.roi] = np.ones(shape, np.float32)
    pipe = TrainingPipeline(
        nc, vs, [_make_sample(tmp_path)], batch_size=1, min_masked=0.0,
        artifact_samples=[art], prob_artifact=1.0,
    )
    try:
        batch = pipe.next_batch()
    finally:
        pipe.stop()
    x = np.asarray(batch["input"])[0, ..., 0]
    assert x.shape == (12, 48, 48)
    ones = [np.allclose(x[z], 1.0) for z in range(x.shape[0])]
    assert sum(ones) >= x.shape[0] // 2


def test_2d_pipeline_batch_shapes(tmp_path):
    nc = _small_2d_net()
    model = Model(nc)
    model.validate_shapes()
    pipe = TrainingPipeline(
        nc, (40, 4, 4), [_make_sample(tmp_path)], batch_size=2, min_masked=0.0
    )
    try:
        batch = pipe.next_batch()
    finally:
        pipe.stop()
    assert batch["input"].shape == (2, 3, 48, 48, 1)
    assert batch["targets"]["2d_lsds"].shape == (2, 8, 8, 6)
    assert batch["targets"]["2d_affs"].shape == (2, 8, 8, 2)
    assert batch["weights"]["2d_affs"].shape == (2, 8, 8, 2)
    v = np.asarray(batch["input"])
    assert v.min() >= -1.0 and v.max() <= 1.0
    assert np.isfinite(np.asarray(batch["targets"]["2d_lsds"])).all()


def test_3d_pipeline_and_train_step(tmp_path):
    nc = _small_3d_net()
    model = Model(nc)
    model.validate_shapes()
    pipe = TrainingPipeline(
        nc, (40, 4, 4), [_make_sample(tmp_path)], batch_size=1, min_masked=0.0
    )
    try:
        batch = pipe.next_batch()
    finally:
        pipe.stop()
    assert batch["input"].shape == (1, 12, 48, 48, 1)
    assert batch["targets"]["3d_affs"].shape == (1, 4, 8, 8, 3)

    state, tx = create_train_state(model, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, tx))
    state2, metrics = step(state, batch)
    loss1 = float(metrics["loss"])
    assert np.isfinite(loss1) and loss1 > 0
    # a few more steps reduce loss on a fixed batch
    for _ in range(10):
        state2, metrics = step(state2, batch)
    assert float(metrics["loss"]) < loss1


def test_affinity_targets_match_labels(tmp_path):
    """Affinities in the produced batch must be consistent with a split
    label volume: y-affinities are 0 across the 1|2 boundary region."""
    nc = _small_3d_net()
    pipe = TrainingPipeline(
        nc, (40, 4, 4), [_make_sample(tmp_path)], batch_size=1, min_masked=0.0
    )
    try:
        batch = pipe.next_batch()
    finally:
        pipe.stop()
    affs = np.asarray(batch["targets"]["3d_affs"])[0]
    assert set(np.unique(affs)).issubset({0.0, 1.0})


def test_setup_spec_defaults():
    spec = SetupSpec(Model.from_setup("2d_mtlsd").net_config, (50, 8, 8))
    assert spec.is_2d and spec.adj_slices == 3
    assert spec.batch_size == 10 and spec.learning_rate == 1e-4
    assert spec.input_tile == (3, 196, 196)
    assert spec.output_tile == (1, 104, 104)
    out = spec.output_spec("2d_affs")
    assert out["neighborhood"][0] == [0, -1, 0]

    spec3 = SetupSpec(Model.from_setup("3d_affs").net_config, (50, 8, 8))
    assert not spec3.is_2d
    assert spec3.batch_size == 1 and spec3.learning_rate == 0.5e-4


def test_device_renumber_matches_host():
    import jax.numpy as jnp

    from bootstrapper_tpu.pipeline.training import device_renumber
    from bootstrapper_tpu.train.sampler import fold_ids_u32, renumber

    rng = np.random.default_rng(0)
    # with background
    labels = rng.choice([0, 5, 17, 99, 12345], size=(4, 8, 8)).astype(
        np.uint64
    )
    host = renumber(labels, max_labels=64)
    dev = np.asarray(device_renumber(jnp.asarray(fold_ids_u32(labels)), 64))
    np.testing.assert_array_equal(dev, host)
    # without background: ids stay >= 1
    labels2 = labels + 1
    host2 = renumber(labels2, max_labels=64)
    dev2 = np.asarray(device_renumber(jnp.asarray(fold_ids_u32(labels2)), 64))
    np.testing.assert_array_equal(dev2, host2)
    assert dev2.min() >= 1


def test_fold_ids_u32_big_ids():
    from bootstrapper_tpu.train.sampler import fold_ids_u32

    labels = np.array([0, 1, 2**33, 2**33 + 7], np.uint64)
    out = fold_ids_u32(labels)
    assert out.dtype == np.uint32
    assert out[0] == 0
    assert len(np.unique(out)) == 4


def test_fold_ids_u32_equal_halves_stay_foreground():
    """An id with equal 32-bit halves xor-folds to 0; it must not merge
    into background."""
    from bootstrapper_tpu.train.sampler import fold_ids_u32

    tricky = (42 << 32) | 42  # high == low -> xor == 0
    labels = np.array([0, tricky, 2**33], np.uint64)
    out = fold_ids_u32(labels)
    assert out[0] == 0
    assert out[1] != 0
