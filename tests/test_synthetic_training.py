"""Synthetic-data training for the refiner models (no data on disk)."""

import json

import numpy as np
import pytest

import jax

from bootstrapper_tpu.models import Model
from bootstrapper_tpu.pipeline.synthetic import SyntheticTrainingPipeline
from bootstrapper_tpu.train import create_train_state, make_train_step
from bootstrapper_tpu.train.synth import create_labels, obfuscate_labels


def test_create_labels_properties():
    rng = np.random.default_rng(0)
    labels = create_labels(rng, shape=(12, 48, 48), mode="random")
    assert labels.shape == (12, 48, 48)
    assert labels.dtype == np.int32
    assert len(np.unique(labels)) > 2  # several instances


def test_create_labels_tubes():
    rng = np.random.default_rng(1)
    labels = create_labels(rng, shape=(12, 48, 48), mode="tubes",
                           num_points_range=(5, 10))
    assert labels.max() > 0


def test_obfuscate_changes_labels():
    rng = np.random.default_rng(2)
    labels = create_labels(rng, shape=(8, 48, 48), mode="random",
                           p_blackout=0.0)
    obf = obfuscate_labels(rng, labels, p_split=1.0, p_merge=1.0,
                           p_artifact=1.0)
    assert obf.shape == labels.shape
    assert (obf != labels).any()


def test_synthetic_pipeline_trains_refiner():
    nc = dict(Model.from_setup("3d_affs_from_2d_mtlsd").net_config)
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
    model = Model(nc)
    model.validate_shapes()
    pipe = SyntheticTrainingPipeline(nc, voxel_size=(1, 1, 1), batch_size=1)
    try:
        batch = pipe.next_batch()
        # inputs: 6 lsds + 6 affs channels from the obfuscated labels
        assert batch["input"].shape == (1, 12, 48, 48, 12)
        assert batch["targets"]["3d_affs"].shape == (1, 4, 8, 8, 9)
        v = np.asarray(batch["input"])
        assert np.isfinite(v).all() and v.min() >= 0 and v.max() <= 1

        state, tx = create_train_state(model, jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(model, tx))
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
    finally:
        pipe.stop()
