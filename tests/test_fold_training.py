"""fold_xy opt-in for training (workflows/train.py).

Production trains unfolded by default (XLA:TPU's space-to-batch pass
CHECK-crashes on folded-conv gradients below batch 8); `fold_xy = true`
in the train config keeps the fold for the large-batch recipe that
measured 50-54.9% MFU on hardware (BASELINE.md batch-scaling table).
On CPU both graphs compile, so this pins the config wiring + numerics.
"""

import json
import os

import numpy as np

from bootstrapper_tpu.models.zoo import write_net_config
from bootstrapper_tpu.utils import tomlio
from bootstrapper_tpu.workflows.train import run_training


def _tiny_setup(tmp_path, name="3d_affs_from_3d_lsd"):
    setup_dir = str(tmp_path / name)
    write_net_config(name, setup_dir)
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
        fold_xy=True,
    )
    json.dump(nc, open(ncp, "w"))
    return setup_dir


def test_folded_large_batch_training(tmp_path):
    setup_dir = _tiny_setup(tmp_path)
    toml = str(tmp_path / "train.toml")
    tomlio.dump({"train": {
        "setup_dir": setup_dir, "voxel_size": [1, 1, 1],
        "max_iterations": 2, "save_checkpoints_every": 2,
        "save_snapshots_every": 0, "batch_size": 8,
        "fold_xy": True,  # the large-batch opt-in under test
    }}, toml)
    res = run_training(toml)
    assert res["iterations"] >= 2
    assert np.isfinite(res["final_loss"])
    assert res["checkpoint"] and os.path.exists(res["checkpoint"])


def test_default_training_unfolds(tmp_path, caplog):
    """Without the opt-in the trainer strips the fold and, at
    batch_size >= 8, logs the fold_xy hint."""
    import logging

    setup_dir = _tiny_setup(tmp_path)
    toml = str(tmp_path / "train.toml")
    tomlio.dump({"train": {
        "setup_dir": setup_dir, "voxel_size": [1, 1, 1],
        "max_iterations": 2, "save_checkpoints_every": 2,
        "save_snapshots_every": 0, "batch_size": 8,
    }}, toml)
    with caplog.at_level(logging.INFO, logger="bootstrapper_tpu.workflows.train"):
        res = run_training(toml)
    assert np.isfinite(res["final_loss"])
    assert any("fold_xy" in r.message for r in caplog.records)
