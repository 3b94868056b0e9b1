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


def test_default_large_batch_training_probes_and_folds(
    tmp_path, caplog, monkeypatch
):
    """With no fold_xy in the config and batch >= 8, the trainer
    probe-compiles the folded step in a subprocess and, on success
    (CPU always compiles it), trains folded; the verdict is cached."""
    import logging

    monkeypatch.setenv("BS_CACHE_DIR", str(tmp_path / "cache"))
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
    assert any("fold probe passed" in r.message for r in caplog.records)
    cache = json.load(open(tmp_path / "cache" / "fold_probe.json"))
    (entry,) = cache.values()
    assert entry["ok"] is True and entry["batch"] == 8


def test_fold_probe_cache_prevents_respawn(tmp_path, monkeypatch):
    monkeypatch.setenv("BS_CACHE_DIR", str(tmp_path / "cache"))
    from bootstrapper_tpu.models import Model
    from bootstrapper_tpu.train import fold_probe

    nc = json.load(open(os.path.join(_tiny_setup(tmp_path), "net_config.json")))
    Model(nc).validate_shapes()
    assert fold_probe.folded_train_compiles(nc, 8) is True

    def boom(*a, **k):
        raise AssertionError("probe respawned despite cached verdict")

    monkeypatch.setattr(fold_probe.subprocess, "run", boom)
    assert fold_probe.folded_train_compiles(nc, 8) is True
    # a different batch is a different executable: must re-probe
    with np.testing.assert_raises(AssertionError):
        fold_probe.folded_train_compiles(nc, 16)


def test_failed_probe_verdict_trains_unfolded(tmp_path, caplog, monkeypatch):
    """A cached negative verdict (e.g. the TPU space-to-batch CHECK
    crash recorded on a previous run) keeps training unfolded without
    re-spawning the probe."""
    import logging

    monkeypatch.setenv("BS_CACHE_DIR", str(tmp_path / "cache"))
    setup_dir = _tiny_setup(tmp_path)
    from bootstrapper_tpu.train import fold_probe

    nc = json.load(open(os.path.join(setup_dir, "net_config.json")))
    os.makedirs(tmp_path / "cache")
    key = fold_probe._probe_key(nc, 8)
    json.dump(
        {key: {"ok": False, "batch": 8, "rc": -6, "why": "CHECK"}},
        open(tmp_path / "cache" / "fold_probe.json", "w"),
    )
    monkeypatch.setattr(
        fold_probe.subprocess, "run",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("respawned")),
    )
    toml = str(tmp_path / "train.toml")
    tomlio.dump({"train": {
        "setup_dir": setup_dir, "voxel_size": [1, 1, 1],
        "max_iterations": 2, "save_checkpoints_every": 2,
        "save_snapshots_every": 0, "batch_size": 8,
    }}, toml)
    with caplog.at_level(logging.INFO, logger="bootstrapper_tpu.workflows.train"):
        res = run_training(toml)
    assert np.isfinite(res["final_loss"])
    assert not any("fold probe passed" in r.message for r in caplog.records)


def test_rss_watchdog_checkpoints_and_stops(tmp_path, monkeypatch, caplog):
    """The relay-client host-memory leak (BASELINE.md round 4) is
    unreclaimable in-process: past BS_MAX_RSS_GB the trainer must
    checkpoint, stop cleanly, and flag the result so the caller can
    resume in a fresh process."""
    import logging

    monkeypatch.setenv("BS_MAX_RSS_GB", "0.0001")  # trips immediately
    monkeypatch.setenv("BS_RSS_CHECK_EVERY", "2")
    setup_dir = _tiny_setup(tmp_path)
    toml = str(tmp_path / "train.toml")
    tomlio.dump({"train": {
        "setup_dir": setup_dir, "voxel_size": [1, 1, 1],
        "max_iterations": 6, "save_checkpoints_every": 100,
        "save_snapshots_every": 0,
    }}, toml)
    with caplog.at_level(
        logging.WARNING, logger="bootstrapper_tpu.workflows.train"
    ):
        res = run_training(toml)
    assert res["rss_limit_hit"] is True
    assert res["iterations"] == 2  # stopped at the first check
    assert res["checkpoint"].endswith("model_checkpoint_2")
    assert os.path.exists(res["checkpoint"])
    assert any("BS_MAX_RSS_GB" in r.message for r in caplog.records)

    # a fresh run resumes from the watchdog checkpoint
    monkeypatch.setenv("BS_MAX_RSS_GB", "0")  # watchdog off
    res2 = run_training(toml)
    assert res2["rss_limit_hit"] is False
    assert res2["iterations"] == 6
    assert res2["checkpoint"].endswith("model_checkpoint_6")


def test_fold_probe_disabled_by_env(tmp_path, monkeypatch):
    monkeypatch.setenv("BS_FOLD_PROBE", "0")
    from bootstrapper_tpu.train import fold_probe

    monkeypatch.setattr(
        fold_probe, "folded_train_compiles",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("probed")),
    )
    setup_dir = _tiny_setup(tmp_path)
    toml = str(tmp_path / "train.toml")
    tomlio.dump({"train": {
        "setup_dir": setup_dir, "voxel_size": [1, 1, 1],
        "max_iterations": 2, "save_checkpoints_every": 2,
        "save_snapshots_every": 0, "batch_size": 8,
    }}, toml)
    res = run_training(toml)
    assert np.isfinite(res["final_loss"])


def test_stall_watchdog_fires_after_timeout(monkeypatch):
    """A missing heartbeat past the timeout triggers the die action;
    beats keep it quiet (unit-level: _die stubbed, nothing exits)."""
    import time as _time

    from bootstrapper_tpu.workflows.train import _StallWatchdog

    w = _StallWatchdog(timeout_s=0.2, setup_dir="/tmp/x")
    died = []
    monkeypatch.setattr(w, "_die", lambda: died.append(True))
    w._thread.start()
    for _ in range(4):  # heartbeats hold it off
        w.beat(1)
        _time.sleep(0.1)
    assert not died
    _time.sleep(1.0)  # no beats: must fire
    assert died
    w.stop()


def test_stall_watchdog_respawn_exhaustion(monkeypatch):
    """After BS_STALL_MAX_RESPAWNS re-execs, the watchdog exits 113
    instead of looping forever on a dead relay."""
    from bootstrapper_tpu.utils import stall as S
    from bootstrapper_tpu.workflows import train as T

    w = T._StallWatchdog(timeout_s=1, setup_dir="/tmp/x")
    calls = []
    monkeypatch.setattr(S.os, "execv", lambda *a: calls.append("execv"))
    monkeypatch.setattr(S.os, "_exit", lambda c: calls.append(c))
    monkeypatch.setenv("BS_STALL_RESPAWN", "1")
    monkeypatch.setenv("BS_STALL_MAX_RESPAWNS", "3")
    monkeypatch.setenv("BS_STALL_RESPAWN_COUNT", "3")  # exhausted
    w._die()
    assert calls == [113]
    monkeypatch.setenv("BS_STALL_RESPAWN_COUNT", "1")
    w._die()
    # the stubbed execv returns (the real one replaces the process),
    # so the fall-through _exit also records — execv must have fired
    assert calls[1] == "execv"
    assert os.environ["BS_STALL_RESPAWN_COUNT"] == "2"


def test_stall_watchdog_disabled_by_env(monkeypatch):
    from bootstrapper_tpu.workflows.train import _StallWatchdog

    monkeypatch.setenv("BS_STALL_TIMEOUT_S", "0")
    assert _StallWatchdog.start_if_enabled("/tmp/x") is None
