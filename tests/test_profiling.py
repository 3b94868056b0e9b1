import json
import os

from bootstrapper_tpu.utils.profiling import jax_trace, stage_timer


def test_stage_timer_logs(tmp_path):
    log = str(tmp_path / "stages.jsonl")
    with stage_timer("fragments", log):
        pass
    with stage_timer("agglomerate", log):
        pass
    entries = [json.loads(l) for l in open(log)]
    assert [e["stage"] for e in entries] == ["fragments", "agglomerate"]
    assert all(e["seconds"] >= 0 for e in entries)


def test_jax_trace_noop_without_env(monkeypatch):
    monkeypatch.delenv("BS_PROFILE", raising=False)
    with jax_trace("t"):
        pass  # must not require jax profiler infra


def test_jax_trace_writes_when_enabled(tmp_path, monkeypatch):
    monkeypatch.setenv("BS_PROFILE", str(tmp_path))
    import jax
    import jax.numpy as jnp

    with jax_trace("unit"):
        jnp.ones((8, 8)).sum().block_until_ready()
    assert os.path.isdir(str(tmp_path / "unit"))
