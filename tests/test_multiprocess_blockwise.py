"""Multi-process blockwise: completion ledger, crash-isolated sharded
workers, and cross-process pipeline equivalence.

Reference capability: daisy's worker-subprocess model with per-block
retries (``bootstrapper/predict.py:27-50``)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from bootstrapper_tpu.core.blockwise import (
    BlockwiseTask,
    Ledger,
    run_blockwise,
    run_sharded_subprocesses,
)
from bootstrapper_tpu.core.geometry import Coordinate, Roi


def _task(tmp_path, seen, **kw):
    def process(block):
        seen.append(block.block_id)

    defaults = dict(
        name="t",
        total_roi=Roi((0, 0), (40, 40)),
        write_size=Coordinate(10, 10),
        context_neg=Coordinate(0, 0),
        context_pos=Coordinate(0, 0),
        process=process,
        num_workers=2,
    )
    defaults.update(kw)
    return BlockwiseTask(**defaults)


class TestLedger:
    def test_mark_and_query(self, tmp_path):
        led = Ledger(str(tmp_path / "led.db"))
        led.mark_done("a", 1)
        led.mark_done("a", 2)
        led.mark_done("b", 1)
        assert led.done_blocks("a") == {1, 2}
        assert led.count_done("a") == 2
        assert led.count_done("a", [1, 5]) == 1
        led.wait_for("a", [1, 2], timeout=1)

    def test_count_done_large_id_list(self, tmp_path):
        """End-of-stage barriers pass the whole block grid; the IN()
        query must chunk below SQLite's bound-variable cap."""
        led = Ledger(str(tmp_path / "led.db"))
        for i in range(0, 3000, 2):
            led.mark_done("a", i)
        assert led.count_done("a", list(range(3000))) == 1500

    def test_wait_timeout(self, tmp_path):
        led = Ledger(str(tmp_path / "led.db"))
        with pytest.raises(TimeoutError):
            led.wait_for("a", [7], timeout=0.3, poll=0.05)

    def test_resume_skips_done_blocks(self, tmp_path):
        seen = []
        ledger = str(tmp_path / "led.db")
        t = _task(tmp_path, seen, ledger=ledger)
        r1 = run_blockwise(t)
        assert r1.ok and r1.succeeded == 16 and sorted(seen) == list(range(16))
        seen.clear()
        r2 = run_blockwise(_task(tmp_path, seen, ledger=ledger))
        assert r2.ok and r2.succeeded == 0 and r2.skipped == 16
        assert seen == []

    def test_sharded_conflict_without_ledger_rejected(self, tmp_path):
        t = _task(
            tmp_path, [], read_write_conflict=True,
            context_neg=Coordinate(2, 2), context_pos=Coordinate(2, 2),
            block_stride=2,
        )
        with pytest.raises(ValueError, match="ledger"):
            run_blockwise(t)


WORKER_SCRIPT = r"""
import os, sys
shard, marker_dir = int(sys.argv[1]), sys.argv[2]
crash_flag = os.path.join(marker_dir, f"crashed_{shard}")
if shard == 1 and not os.path.exists(crash_flag):
    open(crash_flag, "w").write("x")
    os._exit(139)  # simulated segfault on first attempt
open(os.path.join(marker_dir, f"done_{shard}"), "w").write("ok")
"""


class TestShardedSubprocesses:
    def test_crashed_worker_is_respawned(self, tmp_path):
        script = tmp_path / "worker.py"
        script.write_text(WORKER_SCRIPT)

        def make_argv(i, n):
            return [sys.executable, str(script), str(i), str(tmp_path)]

        run_sharded_subprocesses(make_argv, 3, max_restarts=2, poll=0.05)
        for i in range(3):
            assert (tmp_path / f"done_{i}").exists()
        assert (tmp_path / "crashed_1").exists()

    def test_permanent_failure_raises(self, tmp_path):
        def make_argv(i, n):
            return [sys.executable, "-c", "import sys; sys.exit(3)"]

        with pytest.raises(RuntimeError, match="failed after retries"):
            run_sharded_subprocesses(make_argv, 2, max_restarts=1, poll=0.05)


@pytest.fixture(scope="module")
def affs_zarr(tmp_path_factory):
    from bootstrapper_tpu.core.arrays import prepare_ds

    root = tmp_path_factory.mktemp("mp_seg")
    rng = np.random.default_rng(0)
    # blocky ground truth -> crisp affinities
    labels = np.zeros((8, 64, 64), np.uint64)
    labels[:, :32, :32] = 1
    labels[:, :32, 32:] = 2
    labels[:, 32:, :] = 3
    affs = np.zeros((3, 8, 64, 64), np.float32)
    for c, off in enumerate([(1, 0, 0), (0, 1, 0), (0, 0, 1)]):
        shifted = np.roll(labels, shift=[-o for o in off], axis=(0, 1, 2))
        affs[c] = (labels == shifted) & (labels > 0)
    affs += rng.uniform(0, 0.05, affs.shape).astype(np.float32)
    affs = np.clip(affs, 0, 1)
    path = str(root / "affs.zarr/affs")
    ds = prepare_ds(
        path, affs.shape, (0, 0, 0), (1, 1, 1), np.float32,
        chunk_shape=(3, 4, 32, 32), axis_names=("c^", "z", "y", "x"),
    )
    ds[:] = affs
    return path, str(root)


PIPE_KW = dict(
    block_shape=(4, 32, 32),
    context_voxels=(1, 4, 4),
    thresholds=[0.5],
    num_workers=2,
)


@pytest.fixture(scope="module")
def single_run(affs_zarr):
    from bootstrapper_tpu.post.blockwise_seg import waterz_pipeline_blockwise

    affs_path, root = affs_zarr
    return waterz_pipeline_blockwise(affs_path, f"{root}/single.zarr",
                                     **PIPE_KW)


@pytest.mark.slow
def test_sharded_pipeline_matches_single_process(affs_zarr, single_run):
    from bootstrapper_tpu.core.arrays import open_ds
    from bootstrapper_tpu.post.blockwise_seg import waterz_pipeline_blockwise

    affs_path, root = affs_zarr
    single = single_run
    multi = waterz_pipeline_blockwise(
        affs_path, f"{root}/multi.zarr", workers=2, **PIPE_KW
    )
    f1 = open_ds(f"{root}/single.zarr/fragments_ws").to_ndarray()
    f2 = open_ds(f"{root}/multi.zarr/fragments_ws").to_ndarray()
    np.testing.assert_array_equal(f1, f2)
    s1 = open_ds(single[0.5]).to_ndarray()
    s2 = open_ds(multi[0.5]).to_ndarray()
    np.testing.assert_array_equal(s1, s2)
    # the ledger recorded the sharded run
    led = Ledger(f"{root}/multi.zarr/ledger_ws.db")
    assert led.count_done("extract_fragments_ws") > 0
    assert led.count_done("agglomerate_ws") > 0


@pytest.mark.slow
def test_sharded_pipeline_survives_worker_crash(affs_zarr, single_run, monkeypatch):
    """A shard that dies mid-pipeline is respawned and completes via the
    ledger (skipping already-done blocks)."""
    from bootstrapper_tpu.core.arrays import open_ds
    from bootstrapper_tpu.post import blockwise_seg as B

    affs_path, root = affs_zarr
    crash_flag = f"{root}/crash_once"

    orig = B._run_sharded

    def crashy(func_name, kwargs, workers):
        import json

        from bootstrapper_tpu.core.blockwise import (
            host_only_env,
            run_sharded_subprocesses,
        )

        kw = dict(kwargs)
        roi = kw.get("roi")
        if roi is not None:
            kw["roi"] = [list(roi.offset), list(roi.shape)]

        def make_argv(i, n):
            blob = json.dumps({**kw, "block_stride": n, "block_offset": i,
                               "workers": 1})
            crash = (
                "import os\n"
                f"if {i} == 1 and not os.path.exists({crash_flag!r}):\n"
                f"    open({crash_flag!r}, 'w').write('x')\n"
                "    os._exit(139)\n"
            )
            code = (
                crash
                + "import json\n"
                "from bootstrapper_tpu.post import blockwise_seg as B\n"
                "from bootstrapper_tpu.core.geometry import Roi\n"
                f"kw = json.loads({blob!r})\n"
                "if kw.get('roi'):\n"
                "    kw['roi'] = Roi(*kw['roi'])\n"
                f"B.{func_name}(**kw)\n"
            )
            return [sys.executable, "-c", code]

        # host_only_env strips the axon sitecustomize: without it the
        # workers inherit the relay plugin and jax.devices() hangs
        # whenever the TPU relay is unreachable (JAX_PLATFORMS=cpu in
        # the env does NOT override a sitecustomize-registered plugin)
        run_sharded_subprocesses(make_argv, workers, max_restarts=2,
                                 env=host_only_env())

    monkeypatch.setattr(B, "_run_sharded", crashy)
    segs = B.waterz_pipeline_blockwise(
        affs_path, f"{root}/crashy.zarr",
        block_shape=(4, 32, 32), context_voxels=(1, 4, 4),
        thresholds=[0.5], num_workers=2, workers=2,
    )
    assert os.path.exists(crash_flag)
    f1 = open_ds(f"{root}/single.zarr/fragments_ws").to_ndarray()
    f3 = open_ds(f"{root}/crashy.zarr/fragments_ws").to_ndarray()
    np.testing.assert_array_equal(f1, f3)
    s1 = open_ds(f"{root}/single.zarr/segmentations_ws/mean--0_5").to_ndarray()
    s3 = open_ds(segs[0.5]).to_ndarray()
    np.testing.assert_array_equal(s1, s3)


@pytest.mark.slow
def test_shard0_crash_after_setup_does_not_wipe_output(
    affs_zarr, single_run, monkeypatch
):
    """Shard 0 owns dataset/RAG creation.  If it crashes *after* setup
    (and after other shards wrote blocks) its respawn must NOT re-enter
    the create branch: prepare_ds(mode='w')/RagDB(mode='w') would wipe
    data the ledger still marks done, which is then never rewritten —
    silent zero output in exactly the crash case the ledger exists for."""
    from bootstrapper_tpu.core.arrays import open_ds
    from bootstrapper_tpu.post import blockwise_seg as B

    affs_path, root = affs_zarr
    crash_flag = f"{root}/crash0_once"

    def crashy(func_name, kwargs, workers):
        import json

        from bootstrapper_tpu.core.blockwise import (
            host_only_env,
            run_sharded_subprocesses,
        )

        kw = dict(kwargs)
        roi = kw.get("roi")
        if roi is not None:
            kw["roi"] = [list(roi.offset), list(roi.shape)]

        def make_argv(i, n):
            blob = json.dumps({**kw, "block_stride": n, "block_offset": i,
                               "workers": 1})
            # shard 0: run the fragment-extraction stage to completion
            # (setup done, own blocks ledgered), then die once
            patch = (
                "import os\n"
                "from bootstrapper_tpu.post import blockwise_seg as B\n"
                "_orig = B.extract_fragments_blockwise\n"
                "def _crash_after(*a, **k):\n"
                "    r = _orig(*a, **k)\n"
                f"    if {i} == 0 and not os.path.exists({crash_flag!r}):\n"
                f"        open({crash_flag!r}, 'w').write('x')\n"
                "        os._exit(139)\n"
                "    return r\n"
                "B.extract_fragments_blockwise = _crash_after\n"
            )
            code = (
                patch
                + "import json\n"
                "from bootstrapper_tpu.core.geometry import Roi\n"
                f"kw = json.loads({blob!r})\n"
                "if kw.get('roi'):\n"
                "    kw['roi'] = Roi(*kw['roi'])\n"
                f"B.{func_name}(**kw)\n"
            )
            return [sys.executable, "-c", code]

        run_sharded_subprocesses(make_argv, workers, max_restarts=2,
                                 env=host_only_env())

    monkeypatch.setattr(B, "_run_sharded", crashy)
    segs = B.waterz_pipeline_blockwise(
        affs_path, f"{root}/crashy0.zarr",
        block_shape=(4, 32, 32), context_voxels=(1, 4, 4),
        thresholds=[0.5], num_workers=2, workers=2,
    )
    assert os.path.exists(crash_flag)
    f1 = open_ds(f"{root}/single.zarr/fragments_ws").to_ndarray()
    f3 = open_ds(f"{root}/crashy0.zarr/fragments_ws").to_ndarray()
    np.testing.assert_array_equal(f1, f3)
    s1 = open_ds(f"{root}/single.zarr/segmentations_ws/mean--0_5").to_ndarray()
    s3 = open_ds(segs[0.5]).to_ndarray()
    np.testing.assert_array_equal(s1, s3)


def test_cli_segment_workers_override(affs_zarr, single_run):
    """bs segment -p workers=N drives the crash-isolated sharded
    pipeline through the CLI (daisy num_workers analog)."""
    from click.testing import CliRunner

    from bootstrapper_tpu.cli import cli
    from bootstrapper_tpu.core.arrays import open_ds
    from bootstrapper_tpu.utils import tomlio

    affs_path, root = affs_zarr
    cfg = {
        "segment": {
            "vol": {
                "affs_dataset": affs_path,
                "seg_dataset_prefix": f"{root}/cli.zarr/segmentations",
                "blockwise": True,
                "block_shape": [4, 32, 32],
                "context": [1, 4, 4],
                "num_workers": 2,
                "ws_params": {"thresholds": [0.5]},
            }
        }
    }
    toml = f"{root}/seg_cli.toml"
    tomlio.dump(cfg, toml)
    result = CliRunner().invoke(
        cli, ["segment", toml, "-p", "workers=2"], catch_exceptions=False
    )
    assert result.exit_code == 0, result.output
    s1 = open_ds(f"{root}/single.zarr/segmentations_ws/mean--0_5").to_ndarray()
    s2 = open_ds(f"{root}/cli.zarr/segmentations_ws/mean--0_5").to_ndarray()
    np.testing.assert_array_equal(s1, s2)


def test_dir_ledger_api_and_dispatch(tmp_path):
    """DirLedger (shared-filesystem marker files) matches the SQLite
    Ledger API; open_ledger picks the backend by path shape."""
    from bootstrapper_tpu.core.blockwise import DirLedger, open_ledger

    led = open_ledger(str(tmp_path / "led.d"))
    assert isinstance(led, DirLedger)
    assert isinstance(open_ledger(str(tmp_path / "led.db")), Ledger)

    led.mark_done("stage", 3)
    led.mark_done("stage", 7)
    led.mark_done("stage", 7)  # idempotent re-mark
    assert led.done_blocks("stage") == {3, 7}
    assert led.count_done("stage") == 2
    assert led.count_done("stage", [3, 4, 5]) == 1
    led.wait_for("stage", [3, 7], timeout=1.0)
    with pytest.raises(TimeoutError):
        led.wait_for("stage", [3, 7, 9], timeout=0.3)
    # second process/host sees the same markers through the filesystem
    led2 = open_ledger(str(tmp_path / "led.d"))
    assert led2.done_blocks("stage") == {3, 7}
    assert led2.done_blocks("other") == set()


@pytest.mark.slow
def test_sharded_pipeline_with_dir_ledger(affs_zarr, single_run):
    """The sharded subprocess pipeline synchronises correctly through a
    marker-file ledger (the cross-host story: SQLite WAL is single-host,
    the .d backend is NFS-safe)."""
    from bootstrapper_tpu.core.arrays import open_ds
    from bootstrapper_tpu.post.blockwise_seg import waterz_pipeline_blockwise

    affs_path, root = affs_zarr
    waterz_pipeline_blockwise(
        affs_path, f"{root}/dirled.zarr", workers=2,
        ledger=f"{root}/dirled.zarr/ledger_ws.d", **PIPE_KW
    )
    f1 = open_ds(f"{root}/single.zarr/fragments_ws").to_ndarray()
    f2 = open_ds(f"{root}/dirled.zarr/fragments_ws").to_ndarray()
    np.testing.assert_array_equal(f1, f2)
    s1 = open_ds(f"{root}/single.zarr/segmentations_ws/mean--0_5").to_ndarray()
    s2 = open_ds(f"{root}/dirled.zarr/segmentations_ws/mean--0_5").to_ndarray()
    np.testing.assert_array_equal(s1, s2)


def test_multihost_simulation_dirledger_pg(tmp_path, monkeypatch):
    """The complete multi-host deployment story on one box: crash-
    isolated worker processes that share ONLY a filesystem (DirLedger
    marker files) and a database (PgRagDB via the psycopg2 shim) —
    no SQLite WAL, no shared memory.  Output equals the single-process
    SQLite run."""
    import json

    from bootstrapper_tpu.core.arrays import open_ds, prepare_ds
    from bootstrapper_tpu.ops.affinities import seg_to_affs
    from bootstrapper_tpu.post.blockwise_seg import waterz_pipeline_blockwise

    # a psycopg2 alias module importable by the worker subprocesses
    pypath = tmp_path / "pypath"
    pypath.mkdir()
    tests_dir = os.path.dirname(os.path.abspath(__file__))
    (pypath / "psycopg2.py").write_text(
        "import os, sys\n"
        f"sys.path.insert(0, {tests_dir!r})\n"
        "import fake_psycopg2\n"
        "fake_psycopg2.BASE_DIR = os.environ['FAKE_PG_DIR']\n"
        "connect = fake_psycopg2.connect\n"
    )
    monkeypatch.setenv("FAKE_PG_DIR", str(tmp_path))
    monkeypatch.setenv(
        "PYTHONPATH",
        str(pypath) + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )

    seg = np.zeros((8, 32, 32), np.uint64)
    seg[:, :16] = 1
    seg[:, 16:] = 2
    affs = (np.asarray(
        seg_to_affs(seg, [[-1, 0, 0], [0, -1, 0], [0, 0, -1]])
    ) * 255).astype(np.uint8)
    ds = prepare_ds(
        str(tmp_path / "v.zarr/affs"), affs.shape, (0, 0, 0), (1, 1, 1),
        np.uint8,
    )
    ds[ds.roi] = affs
    kw = dict(
        block_shape=(4, 16, 16), context_voxels=(1, 4, 4),
        thresholds=[0.5], filter_fragments=0.0, num_workers=2,
    )
    ref = waterz_pipeline_blockwise(
        str(tmp_path / "v.zarr/affs"), str(tmp_path / "ref.zarr"), **kw
    )
    got = waterz_pipeline_blockwise(
        str(tmp_path / "v.zarr/affs"), str(tmp_path / "mh.zarr"),
        workers=2,
        ledger=str(tmp_path / "mh.zarr/ledger.d"),
        db={"db_name": "multihost", "db_host": "anywhere"},
        **kw,
    )
    a = open_ds(ref[0.5]).to_ndarray()
    b = open_ds(got[0.5]).to_ndarray()
    # same partition (ids may differ)
    from bootstrapper_tpu.eval.voi import rand_voi

    scores = rand_voi(a, b)
    assert scores["voi_split"] + scores["voi_merge"] == pytest.approx(0)
    # the RAG really went through the pg backend, markers through the dir
    assert (tmp_path / "fakepg_multihost.sqlite").exists()
    assert (tmp_path / "mh.zarr/ledger.d").is_dir()


@pytest.mark.slow
def test_sharded_mws_matches_single_process(affs_zarr):
    """The mutex pipeline's two RAG edge populations (adj + lr) must
    survive the crash-isolated sharded-worker path: same fragments and
    the same global mutex segmentation as the single-process run."""
    from bootstrapper_tpu.core.arrays import open_ds
    from bootstrapper_tpu.post.blockwise_seg import mws_pipeline_blockwise

    affs_path, root = affs_zarr
    kw = dict(
        neighborhood=[[-1, 0, 0], [0, -1, 0], [0, 0, -1]],
        bias=[-0.4, -0.4, -0.4],
        block_shape=(4, 32, 32),
        context_voxels=(1, 4, 4),
        filter_fragments=0.0,
        noise_eps=None,
        sigma=None,
        num_workers=2,
    )
    single = mws_pipeline_blockwise(
        affs_path, f"{root}/mws_single.zarr", **kw
    )
    multi = mws_pipeline_blockwise(
        affs_path, f"{root}/mws_multi.zarr", workers=2, **kw
    )
    s1 = open_ds(single["mws"]).to_ndarray()
    s2 = open_ds(multi["mws"]).to_ndarray()
    # identical partitions up to label renaming: compare co-partitions
    from bootstrapper_tpu.eval.voi import rand_voi

    scores = rand_voi(s1, s2)
    assert scores["voi_split"] + scores["voi_merge"] < 1e-6, scores
