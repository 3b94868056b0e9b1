import threading
import time

import numpy as np
import pytest

from bootstrapper_tpu.core.blockwise import (
    Block,
    BlockwiseTask,
    run_blockwise,
    run_blockwise_or_raise,
)
from bootstrapper_tpu.core.geometry import Coordinate, Roi


def _task(**kw):
    defaults = dict(
        name="t",
        total_roi=Roi((0, 0), (100, 100)),
        write_size=Coordinate(30, 30),
        context_neg=Coordinate(0, 0),
        context_pos=Coordinate(0, 0),
        process=lambda b: None,
        num_workers=4,
    )
    defaults.update(kw)
    return BlockwiseTask(**defaults)


def test_block_grid_shrink_covers_total():
    t = _task(fit="shrink")
    blocks = t.blocks()
    covered = np.zeros((100, 100), int)
    for b in blocks:
        covered[b.write_roi.to_slices()] += 1
    assert (covered == 1).all()  # exact partition, no overlap


def test_block_grid_overhang():
    t = _task(fit="overhang")
    blocks = t.blocks()
    assert all(b.write_roi.shape == Coordinate(30, 30) for b in blocks)
    ends = {tuple(b.write_roi.end) for b in blocks}
    assert (120, 120) in ends  # last block overhangs


def test_block_ids_stable_and_unique():
    t = _task()
    ids1 = [b.block_id for b in t.blocks()]
    ids2 = [b.block_id for b in t.blocks()]
    assert ids1 == ids2
    assert len(set(ids1)) == len(ids1)


def test_read_roi_context():
    t = _task(context_neg=Coordinate(5, 5), context_pos=Coordinate(7, 7))
    b = t.blocks()[0]
    assert b.read_roi == b.write_roi.grow((5, 5), (7, 7))


def test_all_blocks_processed():
    seen = []
    lock = threading.Lock()

    def proc(b):
        with lock:
            seen.append(b.block_id)

    t = _task(process=proc)
    res = run_blockwise(t)
    assert res.ok
    assert sorted(seen) == sorted(b.block_id for b in t.blocks())


def test_retries_then_success():
    attempts = {}
    lock = threading.Lock()

    def flaky(b):
        with lock:
            attempts[b.block_id] = attempts.get(b.block_id, 0) + 1
            if attempts[b.block_id] < 3:
                raise RuntimeError("flaky")

    t = _task(process=flaky, max_retries=5)
    res = run_blockwise(t)
    assert res.ok
    assert all(v == 3 for v in attempts.values())


def test_failure_escalates():
    def bad(b):
        raise RuntimeError("always fails")

    t = _task(process=bad, max_retries=1)
    res = run_blockwise(t)
    assert not res.ok
    with pytest.raises(RuntimeError):
        run_blockwise_or_raise(_task(process=bad, max_retries=0))


def test_conflict_waves_never_overlap_neighbors():
    """With read_write_conflict, concurrently-running blocks must never
    have overlapping read/write regions."""
    active = set()
    lock = threading.Lock()
    violations = []

    def proc(b):
        with lock:
            for other in active:
                if b.read_roi.intersects(other):
                    violations.append((b.block_id, other))
            active.add(b.write_roi)
        time.sleep(0.01)
        with lock:
            active.discard(b.write_roi)

    t = _task(
        process=proc,
        context_neg=Coordinate(5, 5),
        context_pos=Coordinate(5, 5),
        read_write_conflict=True,
        num_workers=8,
    )
    res = run_blockwise(t)
    assert res.ok
    assert violations == []


def test_conflict_single_wave_when_no_context():
    t = _task(read_write_conflict=True)
    phases = t._phases(t.blocks())
    assert len(phases) == 1


def test_block_sharding():
    t0 = _task(block_stride=2, block_offset=0)
    t1 = _task(block_stride=2, block_offset=1)
    ids0 = {b.block_id for b in t0.blocks()}
    ids1 = {b.block_id for b in t1.blocks()}
    all_ids = {b.block_id for b in _task().blocks()}
    assert ids0 | ids1 == all_ids
    assert not (ids0 & ids1)


def test_skipped_blocks_counted():
    t = _task(process=lambda b: "skipped" if b.block_id == 0 else None)
    res = run_blockwise(t)
    assert res.ok
    assert res.skipped == 1


def test_fault_injection_exercises_retries():
    t = _task(inject_fault_rate=0.3, max_retries=10)
    res = run_blockwise(t)
    assert res.ok  # retries absorb injected faults


def test_fault_injection_certain_failure():
    t = _task(inject_fault_rate=1.0, max_retries=2)
    res = run_blockwise(t)
    assert not res.ok
    assert res.failed == res.total_blocks


def test_audit_passes_for_clean_task():
    t = _task(
        audit=True,
        read_write_conflict=True,
        context_neg=Coordinate(5, 5),
        context_pos=Coordinate(5, 5),
    )
    res = run_blockwise(t)
    assert res.ok


def test_audit_catches_engineered_race():
    """Declare zero context (single wave) but read beyond the write
    block inside process: the audit must flag the overlap."""
    def proc(b):
        time.sleep(0.005)

    t = _task(
        audit=True,
        read_write_conflict=True,
        process=proc,
        # context makes read ROIs overlap neighbours...
        context_neg=Coordinate(5, 5),
        context_pos=Coordinate(5, 5),
    )
    # ...but force a single wave by bypassing phase separation
    t._phases = lambda blocks: [blocks]
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="race audit"):
        run_blockwise(t)


def test_wave_phases_respect_wide_context():
    """Context wider than the write size needs MORE than red-black: two
    same-parity blocks two grid steps apart would still overlap (the
    read halo reaches across the intervening block)."""
    t = _task(
        total_roi=Roi((0,), (100,)),
        write_size=Coordinate(10),
        context_neg=Coordinate(15),
        context_pos=Coordinate(15),
        read_write_conflict=True,
    )
    for phase in t._phases(t.blocks()):
        for i, a in enumerate(phase):
            for b in phase[i + 1:]:
                assert not a.read_roi.intersects(b.write_roi), (a, b)
                assert not b.read_roi.intersects(a.write_roi), (a, b)


def test_wave_phases_standard_context_stay_red_black():
    t = _task(
        total_roi=Roi((0,), (100,)),
        write_size=Coordinate(10),
        context_neg=Coordinate(5),
        context_pos=Coordinate(5),
        read_write_conflict=True,
    )
    assert len(t._phases(t.blocks())) == 2


def test_process_returning_array_is_not_skipped():
    """numpy 2.x: array == 'skipped' is an elementwise comparison whose
    truthiness raises — a successful block must not become a failure."""
    t = _task(process=lambda b: np.zeros(3))
    res = run_blockwise(t)
    assert res.ok and res.failed == 0 and res.skipped == 0


def test_ledger_geometry_fingerprint(tmp_path):
    led = str(tmp_path / "led.db")
    t = _task(ledger=led)
    assert run_blockwise(t).ok
    # same geometry resumes fine (everything already done)
    res = run_blockwise(_task(ledger=led))
    assert res.ok and res.skipped == res.total_blocks
    # changed geometry must fail loudly instead of skipping stale ids
    with pytest.raises(ValueError, match="different block geometry"):
        run_blockwise(_task(ledger=led, write_size=Coordinate(20, 20)))


def test_ledger_count_done_dedups_across_chunks(tmp_path):
    from bootstrapper_tpu.core.blockwise import Ledger

    led = Ledger(str(tmp_path / "led.db"))
    for i in range(500):
        led.mark_done("t", i)
    # 501 requested ids, one duplicated across the 500-id chunk boundary;
    # id 999 is NOT done, so the count must stay below the deduped want
    ids = list(range(500)) + [0, 999]
    assert led.count_done("t", ids) == 500


def test_failure_reports_full_grid(tmp_path):
    def boom(b):
        raise RuntimeError("nope")

    t = _task(
        process=boom,
        read_write_conflict=True,
        context_neg=Coordinate(5, 5),
        context_pos=Coordinate(5, 5),
        max_retries=0,
    )
    res = run_blockwise(t)
    # only the first wave ran (failure breaks out), but the report still
    # covers the whole grid
    assert res.total_blocks == len(t.blocks())
    assert res.failed < res.total_blocks
