"""Blockwise task engine: ROI decomposition, wave scheduling, retries.

The daisy replacement (reference usage: ``bootstrapper/predict.py:20-44``,
``post/blockwise/*``, ``data/{mask,clahe,scale_pyramid,merge}.py``).
Capabilities preserved:

- a task = total ROI + write-block size + read context; the write grid
  tiles the total ROI, reads grow each write block by the context
  (``read_roi = write_roi.grow(context)``);
- ``fit``: 'shrink' drops out-of-bounds remainder (write clipped to the
  total ROI), 'overhang' lets the write block extend past it;
- ``read_write_conflict=True`` serialises neighbouring blocks whose
  read halo overlaps others' writes via red-black (2^d-phase
  checkerboard) wave scheduling — same correctness guarantee as
  daisy's conflict ordering, but deterministic and deadlock-free;
- per-block retries (default 5, reference ``predict.py:36``) and a
  boolean outcome the callers escalate to RuntimeError;
- linear ``block_id`` in the write grid (stable across runs — used for
  block-unique fragment id bumping, ``hglom/frags.py:195-198``).

Host-side execution is a thread pool: the heavy work inside blocks is
TensorStore IO, native C++ graph code, and XLA dispatches — all release
the GIL. Cross-host scale-out keeps the reference's "communicate via
the store" design: stages hand off through Zarr + SQLite, so N
processes/hosts can each run a shard of the block grid (``block_stride``
/ ``block_offset``) without a central scheduler.
"""

from __future__ import annotations

import logging
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence

import numpy as np

from .geometry import Coordinate, Roi

logger = logging.getLogger(__name__)


@dataclass
class Block:
    block_id: int
    read_roi: Roi
    write_roi: Roi
    grid_index: tuple
    attempts: int = 0

    @property
    def id(self):  # daisy-compatible alias
        return self.block_id


@dataclass
class BlockwiseTask:
    name: str
    total_roi: Roi
    write_size: Coordinate
    context_neg: Coordinate
    context_pos: Coordinate
    process: Callable[[Block], object]
    fit: str = "shrink"  # 'shrink' | 'overhang'
    read_write_conflict: bool = False
    max_retries: int = 5
    num_workers: int = 8
    # shard the grid across cooperating processes/hosts (store-mediated)
    block_stride: int = 1
    block_offset: int = 0
    # race detection: audit that no concurrently-running blocks overlap
    # write/write (always a bug) or read/write (when conflicts declared);
    # violations fail the task (the reference has no such check — its
    # correctness was by construction only, SURVEY §5)
    audit: bool = False
    # fault injection: probability that a block raises on each attempt
    # (exercises the retry ledger; used by tests/chaos runs)
    inject_fault_rate: float = 0.0

    def blocks(self) -> list:
        """Enumerate the write grid with block ids and grown read ROIs."""
        total = self.total_roi
        ws = Coordinate(self.write_size)
        counts = []
        for b, e, s in zip(total.begin, total.end, ws):
            n = max(1, -(-(e - b) // s))
            counts.append(n)
        blocks = []
        for flat in range(int(np.prod(counts))):
            idx = []
            rem = flat
            for n in reversed(counts):
                idx.append(rem % n)
                rem //= n
            idx = tuple(reversed(idx))
            begin = Coordinate(
                b + i * s for b, i, s in zip(total.begin, idx, ws)
            )
            write = Roi(begin, ws)
            if self.fit == "shrink":
                write = write.intersect(total)
                if write.empty:
                    continue
            elif self.fit != "overhang":
                raise ValueError(f"unknown fit {self.fit!r}")
            read = write.grow(self.context_neg, self.context_pos)
            blocks.append(Block(flat, read, write, idx))
        if self.block_stride > 1:
            blocks = [
                b
                for b in blocks
                if b.block_id % self.block_stride == self.block_offset
            ]
        return blocks

    def _phases(self, blocks: list) -> list:
        """Group blocks into conflict-free waves.

        Without conflicts: one wave. With read-write conflicts: blocks
        are binned by the parity of their grid index per dimension where
        the context is nonzero (2^k phases) — neighbours along those
        dims never run concurrently.
        """
        if not self.read_write_conflict:
            return [blocks]
        conflict_dims = [
            d
            for d in range(self.total_roi.dims)
            if self.context_neg[d] > 0 or self.context_pos[d] > 0
        ]
        if not conflict_dims:
            return [blocks]
        phases: dict = {}
        for b in blocks:
            key = tuple(b.grid_index[d] % 2 for d in conflict_dims)
            phases.setdefault(key, []).append(b)
        return [phases[k] for k in sorted(phases)]


@dataclass
class TaskResult:
    task: str
    total_blocks: int
    succeeded: int
    failed: int
    skipped: int
    seconds: float
    errors: list = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return self.failed == 0


def run_blockwise(
    task: BlockwiseTask,
    progress_every: float = 10.0,
) -> TaskResult:
    """Execute all blocks with retries and wave scheduling."""
    blocks = task.blocks()
    phases = task._phases(blocks)
    t0 = time.perf_counter()
    done = 0
    failed = 0
    skipped = 0
    errors: list = []
    lock = threading.Lock()
    last_log = [t0]
    active: dict = {}  # block_id -> (read_roi, write_roi), audit mode
    violations: list = []
    fault_rng = np.random.default_rng(0)

    def _audit_enter(block):
        with lock:
            for bid, (r, w) in active.items():
                if block.write_roi.intersects(w):
                    violations.append(
                        ("write/write", block.block_id, bid)
                    )
                if task.read_write_conflict and (
                    block.read_roi.intersects(w)
                    or r.intersects(block.write_roi)
                ):
                    violations.append(
                        ("read/write", block.block_id, bid)
                    )
            active[block.block_id] = (block.read_roi, block.write_roi)

    def _audit_exit(block):
        with lock:
            active.pop(block.block_id, None)

    def run_block(block: Block):
        nonlocal done, failed, skipped
        for attempt in range(task.max_retries + 1):
            try:
                if task.inject_fault_rate > 0:
                    with lock:
                        roll = fault_rng.uniform()
                    if roll < task.inject_fault_rate:
                        raise RuntimeError(
                            f"injected fault (block {block.block_id})"
                        )
                if task.audit:
                    _audit_enter(block)
                try:
                    result = task.process(block)
                finally:
                    if task.audit:
                        _audit_exit(block)
                with lock:
                    if result == "skipped":
                        skipped += 1
                    else:
                        done += 1
                    now = time.perf_counter()
                    if now - last_log[0] > progress_every:
                        last_log[0] = now
                        logger.info(
                            "%s: %d/%d blocks (%.1fs)",
                            task.name, done + failed + skipped,
                            len(blocks), now - t0,
                        )
                return
            except Exception as e:  # retry
                block.attempts = attempt + 1
                if attempt == task.max_retries:
                    with lock:
                        failed += 1
                        errors.append((block.block_id, repr(e)))
                    logger.error(
                        "%s: block %d failed after %d attempts: %r",
                        task.name, block.block_id, attempt + 1, e,
                    )
                    return
                logger.warning(
                    "%s: block %d attempt %d failed: %r",
                    task.name, block.block_id, attempt + 1, e,
                )

    for phase in phases:
        with ThreadPoolExecutor(max_workers=task.num_workers) as pool:
            list(pool.map(run_block, phase))

    if task.audit and violations:
        raise RuntimeError(
            f"blockwise race audit failed for {task.name!r}: "
            f"{len(violations)} overlap(s), e.g. {violations[:3]}"
        )
    return TaskResult(
        task.name,
        len(blocks),
        done,
        failed,
        skipped,
        time.perf_counter() - t0,
        errors,
    )


def run_blockwise_or_raise(task: BlockwiseTask, **kw) -> TaskResult:
    """Reference behaviour: boolean outcome escalated to RuntimeError
    (``predict.py:40-44``, ``filter_segmentation.py:263-266``)."""
    result = run_blockwise(task, **kw)
    if not result.ok:
        raise RuntimeError(
            f"blockwise task {task.name!r} failed on "
            f"{result.failed}/{result.total_blocks} blocks: "
            f"{result.errors[:5]}"
        )
    return result
