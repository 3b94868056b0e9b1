"""Shared predictor machinery: reader thread + one-deep dispatch
pipeline + ROI-clipped async tile writes.

All three predictors (``scan.Predictor``, ``sharded.ShardedPredictor``,
``spatial.SpatialPredictor``) run the same loop — a host read-ahead
thread feeding a queue, a dispatch that keeps exactly one result in
flight so device compute overlaps the previous item's device->host
fetch and Zarr writes, and per-output ROI-clipped TensorStore writes.
It lives here once so pipeline fixes can't diverge between them (the
reference's analog is the single daisy/gunpowder scan loop each of its
workers runs, ``predict.py:128-179``).
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Callable, Dict, Iterable, List, Sequence

import numpy as np

from ..core.arrays import Array
from ..core.geometry import Coordinate, Roi
from ..models.model import head_dims

# Cap on in-flight async TensorStore writes: each future pins its data
# buffer until committed, so an unbounded list grows with volume size.
# 64 tile-sized uint8 buffers is plenty of write-behind without letting
# a slow filesystem accumulate the whole prediction in RAM.
MAX_PENDING_WRITES = 64


def _fetch_streams() -> int:
    """Concurrent device->host fetch streams for output draining.

    Opt-in knob (``BS_FETCH_STREAMS``), default 1.  Measured on the
    axon TPU relay (BASELINE.md round 4): the link rate itself
    fluctuates 10-30 MB/s minute to minute, and once that variance is
    controlled for, 8 concurrent slice fetches are NEUTRAL vs one
    serial fetch (30.2 vs 27.8 MB/s same-minute) — an early "3x"
    reading was two measurements landing on opposite swings.  Local
    backends move GB/s on one stream, where chunking only adds
    overhead.  Kept as a knob for link types where per-stream caps are
    real (e.g. TCP-windowed tunnels)."""
    env = os.environ.get("BS_FETCH_STREAMS")
    if env:
        return max(1, int(env))
    return 1


def fetch_device_array(v, streams: int = None) -> np.ndarray:
    """Device->host fetch, optionally split into ``streams`` concurrent
    slice fetches along the largest axis (relay links scale with
    stream count; see ``_fetch_streams``)."""
    if streams is None:
        streams = _fetch_streams()
    shape = getattr(v, "shape", ())
    if streams <= 1 or not shape or max(shape) < streams:
        return np.asarray(v)
    ax = int(np.argmax(shape))
    n = shape[ax]
    bounds = [n * i // streams for i in range(streams + 1)]
    parts: list = [None] * streams
    sl = [slice(None)] * len(shape)

    errors: list = [None] * streams

    def work(i):
        try:
            s = list(sl)
            s[ax] = slice(bounds[i], bounds[i + 1])
            parts[i] = np.asarray(v[tuple(s)])
        except BaseException as e:  # surfaced after join, not swallowed
            errors[i] = e

    threads = [
        threading.Thread(target=work, args=(i,)) for i in range(streams)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for e in errors:
        if e is not None:
            raise e
    return np.concatenate(parts, axis=ax)


def make_tile_reader(inputs: Sequence[Array], context, is_image: bool):
    """Per-tile host reader shared by the tiled/sharded/spatial
    predictors (channels-last concat of all chain inputs over the
    context-grown ROI).

    When every input array is stored uint8, tiles ship as RAW BYTES —
    4x less host->device traffic than float32, the dominant cost over
    a remote device link — and the jitted forward normalises on device
    (each predictor's forward gates on ``x.dtype == uint8``; the
    float32 math there is bit-identical to host ``normalize_raw``).
    Mixed/float inputs normalise host-side as before.
    """
    from ..train.sampler import normalize_raw

    device_norm = all(a.dtype == np.uint8 for a in inputs)

    def read_tile(write_roi: Roi) -> np.ndarray:
        read_roi = write_roi.grow(context, context)
        chans = []
        for arr in inputs:
            x = arr.to_ndarray(read_roi, pad_mode="reflect")
            if not device_norm:
                x = normalize_raw(x)
            x = x[..., None] if x.ndim == 3 else np.moveaxis(x, 0, -1)
            chans.append(x)
        x = np.concatenate(chans, axis=-1)
        if is_image and not device_norm:
            x = x * 2.0 - 1.0
        return x

    return read_tile


def run_pipelined(
    items: Iterable,
    read: Callable,
    dispatch: Callable,
    drain: Callable,
) -> None:
    """Reader-thread + one-deep dispatch pipeline.

    ``read(item)`` runs on a daemon thread (host Zarr reads overlap
    device compute; exceptions tunnel through the queue and re-raise
    here). ``dispatch(host_array)`` starts device work and returns its
    (not yet fetched) outputs. ``drain(item, outputs)`` is called one
    step behind dispatch — the blocking device->host fetch happens
    there while the next item executes on device — and once more for
    the final item. Peak device memory grows by one output set.
    """
    q: queue.Queue = queue.Queue(maxsize=2)

    def _reader():
        try:
            for it in items:
                q.put((it, read(it)))
            q.put(None)
        except Exception as e:  # surfaced in the consumer loop
            q.put(e)

    threading.Thread(target=_reader, daemon=True).start()

    # Stall watchdog (utils/stall.py): a wedged relay dispatch/fetch
    # blocks this loop in a C call forever at 0% CPU.  Two phases: the
    # FIRST drain may sit behind a cold remote compile
    # (BS_PREDICT_COMPILE_TIMEOUT_S, default 3600 s — 40+ min observed
    # for large stream graphs); after that, steady tiles finish in
    # seconds-to-minutes (BS_PREDICT_STALL_TIMEOUT_S, default 900 s).
    # No respawn (a predict tool mid-run is not safely re-execable):
    # exit 113 for the caller to restart.
    watchdog = None
    initial = float(
        os.environ.get("BS_PREDICT_COMPILE_TIMEOUT_S", "3600")
    )
    steady = float(os.environ.get("BS_PREDICT_STALL_TIMEOUT_S", "900"))
    if initial > 0 and steady > 0:
        from ..utils.stall import StallWatchdog

        watchdog = StallWatchdog(
            initial, steady, label="predict", respawn=False
        ).start()

    pending = None
    step = 0
    try:
        while True:
            got = q.get()
            if got is None:
                break
            if isinstance(got, Exception):
                raise got
            item, host_arr = got
            outs = dispatch(host_arr)
            if pending is not None:
                drain(*pending)
                step += 1
                if watchdog is not None:
                    watchdog.beat(step)
            pending = (item, outs)
        if pending is not None:  # final fetch is watchdog-covered too
            drain(*pending)
    finally:
        if watchdog is not None:
            watchdog.stop()


class TileWriter:
    """ROI-clipped async writes of per-tile model outputs.

    ``outputs`` maps head name -> destination Array; ``outputs_cfg`` is
    the model's ``net_config["outputs"]`` (for the per-head channel
    count — device outputs may carry padded channels).
    """

    def __init__(
        self,
        outputs: Dict[str, Array],
        outputs_cfg: Dict[str, dict],
        voxel_size: Coordinate,
        clip_roi: Roi = None,
    ):
        self.outputs = outputs
        self.dims = {k: head_dims(cfg) for k, cfg in outputs_cfg.items()}
        self.voxel_size = voxel_size
        # extra clip for tiles that intentionally overhang the requested
        # ROI (z-streaming reflect-pads past the volume end rather than
        # shifting the final step inward, which would break cache
        # continuity)
        self.clip_roi = clip_roi
        self._futures: List = []

    def drain_batch(
        self,
        batch_tiles: Sequence[Roi],
        outs: Dict,
        clips: Sequence[Roi] = None,
    ) -> None:
        """Fetch one dispatched batch and write every tile of it.

        The ``np.asarray`` here is the blocking device->host fetch the
        one-deep pipeline hides behind the next batch's device compute.
        Entries in ``outs`` beyond ``len(batch_tiles)`` are padding
        (short final batch) and are discarded.  ``clips`` optionally
        narrows each tile's write further (z-streaming segments own
        disjoint z ranges; a segment's final-step overhang must not
        overwrite the next segment's slices with values that can differ
        by one quantization step across executables).
        """
        outs = {k: fetch_device_array(v) for k, v in outs.items()}
        for j, wroi in enumerate(batch_tiles):
            for name, arr in self.outputs.items():
                pred = np.moveaxis(outs[name][j], -1, 0)  # channels-first
                dest = wroi.intersect(arr.roi)
                if self.clip_roi is not None:
                    dest = dest.intersect(self.clip_roi)
                if clips is not None:
                    dest = dest.intersect(clips[j])
                if dest.empty:
                    continue
                sl = tuple(
                    slice(int(a), int(a + s))
                    for a, s in zip(
                        (dest.begin - wroi.begin) / self.voxel_size,
                        Coordinate(dest.shape) / self.voxel_size,
                    )
                )
                data = np.ascontiguousarray(
                    pred[(slice(None),) + sl][: self.dims[name]]
                )
                ssl = (slice(None),) + arr._spatial_slices(dest)
                self._futures.append(arr.store[ssl].write(data))
        while len(self._futures) > MAX_PENDING_WRITES:
            self._futures.pop(0).result()

    def finish(self) -> None:
        for f in self._futures:
            f.result()
        self._futures = []
