"""Profiling & tracing helpers.

The reference's observability is wall-clock prints plus (commented-out)
gunpowder profiling stats (reference ``bootstrapper/post/blockwise/
hglom/frags.py:464-469``, ``models/3d_affs/train.py:183``).  Here:

- ``stage_timer``: wall-clock + JSONL logging for pipeline stages (the
  blockwise engine reports per-task timing through TaskResult already);
- ``jax_trace``: capture a JAX profiler trace (TensorBoard-compatible)
  around any region when ``BS_PROFILE=<dir>`` is set — covers device
  timelines, XLA ops, and host/device overlap for train and predict.
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
import time

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def stage_timer(name: str, log_path: str | None = None):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        logger.info("%s: %.2fs", name, dt)
        if log_path:
            with open(log_path, "a") as f:
                f.write(json.dumps({"stage": name, "seconds": dt}) + "\n")


@contextlib.contextmanager
def jax_trace(name: str = "trace"):
    """Profile the wrapped region when BS_PROFILE is set to a directory."""
    profile_dir = os.environ.get("BS_PROFILE")
    if not profile_dir:
        yield
        return
    import jax

    path = os.path.join(profile_dir, name)
    os.makedirs(path, exist_ok=True)
    with jax.profiler.trace(path):
        yield
    logger.info("jax trace written to %s", path)
