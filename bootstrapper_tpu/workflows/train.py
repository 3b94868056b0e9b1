"""Training workflow driver: TOML config -> training loop.

Equivalent of the reference train driver + per-setup train scripts
(reference ``bootstrapper/train.py:11-134``,
``models/3d_affs/train.py:21-187``) without the subprocess boundary:
the setup is config, the model is the parametric JAX U-Net, and the
loop is the jitted train step.  Keeps the reference's operational
surface: ``model_checkpoint_{iter}`` files, periodic snapshot Zarrs of
batches (viewable with ``bs view -s``), auto-resume from the latest
checkpoint, loss logging.
"""

from __future__ import annotations

import json
import logging
import os
import time

import numpy as np

from ..core.arrays import prepare_ds
from ..models.model import Model
from ..pipeline.synthetic import SyntheticTrainingPipeline
from ..pipeline.training import SetupSpec, TrainingPipeline
from ..train.loop import (
    create_train_state,
    latest_checkpoint,
    load_checkpoint,
    make_train_step,
    save_checkpoint,
)
from ..train.sampler import Sample
from ..utils import tomlio
from ..utils.stall import StallWatchdog

logger = logging.getLogger(__name__)


def _rss_gb() -> float:
    """Current host RSS in GB (0 when /proc is unavailable)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1024 / 1024
    except OSError:
        pass
    return 0.0


class _StallWatchdog(StallWatchdog):
    """Training-loop stall watchdog (see ``utils/stall.py`` for the
    failure mode and the respawn/exit-113 contract).  Training opts
    into respawn: ``bs train``/round tools auto-resume from the last
    checkpoint, so replacing the process is safe and loses at most
    ``save_checkpoints_every`` iterations."""

    EXIT_CODE = 113

    def __init__(self, timeout_s: float, setup_dir: str):
        super().__init__(
            timeout_s, timeout_s, label="training", respawn=True
        )
        self.timeout_s = timeout_s
        self.setup_dir = setup_dir

    @classmethod
    def start_if_enabled(cls, setup_dir: str):
        timeout_s = float(os.environ.get("BS_STALL_TIMEOUT_S", "900"))
        if timeout_s <= 0:
            return None
        w = cls(timeout_s, setup_dir)
        w._thread.start()
        return w


def setup_train(config_file: str, **overrides) -> dict:
    """Load + validate a training config; apply kwarg overrides (the
    reference writes a ``*_modified.toml`` on overrides — same here)."""
    cfg = tomlio.load(config_file)
    cfg = cfg.get("train", cfg)
    # the CLI passes every option, mostly as None — only real values
    # count as overrides (else every plain run writes a _modified.toml)
    overrides = {k: v for k, v in overrides.items() if v is not None}
    cfg.update(overrides)
    if overrides:
        mod = config_file.replace(".toml", "_modified.toml")
        tomlio.dump({"train": cfg}, mod)
    if "setup_dir" not in cfg:
        raise ValueError("train config needs setup_dir")
    return cfg


def run_training(config_file: str, **overrides) -> dict:
    import jax

    if os.environ.get("BS_INT8") == "1":
        # int8 convs are inference-only: round/clip have zero gradient,
        # so a quantized train step would silently learn nothing.
        # Disable for the duration of training, restore for any predict
        # stage that follows in the same process.
        logger.warning("BS_INT8=1 ignored during training (inference-only)")
        os.environ["BS_INT8"] = "0"
        try:
            return run_training(config_file, **overrides)
        finally:
            os.environ["BS_INT8"] = "1"

    cfg = setup_train(config_file, **overrides)
    setup_dir = cfg["setup_dir"]
    setup_name = os.path.basename(os.path.normpath(setup_dir))
    voxel_size = cfg.get("voxel_size", [1, 1, 1])
    max_iterations = int(cfg.get("max_iterations", 30001))
    save_every = int(cfg.get("save_checkpoints_every", 5000))
    snap_every = int(cfg.get("save_snapshots_every", 1000))
    batch_size = cfg.get("batch_size")

    model = Model.from_setup(setup_dir)
    fold = cfg.get("fold_xy")
    if fold is None and (batch_size or 1) >= 8 and os.environ.get(
        "BS_FOLD_PROBE", "1"
    ) == "1":
        # batch >= 8: folded training measured ~19% faster on v5e
        # (tools/train_mfu.py --fold, 54.9% MFU at batch 16) AND the
        # space-to-batch gradient crash only bites below batch 8 — but
        # a CHECK crash on an unprobed shape would abort this process
        # outright, so auto-enable only after a one-time disposable-
        # subprocess compile probe of this exact (config, batch,
        # backend) passes (train/fold_probe.py; verdict cached).
        from ..train.fold_probe import folded_train_compiles

        fold = folded_train_compiles(
            model.net_config, int(batch_size)
        )
        if fold:
            # force it explicitly: a stored net_config may carry
            # "fold_xy": false, which would silently override the
            # probe's verdict via Model's default resolution
            model = Model({**model.net_config, "fold_xy": True})
            logger.info(
                "fold probe passed: training folded (batch %d; "
                "disable with fold_xy = false)", batch_size,
            )
    if not fold:
        # train unfolded — measured fastest at small batch, not just a
        # crash dodge: XLA's space-to-batch pass (which CHECK-fails on
        # folded-conv gradients but can be disabled via
        # compiler_options) wins 65% over folded training at the
        # reference recipe (batch 1), because the tiny 4x104x104 output
        # starves the MXU on batch, not lanes (tools/xla_s2b_probe.py:
        # 133.8 vs 220.6 ms/step).
        model = Model({**model.net_config, "fold_xy": False})
    model.validate_shapes()
    spec = SetupSpec(model.net_config, tuple(voxel_size))

    if "_from_" in setup_name or "samples" not in cfg:
        pipeline = SyntheticTrainingPipeline(
            model.net_config,
            voxel_size=voxel_size,
            batch_size=batch_size or 1,
        )
        lr = 1e-4
    else:
        samples = [
            Sample.open(s["raw"], s["labels"], s.get("mask"))
            for s in cfg["samples"]
        ]
        artifact_samples = None
        if cfg.get("artifact_samples"):
            # real-artifact blending (reference DefectAugment
            # artifact_source, gp/defect_augment.py:44-53): each entry
            # names an intensities dataset + optional alpha mask
            from ..core.arrays import open_ds

            artifact_samples = [
                (
                    open_ds(a["artifacts"]),
                    open_ds(a["artifacts_mask"])
                    if a.get("artifacts_mask") else None,
                )
                for a in cfg["artifact_samples"]
            ]
        pipeline = TrainingPipeline(
            model.net_config,
            voxel_size,
            samples,
            batch_size=batch_size,
            min_masked=cfg.get("min_masked", 0.05),
            artifact_samples=artifact_samples,
            prob_artifact=cfg.get("prob_artifact", 0.05),
        )
        lr = spec.learning_rate

    state, tx = create_train_state(
        model, jax.random.PRNGKey(cfg.get("seed", 0)),
        cfg.get("learning_rate", lr),
    )
    raw_step = make_train_step(model, tx)
    place = None
    if cfg.get("mesh", False) and len(jax.devices()) > 1:
        # data-parallel (+ spatial) sharding over all devices — the
        # reference's Lightning-DDP analog (pjit, not NCCL processes)
        import math

        from ..train.loop import make_mesh, shard_train_step

        # the mesh factorisation must divide what it will shard: the
        # batch over 'data', the leading spatial dim of every batch
        # tensor (input AND target z) over 'space'
        mesh = make_mesh(
            batch_size=batch_size or 1,
            spatial=math.gcd(
                int(model.net_config["input_shape"][0]),
                int(model.net_config["output_shape"][0]),
            ),
        )
        step_fn, place = shard_train_step(raw_step, mesh)
        logger.info("sharded training over mesh %s", mesh.shape)
    else:
        from ..utils.xla import bs_jit

        step_fn = bs_jit(raw_step, donate_argnums=(0,))

    # auto-resume (reference Lightning behaviour,
    # models/3d_affs_from_2d_mtlsd/train.py:343-344)
    ckpt = latest_checkpoint(setup_dir)
    start_iter = 0
    if ckpt:
        state = load_checkpoint(ckpt, tx)
        start_iter = int(state.step)
        logger.info("resuming from %s (iteration %d)", ckpt, start_iter)

    log_dir = os.path.join(setup_dir, "log")
    os.makedirs(log_dir, exist_ok=True)
    log_path = os.path.join(log_dir, "loss.jsonl")
    snap_dir = os.path.join(setup_dir, "snapshots")

    # RSS watchdog: the axon relay CLIENT leaks ~5 MB of host memory
    # per dispatched batch (diagnosed round 4, tools/train_rate_probe.py:
    # 30 GB over 5000 iters on the relay; flat on CPU; present with the
    # train step removed) — long runs die by host OOM around 15-25k
    # iterations, which round 3 saw as a "~3x rate decay" and
    # band-aided with subprocess chunking. The leak is unreachable from
    # Python, so past the cap we checkpoint, stop cleanly, and let the
    # caller resume in a fresh process (auto-resume picks up the
    # checkpoint; `bs train` re-execs itself automatically).
    max_rss_gb = float(os.environ.get("BS_MAX_RSS_GB", "64"))
    rss_check_every = max(
        1, int(os.environ.get("BS_RSS_CHECK_EVERY", "100"))
    )
    rss_hit = False

    # Stall watchdog: a wedged relay dispatch blocks the main thread in
    # a C call FOREVER at 0% CPU (observed round 5: a concurrent
    # process sharing the relay wedged this client mid-run; the relay
    # itself stayed healthy for fresh clients). The main thread cannot
    # detect its own hang, so a daemon thread watches an iteration
    # heartbeat and, on timeout, replaces the whole process (exec is
    # legal from any thread; auto-resume continues from the last
    # checkpoint) or exits 113 when respawn is disabled/exhausted.
    watchdog = _StallWatchdog.start_if_enabled(setup_dir)

    t0 = time.perf_counter()
    losses = []
    try:
        with open(log_path, "a") as logf:
            placed_state = False
            it = start_iter - 1
            for it in range(start_iter, max_iterations):
                if watchdog is not None:
                    watchdog.beat(it)
                batch = pipeline.next_batch()
                if place is not None:
                    # state is placed once (stays resident & donated);
                    # every batch is re-placed with its mesh sharding
                    if not placed_state:
                        state, batch = place(state, batch)
                        placed_state = True
                    else:
                        _, batch = place(None, batch)
                state, metrics = step_fn(state, batch)
                if (it + 1) % 10 == 0 or it + 1 == max_iterations:
                    loss = float(metrics["loss"])
                    losses.append(loss)
                    logf.write(
                        json.dumps(
                            {
                                "iteration": it + 1,
                                "loss": loss,
                                "seconds": time.perf_counter() - t0,
                            }
                        )
                        + "\n"
                    )
                    logf.flush()
                if (it + 1) % save_every == 0 or it + 1 == max_iterations:
                    path = save_checkpoint(setup_dir, state, it + 1)
                    logger.info("saved %s", path)
                if snap_every and (it + 1) % snap_every == 0:
                    _save_snapshot(snap_dir, it + 1, batch, model, state)
                if (
                    max_rss_gb > 0
                    and (it + 1) % rss_check_every == 0
                    and it + 1 < max_iterations
                    and _rss_gb() > max_rss_gb
                ):
                    save_checkpoint(setup_dir, state, it + 1)
                    logger.warning(
                        "host RSS %.1f GB exceeds BS_MAX_RSS_GB=%g "
                        "(known TPU-relay client leak, BASELINE.md "
                        "round 4): checkpointed at iteration %d and "
                        "stopping — resume in a fresh process (auto-"
                        "resume continues from this checkpoint)",
                        _rss_gb(), max_rss_gb, it + 1,
                    )
                    rss_hit = True
                    break
    finally:
        if watchdog is not None:
            watchdog.stop()
        pipeline.stop()
    return {
        "iterations": it + 1,
        "rss_limit_hit": rss_hit,
        "final_loss": losses[-1] if losses else None,
        "checkpoint": latest_checkpoint(setup_dir),
    }


def _save_snapshot(snap_dir, iteration, batch, model, state):
    """Write a batch (+ current predictions) as a snapshot Zarr
    (``models/3d_affs/train.py:171-181`` capability)."""
    try:
        preds = model.apply(state.params, batch["input"])
        container = os.path.join(snap_dir, f"batch_{iteration}.zarr")
        arrays = {"input": np.asarray(batch["input"])}
        for name in batch["targets"]:
            arrays[f"gt_{name}"] = np.asarray(batch["targets"][name])
            arrays[f"weights_{name}"] = np.asarray(batch["weights"][name])
            arrays[f"pred_{name}"] = np.asarray(preds[name])
        for name, arr in arrays.items():
            # store (b, *spatial, c) -> channels-first per sample 0
            a = np.moveaxis(arr[0], -1, 0).astype(np.float32)
            ds = prepare_ds(
                os.path.join(container, name),
                a.shape,
                (0,) * (a.ndim - 1),
                (1,) * (a.ndim - 1),
                np.float32,
            )
            ds[ds.roi] = a
    except Exception as e:  # snapshots must never kill training
        logger.warning("snapshot failed: %r", e)
