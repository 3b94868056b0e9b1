"""Disposable-subprocess compile probe for folded (space-to-depth) training.

Folded training (``net_config["fold_xy"] = true``) measured ~19% faster
than unfolded at batch >= 8 on a v5e (22.2 samples/s, 54.9% device MFU
at batch 16 — BASELINE.md train table), but XLA:TPU's space-to-batch
pass CHECK-crashes while compiling the folded gradient at small batch
(``tools/xla_s2b_probe.py`` — a process-aborting CHECK, not a Python
exception).  A crash on an unprobed (config, batch, backend) must never
take down a training run, so ``fold_xy`` only defaults on when a probe
compile of the exact folded train step has succeeded once in a
throwaway subprocess; the verdict is cached persistently per
(net-topology, batch, jax version, backend).

The reference has no analog (its torch trainer never risks a compiler
crash; the fold itself is a TPU-first rewrite, ``models/fold.py``).
Replaces the round-3 footgun where the 19% was gated behind a manual
config flag (`fold_xy = true`) with no compile-safety net.
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
import subprocess
import sys
import tempfile

logger = logging.getLogger(__name__)

#: net_config keys that determine the compiled train-step graph; extra
#: keys (paths, UX metadata) must not invalidate the cache
_TOPOLOGY_KEYS = (
    "input_shape",
    "output_shape",
    "num_fmaps",
    "fmap_inc_factor",
    "num_fmaps_out",
    "downsample_factors",
    "kernel_size_down",
    "kernel_size_up",
    "constant_upsample",
    "in_channels",
    "adj_slices",
    "inputs",
    "outputs",
)

_PROBE_CODE = r"""
import json, sys
sys.path.insert(0, {root!r})
import jax
# a CPU parent (tests, CI) must not let the child fall back to the
# image's accelerator plugin: jax.config is the only override that
# beats the sitecustomize-registered backend (env vars are too late)
if {force_cpu!r}:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import optax
with open({ncpath!r}) as f:
    nc = json.load(f)
nc["fold_xy"] = True
from bootstrapper_tpu.models import Model
from bootstrapper_tpu.models.model import head_dims
from bootstrapper_tpu.train import create_train_state, make_train_step
from bootstrapper_tpu.utils.xla import bs_jit

m = Model(nc)
m.validate_shapes()
B = {batch}
state = jax.eval_shape(
    lambda k: create_train_state(m, k)[0], jax.random.PRNGKey(0)
)
batch = {{
    "input": jax.ShapeDtypeStruct(
        (B, *nc["input_shape"], m.unet_config.in_channels), jnp.float32
    ),
}}
for part in ("targets", "weights"):
    batch[part] = {{
        k: jax.ShapeDtypeStruct(
            (B, *nc["output_shape"], head_dims(o)), jnp.float32
        )
        for k, o in nc["outputs"].items()
    }}
step = bs_jit(make_train_step(m, optax.adam(1e-4)), donate_argnums=(0,))
step.lower(state, batch).compile()
print("FOLD_PROBE_OK")
"""


def _cache_path() -> str:
    root = os.environ.get(
        "BS_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "bootstrapper_tpu"),
    )
    return os.path.join(root, "fold_probe.json")


def _probe_key(net_config: dict, batch_size: int) -> str:
    import jax

    topo = {k: net_config.get(k) for k in _TOPOLOGY_KEYS}
    try:
        backend = jax.default_backend()
    except Exception:
        backend = "unknown"
    blob = json.dumps(
        [topo, int(batch_size), jax.__version__, backend], sort_keys=True
    )
    return hashlib.sha1(blob.encode()).hexdigest()[:16]


def _load_cache() -> dict:
    try:
        with open(_cache_path()) as f:
            return json.load(f)
    except Exception:
        return {}


def _store_cache(cache: dict) -> None:
    path = _cache_path()
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(cache, f, indent=1)
        os.replace(tmp, path)
    except OSError:  # read-only home: probe still works, just uncached
        logger.debug("fold-probe cache not writable at %s", path)


def folded_train_compiles(
    net_config: dict, batch_size: int, timeout_s: float = 900.0
) -> bool:
    """True when the folded train step compiles for this (config, batch)
    on the current backend — verified once in a throwaway subprocess
    (compile only, ShapeDtypeStruct args: no training data, no step
    executed), then cached in ``~/.cache/bootstrapper_tpu``.

    A cold-cache TPU relay compile takes 1–6 min; timeouts are treated
    as "don't fold" but NOT cached (a congested relay shouldn't poison
    the verdict)."""
    key = _probe_key(net_config, batch_size)
    cache = _load_cache()
    if key in cache:
        return bool(cache[key]["ok"])

    with tempfile.NamedTemporaryFile(
        "w", suffix=".json", delete=False
    ) as f:
        json.dump(net_config, f)
        ncpath = f.name
    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import jax

    try:
        force_cpu = jax.default_backend() == "cpu"
    except Exception:
        force_cpu = True
    code = _PROBE_CODE.format(
        root=root, ncpath=ncpath, batch=batch_size, force_cpu=force_cpu
    )
    logger.info(
        "probing folded train-step compile (batch %d) in a subprocess "
        "(first time for this config/backend; verdict is cached) ...",
        batch_size,
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        logger.warning(
            "fold probe timed out after %.0fs; training unfolded "
            "(verdict not cached)", timeout_s,
        )
        return False
    finally:
        try:
            os.unlink(ncpath)
        except OSError:
            pass
    ok = "FOLD_PROBE_OK" in proc.stdout
    # Cache False only for CRASH-like outcomes (signal death rc<0, or
    # the XLA space-to-batch CHECK failure the probe exists to detect).
    # A transient failure — relay hiccup, import error, flaky env —
    # must not pin this config to the slower unfolded path forever.
    err = (proc.stderr or "") + (proc.stdout or "")
    crash_like = proc.returncode < 0 or "CHECK failed" in err or (
        "Check failed" in err
    )
    if not ok and not crash_like:
        tail = err.strip().splitlines()
        logger.warning(
            "fold probe failed non-crash (rc=%d): %s — training "
            "unfolded this run (verdict NOT cached; transient "
            "failures shouldn't poison it)",
            proc.returncode, tail[-1][:200] if tail else "no output",
        )
        return False
    cache = _load_cache()  # re-read: concurrent probes may have added
    cache[key] = {
        "ok": ok,
        "batch": int(batch_size),
        "rc": proc.returncode,
    }
    if not ok:
        tail = err.strip().splitlines()
        cache[key]["why"] = tail[-1][:200] if tail else "no output"
        logger.info(
            "folded train step does NOT compile here (rc=%d): %s — "
            "training unfolded", proc.returncode, cache[key]["why"],
        )
    _store_cache(cache)
    return ok
