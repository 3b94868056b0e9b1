"""``bs doctor`` — diagnose the environment a run is about to use.

The failure modes this catches are the ones that otherwise surface as
silent hangs or mid-run crashes (no reference counterpart — operational
tooling for the TPU deployment):

- accelerator reachability, probed in a disposable subprocess with a
  hard timeout, because ``jax.devices()`` hangs *forever* when a
  remote-compile relay is down (even under ``JAX_PLATFORMS=cpu`` when a
  sitecustomize preregisters the plugin);
- device HBM and a tiny matmul sanity check;
- the persistent XLA compile cache (a wiped cache turns 3 s tile
  compiles into minutes);
- the native C++ post-processing library (builds on first use — catch
  a missing toolchain here, not mid-segmentation);
- TensorStore Zarr round-trip in a temp dir;
- virtual multi-device mesh creation (the sharding test/dev path);
- every ``BS_*`` tuning knob currently set.

Each check prints ok/warn/fail; exit code is 1 if any check fails.
``--json`` emits one machine-readable line instead.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

import click

from .styles import cli_echo


def _check_versions():
    import numpy

    info = {"python": sys.version.split()[0], "numpy": numpy.__version__}
    try:
        import jax

        info["jax"] = jax.__version__
    except Exception as e:  # pragma: no cover - jax is a hard dep
        return "fail", f"jax import failed: {e!r}", info
    return "ok", ", ".join(f"{k} {v}" for k, v in info.items()), info


def _check_device(timeout_s: float):
    """Probe accelerator init in a throwaway subprocess (hang-safe)."""
    # distinct inputs per iteration + a forced scalar fetch per matmul:
    # repeated identical executions can be deduplicated upstream on a
    # remote relay and report fantasy numbers (same rule as bench.py)
    code = (
        "import jax, json\n"
        "d = jax.devices()\n"
        "import jax.numpy as jnp\n"
        "import time\n"
        "xs = [jax.random.normal(k, (1024, 1024), jnp.bfloat16)\n"
        "      for k in jax.random.split(jax.random.PRNGKey(0), 4)]\n"
        "f = jax.jit(lambda a, b: a @ b)\n"
        "float(f(xs[0], xs[1]).mean())\n"
        "t0 = time.perf_counter()\n"
        "for i in range(8):\n"
        "    float(f(xs[i % 4], xs[(i + 1) % 4]).mean())\n"
        "dt = (time.perf_counter() - t0) / 8\n"
        "ms = d[0].memory_stats() or {}\n"
        "print(json.dumps({'kind': d[0].device_kind,"
        " 'platform': d[0].platform, 'count': len(d),"
        " 'hbm_gb': ms.get('bytes_limit', 0) / 2**30,"
        " 'matmul_tflops': 2 * 1024**3 / dt / 1e12}))\n"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return "fail", (
            f"device init hung >{timeout_s:.0f}s — remote relay down? "
            "(jax.devices() blocks forever in-process; this probe saved "
            "your shell)"
        ), {}
    if proc.returncode != 0:
        return "fail", f"device probe rc={proc.returncode}: " + (
            proc.stderr.strip().splitlines() or ["?"]
        )[-1][:200], {}
    try:
        info = json.loads(proc.stdout.strip().splitlines()[-1])
    except Exception:
        return "warn", f"unparseable probe output: {proc.stdout[:120]!r}", {}
    msg = (
        f"{info['count']}x {info['kind']} ({info['platform']}), "
        f"{info['hbm_gb']:.1f} GB, {info['matmul_tflops']:.1f} TF/s "
        "bf16 matmul"
    )
    level = "ok"
    if info["platform"] == "cpu":
        level, msg = "warn", msg + " — CPU only (no accelerator found)"
    return level, msg, info


def _check_compile_cache():
    if os.environ.get("BS_NO_COMPILE_CACHE"):
        return "warn", "disabled via BS_NO_COMPILE_CACHE (remote " \
            "compiles of new HLO take minutes every run)", {}
    path = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/bootstrapper_tpu/jax-cache"),
    )
    if not os.path.isdir(path):
        return "warn", f"{path} absent (created on first compile; " \
            "first big-tile compile will be slow)", {"path": path}
    n, size = 0, 0
    for root, _, files in os.walk(path):
        for f in files:
            n += 1
            try:
                size += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return "ok", f"{path}: {n} entries, {size/2**20:.0f} MiB", {
        "path": path, "entries": n, "bytes": size,
    }


def _check_native():
    t0 = time.perf_counter()
    try:
        from ..native import cc_from_hard_affs, get_lib

        get_lib()
        import numpy as np

        affs = np.zeros((3, 2, 4, 4), np.float32)
        affs[:, :, :2, :2] = 1.0
        labels = cc_from_hard_affs(affs > 0.5)
        # explicit check, not assert: -O must not turn this vacuous
        if labels.max() < 1:
            raise RuntimeError("CC smoke test produced no components")
    except Exception as e:
        return "fail", f"native library unusable: {e!r}", {}
    return "ok", (
        f"C++ post library loaded + CC smoke test in "
        f"{time.perf_counter() - t0:.2f}s"
    ), {}


def _check_storage():
    try:
        import numpy as np

        from ..core.arrays import open_ds, prepare_ds

        with tempfile.TemporaryDirectory() as td:
            ds = prepare_ds(
                os.path.join(td, "t.zarr/x"), (4, 8, 8), (0, 0, 0),
                (1, 1, 1), np.uint8,
            )
            ds[ds.roi] = np.arange(4 * 8 * 8, dtype=np.uint8).reshape(4, 8, 8)
            back = open_ds(os.path.join(td, "t.zarr/x"))
            if back[back.roi][1, 2, 3] != ds[ds.roi][1, 2, 3]:
                raise RuntimeError("read-back value mismatch")
    except Exception as e:
        return "fail", f"TensorStore Zarr round-trip failed: {e!r}", {}
    return "ok", "TensorStore Zarr write/read round-trip", {}


def _check_mesh(timeout_s: float = 240.0):
    """Virtual 8-device CPU mesh in a subprocess (the sharding dev path)."""
    from ..core.blockwise import host_only_env

    env = host_only_env()
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import numpy as np\n"
        "from jax.sharding import Mesh\n"
        "mesh = Mesh(np.array(jax.devices()).reshape(2, 4),"
        " ('data', 'space'))\n"
        "print('mesh', mesh.shape)\n"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], env=env,
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return "fail", "virtual mesh probe hung", {}
    if proc.returncode != 0:
        return "fail", (
            proc.stderr.strip().splitlines() or ["?"]
        )[-1][:200], {}
    return "ok", "8-device virtual CPU mesh constructs", {}


def _check_knobs():
    knobs = {
        k: v for k, v in sorted(os.environ.items())
        if k.startswith("BS_") or k in (
            "JAX_PLATFORMS", "XLA_FLAGS", "JAX_COMPILATION_CACHE_DIR",
        )
    }
    # the package itself setdefault()s the cache dir on import — only
    # report it when the operator pointed it somewhere else
    default_cache = os.path.join(
        os.path.expanduser("~"), ".cache", "bootstrapper_tpu", "jax-cache"
    )
    if knobs.get("JAX_COMPILATION_CACHE_DIR") == default_cache:
        del knobs["JAX_COMPILATION_CACHE_DIR"]
    if not knobs:
        return "ok", "no BS_*/JAX overrides set (defaults active)", {}
    return "ok", ", ".join(f"{k}={v}" for k, v in knobs.items()), knobs


@click.command("doctor")
@click.option("--timeout", default=300.0, show_default=True,
              help="seconds before declaring the accelerator unreachable")
@click.option("--json", "as_json", is_flag=True, help="one JSON line")
@click.option("--skip-device", is_flag=True,
              help="host-only checks (don't touch the accelerator)")
def doctor(timeout, as_json, skip_device):
    """Diagnose the environment: device, caches, native lib, storage."""
    checks = [("versions", _check_versions)]
    if not skip_device:
        checks.append(("device", lambda: _check_device(timeout)))
    checks += [
        ("compile-cache", _check_compile_cache),
        ("native", _check_native),
        ("storage", _check_storage),
        ("mesh", _check_mesh),
        ("knobs", _check_knobs),
    ]
    results = {}
    failed = False
    for name, fn in checks:
        try:
            level, msg, info = fn()
        except Exception as e:  # a check must never crash the doctor
            level, msg, info = "fail", f"check crashed: {e!r}", {}
        results[name] = {"level": level, "message": msg, **info}
        failed |= level == "fail"
        if not as_json:
            mark = {"ok": "+", "warn": "!", "fail": "x"}[level]
            fg = {"ok": "green", "warn": "yellow", "fail": "red"}[level]
            cli_echo(f" {mark} {name:14s} {msg}", "doctor", fg=fg)
    if as_json:
        click.echo(json.dumps(results))
    if failed:
        raise SystemExit(1)
