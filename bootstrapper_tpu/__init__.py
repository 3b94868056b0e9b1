"""bootstrapper_tpu — TPU-native volumetric segmentation bootstrapping.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
ucsdmanorlab/bootstrapper: train 2D/3D U-Nets on sparse labels, predict
affinities/LSDs over chunked Zarr volumes with sharded TPU inference,
segment via watershed/mutex-watershed/CC + hierarchical agglomeration,
evaluate (VOI/ERL/error maps), filter to pseudo-ground-truth, repeat.
"""

__version__ = "0.3.0"  # keep in sync with pyproject.toml

import os as _os
import sys as _sys


def _setup_compile_cache():
    """Point JAX's persistent compilation cache at a per-user dir.

    Remote TPU compiles of new HLO run 5-60 min on the relay and even
    the virtual-mesh CPU train step compiles for minutes; the
    persistent cache makes every repeat process start instant.  Opt
    out with BS_NO_COMPILE_CACHE=1; an explicit
    JAX_COMPILATION_CACHE_DIR always wins."""
    if _os.environ.get("BS_NO_COMPILE_CACHE"):
        return
    path = _os.environ.get("JAX_COMPILATION_CACHE_DIR") or _os.path.join(
        _os.path.expanduser("~"), ".cache", "bootstrapper_tpu", "jax-cache"
    )
    _os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
    if "jax" in _sys.modules:  # imported before us: env var is too late
        try:
            _sys.modules["jax"].config.update(
                "jax_compilation_cache_dir", path
            )
        except Exception:
            pass


_setup_compile_cache()

from .core.geometry import Coordinate, Roi

_LAZY = {"Array": "core.arrays", "open_ds": "core.arrays", "prepare_ds": "core.arrays"}


def __getattr__(name):
    # core.arrays drags in tensorstore (~3 s on a slow host); subprocess
    # workers that never touch storage shouldn't pay for it at import.
    if name in _LAZY:
        import importlib

        val = getattr(importlib.import_module(f".{_LAZY[name]}", __name__), name)
        globals()[name] = val
        return val
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
