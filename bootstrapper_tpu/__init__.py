"""bootstrapper_tpu — TPU-native volumetric segmentation bootstrapping.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
ucsdmanorlab/bootstrapper: train 2D/3D U-Nets on sparse labels, predict
affinities/LSDs over chunked Zarr volumes with sharded TPU inference,
segment via watershed/mutex-watershed/CC + hierarchical agglomeration,
evaluate (VOI/ERL/error maps), filter to pseudo-ground-truth, repeat.
"""

__version__ = "0.1.0"

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
