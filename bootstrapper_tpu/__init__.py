"""bootstrapper_tpu — TPU-native volumetric segmentation bootstrapping.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
ucsdmanorlab/bootstrapper: train 2D/3D U-Nets on sparse labels, predict
affinities/LSDs over chunked Zarr volumes with sharded TPU inference,
segment via watershed/mutex-watershed/CC + hierarchical agglomeration,
evaluate (VOI/ERL/error maps), filter to pseudo-ground-truth, repeat.
"""

__version__ = "0.1.0"

from .core.geometry import Coordinate, Roi
from .core.arrays import Array, open_ds, prepare_ds
