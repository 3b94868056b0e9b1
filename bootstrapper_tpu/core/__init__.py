from .geometry import Coordinate, Roi
from .arrays import Array, open_ds, prepare_ds
