from .affinities import seg_to_affs, affs_mask, grow_boundary, balance_weights
from .lsd import (
    lsd_descriptors,
    lsd_descriptors_downsampled,
    lsd_descriptors_2d_stack,
)
from .pallas_kernels import seed_maxima, seed_maxima_auto
