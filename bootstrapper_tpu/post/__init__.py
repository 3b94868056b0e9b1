from .fragments import (
    cc_from_affinities,
    mutex_watershed_from_affinities,
    watershed_from_affinities,
)
from .segment import (
    METHOD_DEFAULTS,
    cc_segmentation,
    mws_segmentation,
    remove_small_segments,
    waterz_segmentation,
)
from .filter import (
    compute_ids_to_remove,
    filter_segmentation_blockwise,
    outlier_filter,
    size_filter,
)
from .rag import RagDB
