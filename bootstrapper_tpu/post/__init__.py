"""Post-processing: fragments, segmentation, filtering, RAG.

Lazy re-exports (PEP 562): blockwise subprocess workers import only the
submodule they run (e.g. ``post.blockwise_seg`` for a host-only LUT
stage), and eagerly importing every sibling here costs ~10 s of scipy /
skimage-analog imports per spawned worker on a slow host.  Attribute
access resolves to the owning submodule on first use.
"""

_EXPORTS = {
    "cc_from_affinities": "fragments",
    "mutex_watershed_from_affinities": "fragments",
    "watershed_from_affinities": "fragments",
    "METHOD_DEFAULTS": "segment",
    "cc_segmentation": "segment",
    "mws_segmentation": "segment",
    "remove_small_segments": "segment",
    "waterz_segmentation": "segment",
    "compute_ids_to_remove": "filter",
    "filter_segmentation_blockwise": "filter",
    "outlier_filter": "filter",
    "size_filter": "filter",
    "RagDB": "rag",
}

__all__ = list(_EXPORTS)


def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        mod = importlib.import_module(f".{_EXPORTS[name]}", __name__)
        val = getattr(mod, name)
        globals()[name] = val
        return val
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
