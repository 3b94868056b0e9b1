"""Blockwise segmentation pipelines over whole volumes.

The 4-stage hierarchical-agglomeration pipeline (reference
``bootstrapper/post/blockwise/hglom/{frags,agglom,luts,extract}.py``)
and the mutex-watershed pipeline (reference
``bootstrapper/post/blockwise/mutex/*`` via volara), rebuilt on our
blockwise engine + native cores:

1. **fragments** — per block: watershed (or mutex watershed) on the
   block's affinities (+context), mean-affinity fragment filtering,
   crop to the write ROI, id-bump by ``block_id * voxels_per_block``
   (globally unique ids without coordination, ``frags.py:195-198``),
   write fragments Zarr + RAG node centers.
2. **agglomerate** — per block (+context, red-black waves): native
   hierarchical agglomeration to merge-score edges; cross-block edges
   land in the shared RAG (``agglom.py:108-152`` capability).
   For the mutex pipeline this stage scores cross-fragment edges by
   mean affinity per offset sign instead (AffAgglom capability).
3. **luts** — global: read the RAG, threshold sweep -> union-find
   components -> ``fragment_segment_lut`` npz per threshold
   (``luts.py:18-160``); the mutex variant runs one global mutex
   watershed with biased weights (GraphMWS capability).
4. **extract** — per block: LUT gather -> segmentation Zarr
   (``extract.py:19-33``).
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional, Sequence

import numpy as np

from .. import native
from ..core.arrays import Array, open_ds, prepare_ds
from ..core.blockwise import BlockwiseTask, run_blockwise_or_raise
from ..core.geometry import Coordinate, Roi
from .fragments import mutex_watershed_from_affinities, watershed_from_affinities
from .rag import RagDB

logger = logging.getLogger(__name__)


def _filter_fragments_by_affinity(fragments, affs, threshold):
    """Zero out fragments whose mean boundary-interior affinity is below
    ``threshold`` (``frags.py:102-117`` capability)."""
    if threshold <= 0:
        return fragments
    mean_affs = np.mean(affs[:3], axis=0)
    ids, inverse = np.unique(fragments, return_inverse=True)
    sums = np.zeros(len(ids))
    counts = np.zeros(len(ids))
    np.add.at(sums, inverse.ravel(), mean_affs.ravel())
    np.add.at(counts, inverse.ravel(), 1)
    means = sums / np.maximum(counts, 1)
    kill = ids[(means < threshold) & (ids != 0)]
    if len(kill):
        fragments = native.replace_values(
            fragments, kill, np.zeros(len(kill), np.uint64)
        )
    return fragments


def extract_fragments_blockwise(
    affs: Array,
    fragments: Array,
    rag: RagDB,
    block_shape: Sequence[int],
    context_voxels: Sequence[int] = (2, 20, 20),
    method: str = "ws",
    fragments_in_xy: bool = True,
    min_seed_distance: int = 10,
    filter_fragments: float = 0.05,
    epsilon_agglomerate: float = 0.0,
    replace_sections: Optional[Sequence[int]] = None,
    mws_kwargs: Optional[dict] = None,
    num_workers: int = 8,
    roi: Optional[Roi] = None,
    audit: bool = False,
):
    vs = affs.voxel_size
    total = roi or fragments.roi
    block_size = Coordinate(block_shape) * vs
    context = Coordinate(context_voxels) * vs
    voxels_per_block = int(np.prod(block_shape))

    def process(block):
        read = block.read_roi
        a = affs.to_ndarray(read).astype(np.float32)
        if a.max() > 1.5:
            a = a / 255.0
        if method == "ws":
            # direct-neighbour channels only (reference watershed.py:69)
            a = a[:3]
            frags, _ = watershed_from_affinities(
                a,
                fragments_in_xy=fragments_in_xy,
                min_seed_distance=min_seed_distance,
            )
        elif method == "mws":
            frags = mutex_watershed_from_affinities(
                a, seed=block.block_id, **(mws_kwargs or {})
            )
        else:
            raise ValueError(method)
        frags = _filter_fragments_by_affinity(frags, a, filter_fragments)

        if epsilon_agglomerate > 0:
            # pre-merge fragments up to a small threshold (reference
            # frags.py:120-142): apply merges from the mean-scoring
            # hierarchy below epsilon
            _, _, _, merges = native.agglomerate(
                frags, a[:3], threshold=epsilon_agglomerate,
                merge_function="mean",
            )
            if len(merges):
                # resolve merge chains transitively (b -> a where a may
                # itself merge later)
                parent: dict = {}

                def find(x):
                    while x in parent:
                        x = parent[x]
                    return x

                for ma, mb, _s in merges:
                    parent[int(mb)] = find(int(ma))
                olds = np.array(list(parent), np.uint64)
                news = np.array([find(int(o)) for o in olds], np.uint64)
                frags = native.replace_values(frags, olds, news)

        if replace_sections:
            # zero fragments in globally-indexed defective z-sections
            # (reference frags.py:145-167)
            z0 = int((read.begin[0] - affs.roi.begin[0]) / vs[0])
            for local_z in range(frags.shape[0]):
                if z0 + local_z in replace_sections:
                    frags[local_z] = 0

        # crop to write roi
        wroi = block.write_roi.intersect(total)
        lo = (wroi.begin - read.begin) / vs
        hi = lo + wroi.shape / vs
        core = tuple(slice(int(a_), int(b_)) for a_, b_ in zip(lo, hi))
        frags = np.ascontiguousarray(frags[core])

        # relabel to dense ids then bump by block id for global uniqueness
        ids = np.unique(frags)
        ids = ids[ids != 0]
        if len(ids):
            dense = np.arange(1, len(ids) + 1, dtype=np.uint64)
            bump = np.uint64(block.block_id * voxels_per_block)
            frags = native.replace_values(frags, ids, dense + bump)
            new_ids = dense + bump
            # centers in world units -> RAG nodes
            centers = np.zeros((len(new_ids), 3))
            flat = frags.ravel()
            order = np.argsort(flat, kind="stable")
            sorted_vals = flat[order]
            coords = np.stack(
                np.unravel_index(order, frags.shape), axis=1
            ).astype(np.float64)
            bounds = np.searchsorted(
                sorted_vals, np.concatenate([new_ids, [new_ids[-1] + 1]])
            )
            for i in range(len(new_ids)):
                seg_coords = coords[bounds[i] : bounds[i + 1]]
                c = seg_coords.mean(axis=0)
                centers[i] = [
                    wroi.begin[d] + c[d] * vs[d] for d in range(3)
                ]
            rag.write_nodes(new_ids.tolist(), centers)
        fragments[wroi] = frags

    task = BlockwiseTask(
        name="extract_fragments",
        total_roi=total,
        write_size=block_size,
        context_neg=context,
        context_pos=context,
        process=process,
        fit="shrink",
        read_write_conflict=False,
        num_workers=num_workers,
        audit=audit,
    )
    return run_blockwise_or_raise(task)


def agglomerate_blockwise(
    affs: Array,
    fragments: Array,
    rag: RagDB,
    block_shape: Sequence[int],
    context_voxels: Sequence[int] = (2, 20, 20),
    merge_function: str = "mean",
    num_workers: int = 8,
    roi: Optional[Roi] = None,
):
    vs = affs.voxel_size
    total = roi or fragments.roi
    block_size = Coordinate(block_shape) * vs
    context = Coordinate(context_voxels) * vs

    def process(block):
        read = block.read_roi.intersect(total)
        frags = fragments.to_ndarray(read)
        if not frags.any():
            return "skipped"
        a = affs.to_ndarray(read)[:3].astype(np.float32)
        if a.max() > 1.5:
            a = a / 255.0
        eu, ev, es, _ = native.agglomerate(
            frags, a, threshold=1.0, merge_function=merge_function
        )
        if len(eu):
            # unmerged sentinel 2.0 edges stay (never merge) — keep them
            # so the LUT stage knows adjacency but scores them high
            rag.write_edges(eu.tolist(), ev.tolist(), es.tolist())

    task = BlockwiseTask(
        name="agglomerate",
        total_roi=total,
        write_size=block_size,
        context_neg=context,
        context_pos=context,
        process=process,
        fit="shrink",
        read_write_conflict=True,
        num_workers=num_workers,
    )
    return run_blockwise_or_raise(task)


def find_segments(
    rag: RagDB,
    lut_dir: str,
    thresholds: Sequence[float],
) -> Dict[float, str]:
    """Global LUTs: union-find components per threshold ->
    fragment_segment_lut npz (``luts.py:18-160`` capability)."""
    os.makedirs(lut_dir, exist_ok=True)
    node_ids, _ = rag.read_nodes()
    eu, ev, scores = rag.read_edges()
    dense = {int(n): i for i, n in enumerate(node_ids)}
    du = np.array([dense[int(u)] for u in eu], np.uint64)
    dv = np.array([dense[int(v)] for v in ev], np.uint64)
    paths = {}
    for t in thresholds:
        comps = native.connected_components_edges(
            len(node_ids), du, dv, scores, t
        )
        segments = node_ids[comps.astype(np.int64)]
        path = os.path.join(
            lut_dir, f"seg_frags2local_{_fmt_threshold(t)}.npz"
        )
        np.savez_compressed(
            path, fragment_segment_lut=np.stack([node_ids, segments])
        )
        paths[t] = path
    return paths


def global_mutex_segments(
    rag: RagDB,
    lut_dir: str,
    bias_attractive: float = 1.0,
    bias_repulsive: float = -0.5,
) -> Dict[str, str]:
    """GraphMWS capability (``mutex/luts.py:17-90``): one global mutex
    watershed over RAG edges with global biases; scores <= 0.5 attract."""
    os.makedirs(lut_dir, exist_ok=True)
    node_ids, _ = rag.read_nodes()
    eu, ev, scores = rag.read_edges()
    dense = {int(n): i for i, n in enumerate(node_ids)}
    du = np.array([dense[int(u)] for u in eu], np.uint64)
    dv = np.array([dense[int(v)] for v in ev], np.uint64)
    # merge score in [0,1] -> affinity = 1 - score; centre at 0.5 so the
    # sign decides attraction/repulsion, then scale by the global biases
    # (GraphMWS global_bias=[attractive, repulsive] capability)
    aff = 1.0 - np.clip(scores, 0, 1)
    centred = aff - 0.5
    weights = np.where(
        centred > 0,
        centred * abs(bias_attractive),
        centred * abs(bias_repulsive),
    )
    labels = native.mutex_watershed_edges(len(node_ids), du, dv, weights)
    segments = node_ids[labels.astype(np.int64)]
    path = os.path.join(lut_dir, "seg_frags2local_mws.npz")
    np.savez_compressed(
        path, fragment_segment_lut=np.stack([node_ids, segments])
    )
    return {"mws": path}


def extract_segmentation_blockwise(
    fragments: Array,
    segmentation: Array,
    lut_path: str,
    block_shape: Sequence[int],
    num_workers: int = 8,
    roi: Optional[Roi] = None,
):
    lut = np.load(lut_path)["fragment_segment_lut"]
    lut_old, lut_new = lut[0], lut[1]
    vs = fragments.voxel_size
    total = roi or fragments.roi
    block_size = Coordinate(block_shape) * vs

    def process(block):
        wroi = block.write_roi.intersect(total)
        frags = fragments.to_ndarray(wroi)
        if not frags.any():
            return "skipped"
        segmentation[wroi] = native.replace_values(frags, lut_old, lut_new)

    task = BlockwiseTask(
        name="extract_segmentation",
        total_roi=total,
        write_size=block_size,
        context_neg=Coordinate.zeros(total.dims),
        context_pos=Coordinate.zeros(total.dims),
        process=process,
        num_workers=num_workers,
    )
    return run_blockwise_or_raise(task)


def _fmt_threshold(t: float) -> str:
    return f"{t:.3f}".rstrip("0").rstrip(".").replace(".", "_")


def waterz_pipeline_blockwise(
    affs_path: str,
    output_container: str,
    block_shape=(32, 256, 256),
    context_voxels=(2, 32, 32),
    thresholds=(0.2, 0.35, 0.5),
    merge_function: str = "mean",
    fragments_in_xy: bool = True,
    min_seed_distance: int = 10,
    filter_fragments: float = 0.05,
    epsilon_agglomerate: float = 0.0,
    replace_sections=None,
    num_workers: int = 8,
    roi: Optional[Roi] = None,
) -> Dict[float, str]:
    """Full 4-stage pipeline; returns {threshold: segmentation path}.

    Dataset naming mirrors the reference's parameter-encoded scheme
    (``watershed.py:127-151``): fragments under ``fragments_ws``, segs
    under ``segmentations_ws/{merge_function}--{threshold}``.
    """
    affs = open_ds(affs_path)
    total = roi or affs.roi
    vs = affs.voxel_size
    vox_shape = tuple(Coordinate(total.shape) / vs)

    frag_path = f"{output_container}/fragments_ws"
    fragments = prepare_ds(
        frag_path, vox_shape, total.offset, vs, np.uint64,
        chunk_shape=tuple(min(b, s) for b, s in zip(block_shape, vox_shape)),
    )
    rag = RagDB(f"{output_container}/rag_ws.db", mode="w")

    extract_fragments_blockwise(
        affs, fragments, rag, block_shape, context_voxels,
        method="ws", fragments_in_xy=fragments_in_xy,
        min_seed_distance=min_seed_distance,
        filter_fragments=filter_fragments,
        epsilon_agglomerate=epsilon_agglomerate,
        replace_sections=replace_sections,
        num_workers=num_workers,
        roi=total,
    )
    agglomerate_blockwise(
        affs, fragments, rag, block_shape, context_voxels,
        merge_function=merge_function, num_workers=num_workers, roi=total,
    )
    luts = find_segments(
        rag, f"{output_container}/luts_ws", thresholds
    )
    seg_paths = {}
    for t, lut_path in luts.items():
        seg_path = (
            f"{output_container}/segmentations_ws/"
            f"{merge_function}--{_fmt_threshold(t)}"
        )
        seg = prepare_ds(
            seg_path, vox_shape, total.offset, vs, np.uint64,
            chunk_shape=tuple(
                min(b, s) for b, s in zip(block_shape, vox_shape)
            ),
        )
        extract_segmentation_blockwise(
            fragments, seg, lut_path, block_shape, num_workers, roi=total
        )
        seg_paths[t] = seg_path
    return seg_paths


def mws_pipeline_blockwise(
    affs_path: str,
    output_container: str,
    neighborhood: Sequence[Sequence[int]],
    bias: Sequence[float],
    block_shape=(32, 256, 256),
    context_voxels=(2, 32, 32),
    filter_fragments: float = 0.1,
    num_workers: int = 8,
    roi: Optional[Roi] = None,
    **mws_kwargs,
) -> Dict[str, str]:
    """Blockwise mutex pipeline (volara ExtractFrags/AffAgglom/GraphMWS/
    Relabel capability)."""
    affs = open_ds(affs_path)
    total = roi or affs.roi
    vs = affs.voxel_size
    vox_shape = tuple(Coordinate(total.shape) / vs)

    frag_path = f"{output_container}/fragments_mws"
    fragments = prepare_ds(
        frag_path, vox_shape, total.offset, vs, np.uint64,
        chunk_shape=tuple(min(b, s) for b, s in zip(block_shape, vox_shape)),
    )
    rag = RagDB(f"{output_container}/rag_mws.db", mode="w")

    extract_fragments_blockwise(
        affs, fragments, rag, block_shape, context_voxels,
        method="mws",
        filter_fragments=filter_fragments,
        mws_kwargs={"neighborhood": neighborhood, "bias": bias, **mws_kwargs},
        num_workers=num_workers, roi=total,
    )
    agglomerate_blockwise(
        affs, fragments, rag, block_shape, context_voxels,
        merge_function="mean", num_workers=num_workers, roi=total,
    )
    luts = global_mutex_segments(rag, f"{output_container}/luts_mws")
    seg_path = f"{output_container}/segmentations_mws/mws"
    seg = prepare_ds(
        seg_path, vox_shape, total.offset, vs, np.uint64,
        chunk_shape=tuple(min(b, s) for b, s in zip(block_shape, vox_shape)),
    )
    extract_segmentation_blockwise(
        fragments, seg, luts["mws"], block_shape, num_workers, roi=total
    )
    return {"mws": seg_path}
