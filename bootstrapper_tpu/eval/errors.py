"""Self-supervised prediction-error maps: no ground truth required.

Capability parity with the reference's AddLSDErrors / AddAffErrors scan
(reference ``bootstrapper/eval/compute_errors.py:25-252``,
``gp/add_lsd_errors.py:12-271``, ``gp/add_aff_errors.py:13-207``):
recompute the model targets (LSDs or affinities) *from a candidate
segmentation* and diff them against the model's actual predictions —
high disagreement marks probable segmentation errors.  The error map
and thresholded mask are written as Zarrs; summary stats feed the
filter stage's best-segmentation choice.

TPU restructure: per block, the segmentation is read with grown context
(3*sigma for LSDs, the neighborhood extent for affs — the reference's
upstream ROI growth), the recompute + diff runs as one jitted program,
and the valid core is written back.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.arrays import Array, prepare_ds
from ..core.geometry import Coordinate
from ..ops.affinities import seg_to_affs
from ..ops.lsd import lsd_descriptors_downsampled
from ..predict.scan import tile_rois
from ..train.sampler import renumber

MAX_LABELS = 256


def _error_from_diff(diff_sq_sum, n_channels, thresholds=(0.1, 1.0)):
    err = diff_sq_sum / n_channels
    mask = (err > thresholds[0]) & (err <= thresholds[1])
    return err, mask


def compute_lsd_errors(
    seg: Array,
    pred_lsds: Array,
    sigma,
    out_container: str,
    voxel_size=None,
    downsample: int = 2,
    block_shape=(16, 128, 128),
    thresholds=(0.1, 1.0),
    dataset_prefix: str = "lsd_error",
) -> Dict:
    """Scan the volume: recompute LSDs from ``seg``, diff vs ``pred_lsds``."""
    vs = Coordinate(voxel_size) if voxel_size is not None else seg.voxel_size
    roi = seg.roi.intersect(pred_lsds.roi)
    sigma3 = (
        tuple(sigma) if not np.isscalar(sigma) else (sigma,) * 3
    )
    # 3*sigma context, snapped up to the voxel grid (the reference's
    # upstream ROI growth, gp/add_lsd_errors.py:131-153)
    context = Coordinate(
        ((int(3 * s) + v - 1) // v) * v for s, v in zip(sigma3, vs)
    )

    err_ds = prepare_ds(
        f"{out_container}/{dataset_prefix}_map",
        shape=tuple(Coordinate(roi.shape) / vs),
        offset=roi.offset,
        voxel_size=vs,
        dtype=np.float32,
    )
    mask_ds = prepare_ds(
        f"{out_container}/{dataset_prefix}_mask",
        shape=tuple(Coordinate(roi.shape) / vs),
        offset=roi.offset,
        voxel_size=vs,
        dtype=np.uint8,
    )

    # blocks never larger than the ROI: tile_rois requires it, and a
    # small test volume would otherwise emit overhanging tiles that
    # fail the dataset write
    block_size = Coordinate(
        min(b * v, s) for b, v, s in zip(block_shape, vs, roi.shape)
    )

    @jax.jit
    def chunk_lsds(seg_chunk):
        return lsd_descriptors_downsampled(
            seg_chunk, sigma=sigma3, voxel_size=tuple(vs),
            downsample=downsample, max_labels=MAX_LABELS,
        )

    @jax.jit
    def lsd_diff(lsds, pred_block):
        return jnp.sum((lsds - pred_block) ** 2, axis=0)

    total = 0
    nonzero = 0
    for wroi, fresh in tile_rois(roi, block_size, with_fresh=True):
        # grown reads are zero-padded outside the volume so every block
        # has the same static shape (one XLA compile)
        rroi = wroi.grow(context, context)
        # exact ids: the one-hot LSD kernel holds MAX_LABELS channels,
        # so label-dense blocks (> MAX_LABELS-1 ids) are processed in
        # id chunks — each voxel's LSDs are nonzero in exactly the
        # chunk containing its label (background stays 0), so the
        # chunk outputs sum to the unclamped result. No silent merging
        # of high-ranked segments.
        seg_block = renumber(seg.to_ndarray(rroi))
        pred = pred_lsds.to_ndarray(rroi)
        if np.issubdtype(pred.dtype, np.integer):
            pred = pred.astype(np.float32) / 255.0
        else:
            pred = pred.astype(np.float32)
        k = int(seg_block.max())
        lsds = None
        for lo in range(0, max(k, 1), MAX_LABELS - 1):
            seg_c = seg_block.astype(np.int64) - lo
            seg_c = np.where(
                (seg_c > 0) & (seg_c < MAX_LABELS), seg_c, 0
            ).astype(np.int32)
            part = chunk_lsds(seg_c)
            lsds = part if lsds is None else lsds + part
        err = np.asarray(lsd_diff(lsds, pred))
        err_full, mask_full = _error_from_diff(err, pred.shape[0], thresholds)
        core = tuple(
            slice(int(a), int(a + s))
            for a, s in zip(
                (wroi.begin - rroi.begin) / vs,
                Coordinate(wroi.shape) / vs,
            )
        )
        err_ds[wroi] = err_full[core].astype(np.float32)
        m = mask_full[core].astype(np.uint8)
        mask_ds[wroi] = m
        # stats over the fresh (not-yet-counted) part only: inward-
        # shifted edge tiles overlap, and whole-tile sums would count
        # the overlap twice
        fr = tuple(
            slice(int(a), int(a + s))
            for a, s in zip(
                (fresh.begin - wroi.begin) / vs,
                Coordinate(fresh.shape) / vs,
            )
        )
        total += m[fr].size
        nonzero += int(m[fr].sum())

    return {
        "error_map": err_ds.path,
        "error_mask": mask_ds.path,
        "nonzero_ratio": nonzero / max(total, 1),
        "total_voxels": total,
        "nonzero_voxels": nonzero,
    }


def compute_aff_errors(
    seg: Array,
    pred_affs: Array,
    neighborhood: Sequence[Sequence[int]],
    out_container: str,
    voxel_size=None,
    block_shape=(16, 128, 128),
    thresholds=(0.1, 1.0),
    dataset_prefix: str = "aff_error",
) -> Dict:
    """Scan the volume: recompute affinities from ``seg``, diff vs
    ``pred_affs`` summed over channels."""
    vs = Coordinate(voxel_size) if voxel_size is not None else seg.voxel_size
    roi = seg.roi.intersect(pred_affs.roi)
    pad = Coordinate(
        max(abs(o[d]) for o in neighborhood) * vs[d]
        for d in range(len(vs))
    )

    err_ds = prepare_ds(
        f"{out_container}/{dataset_prefix}_map",
        shape=tuple(Coordinate(roi.shape) / vs),
        offset=roi.offset,
        voxel_size=vs,
        dtype=np.float32,
    )
    mask_ds = prepare_ds(
        f"{out_container}/{dataset_prefix}_mask",
        shape=tuple(Coordinate(roi.shape) / vs),
        offset=roi.offset,
        voxel_size=vs,
        dtype=np.uint8,
    )
    block_size = Coordinate(
        min(b * v, s) for b, v, s in zip(block_shape, vs, roi.shape)
    )
    n_ch = len(neighborhood)

    @jax.jit
    def block_error(seg_block, pred_block):
        affs = seg_to_affs(seg_block, neighborhood)
        diff = (affs - pred_block) ** 2
        return jnp.sum(diff, axis=0)

    total = 0
    nonzero = 0
    for wroi, fresh in tile_rois(roi, block_size, with_fresh=True):
        rroi = wroi.grow(pad, pad)
        seg_block = seg.to_ndarray(rroi).astype(np.int64)
        pred = pred_affs.to_ndarray(rroi)[:n_ch]
        if np.issubdtype(pred.dtype, np.integer):
            pred = pred.astype(np.float32) / 255.0
        else:
            pred = pred.astype(np.float32)
        err = np.asarray(block_error(seg_block, pred))
        err_full, mask_full = _error_from_diff(err, n_ch, thresholds)
        core = tuple(
            slice(int(a), int(a + s))
            for a, s in zip(
                (wroi.begin - rroi.begin) / vs,
                Coordinate(wroi.shape) / vs,
            )
        )
        err_ds[wroi] = err_full[core].astype(np.float32)
        m = mask_full[core].astype(np.uint8)
        mask_ds[wroi] = m
        fr = tuple(
            slice(int(a), int(a + s))
            for a, s in zip(
                (fresh.begin - wroi.begin) / vs,
                Coordinate(fresh.shape) / vs,
            )
        )
        total += m[fr].size
        nonzero += int(m[fr].sum())

    return {
        "error_map": err_ds.path,
        "error_mask": mask_ds.path,
        "nonzero_ratio": nonzero / max(total, 1),
        "total_voxels": total,
        "nonzero_voxels": nonzero,
    }
