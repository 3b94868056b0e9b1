"""Affinity graph construction and boundary growing as jittable JAX ops.

Capability parity with the gunpowder nodes the reference trains against —
``gp.AddAffinities``/``seg_to_affgraph`` and ``gp.GrowBoundary`` (usage:
reference ``bootstrapper/models/3d_affs/train.py:129-140``) — but computed
on device with static shapes so they fuse into the preprocessing graph:

- ``seg_to_affs``: for each neighborhood offset ``o``, affinity at voxel
  ``v`` is 1 iff ``seg[v] == seg[v+o]`` and both are foreground. Shifts
  are static slices (pad + slice), so XLA lowers them to cheap views.
- ``affs_mask``: both endpoints inside the labelled (``unlabelled>0``)
  region — the training mask.
- ``grow_boundary``: iteratively zero any voxel whose cross-neighbourhood
  contains a different label (``steps`` rounds, optionally xy-only),
  i.e. simultaneous erosion of every label, matching boundary growth
  between touching labels.

All functions take/return unbatched arrays shaped (*spatial,) and map
over leading batch dims with ``jax.vmap`` if needed.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _shifted(seg, offset, fill=0):
    """seg shifted so result[v] = seg[v + offset] (out-of-bounds -> fill)."""
    dims = seg.ndim
    pads = []
    slices = []
    for d in range(dims):
        o = int(offset[d])
        if o >= 0:
            pads.append((0, o))
            slices.append(slice(o, o + seg.shape[d]))
        else:
            pads.append((-o, 0))
            slices.append(slice(0, seg.shape[d]))
    padded = jnp.pad(seg, pads, constant_values=fill)
    return padded[tuple(slices)]


def _in_bounds(shape, offset):
    """Boolean mask of voxels whose +offset partner is inside the array."""
    masks = []
    grids = jnp.indices(shape)
    m = jnp.ones(shape, bool)
    for d, o in enumerate(offset):
        idx = grids[d] + int(o)
        m = m & (idx >= 0) & (idx < shape[d])
    return m


def seg_to_affs(seg, neighborhood: Sequence[Sequence[int]], dtype=jnp.float32):
    """Affinities (len(neighborhood), *spatial) from a label volume."""
    seg = jnp.asarray(seg)
    affs = []
    for offset in neighborhood:
        partner = _shifted(seg, offset, fill=0)
        inb = _in_bounds(seg.shape, offset)
        a = (seg == partner) & (seg > 0) & (partner > 0) & inb
        affs.append(a)
    return jnp.stack(affs).astype(dtype)


def affs_mask(unlabelled, neighborhood, dtype=jnp.float32):
    """Training mask: both edge endpoints inside the labelled region."""
    u = jnp.asarray(unlabelled) > 0
    masks = []
    for offset in neighborhood:
        partner = _shifted(u, offset, fill=False)
        masks.append(u & partner & _in_bounds(u.shape, offset))
    return jnp.stack(masks).astype(dtype)


def grow_boundary(seg, steps: int = 1, only_xy: bool = False, mask=None):
    """Grow a background boundary between touching labels.

    A voxel is zeroed when any neighbour in the 2*dims-cross (xy-cross if
    ``only_xy``) carries a different label; repeated ``steps`` times.
    With ``mask``, voxels outside the mask neither erode nor cause
    erosion beyond their fixed value (they are treated as same-label).
    """
    seg = jnp.asarray(seg)
    dims = seg.ndim
    offsets = []
    start = 1 if (only_xy and dims == 3) else 0
    for d in range(start, dims):
        for s in (-1, 1):
            o = [0] * dims
            o[d] = s
            offsets.append(o)

    in_mask = None if mask is None else jnp.asarray(mask) > 0

    def erode_once(s):
        boundary = jnp.zeros(s.shape, bool)
        for o in offsets:
            neighbor = _shifted(s, o, fill=0)
            inb = _in_bounds(s.shape, o)
            # differing labels erode each other; array border does not
            diff = (neighbor != s) & inb
            if in_mask is not None:
                # out-of-mask voxels neither erode (centre in-mask) nor
                # CAUSE erosion (neighbour in-mask): the reference
                # treats masked-out values as same-label so blobs do
                # not shrink at the mask border
                # (gp/custom_grow_boundary.py:91-96)
                diff = diff & in_mask & _shifted(in_mask, o, fill=0)
            boundary = boundary | diff
        return jnp.where(boundary, 0, s)

    for _ in range(int(steps)):
        seg = erode_once(seg)
    return seg


def balance_weights(
    target,
    mask=None,
    clip_min: float = 0.05,
    clip_max: float = 0.95,
    slab_axis=None,
):
    """Class-balancing weights for binary targets.

    For foreground fraction p (within mask, clipped to [clip_min,
    clip_max]): positive voxels weigh 1/(2p), negatives 1/(2(1-p)), and
    masked-out voxels 0 — so both classes contribute equal total weight
    (gunpowder ``BalanceLabels`` semantics, used at reference
    ``bootstrapper/models/3d_affs/train.py:140``).

    ``slab_axis``: compute fractions independently per index of that axis
    (e.g. per affinity channel, the reference's ``slab=(1,-1,-1,-1)``).
    """
    t = jnp.asarray(target)
    m = jnp.ones_like(t) if mask is None else jnp.asarray(mask).astype(t.dtype)

    def weights_of(tt, mm):
        total = jnp.maximum(jnp.sum(mm), 1.0)
        frac = jnp.clip(jnp.sum(tt * mm) / total, clip_min, clip_max)
        w_pos = 1.0 / (2.0 * frac)
        w_neg = 1.0 / (2.0 * (1.0 - frac))
        return mm * jnp.where(tt > 0.5, w_pos, w_neg)

    if slab_axis is None:
        return weights_of(t, m)
    t_moved = jnp.moveaxis(t, slab_axis, 0)
    m_moved = jnp.moveaxis(m, slab_axis, 0)
    w = jax.vmap(weights_of)(t_moved, m_moved)
    return jnp.moveaxis(w, 0, slab_axis)
