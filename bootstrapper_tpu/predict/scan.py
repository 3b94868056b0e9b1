"""Sliding-window prediction over world-unit Zarr volumes.

Single-host equivalent of the reference predict scripts' gp.Scan path
(reference ``bootstrapper/models/3d_affs/predict.py:110-157``,
``bootstrapper/predict.py:114-179``) with the TPU restructure:

- the output ROI is tiled by the net's output size; edge tiles are
  shifted inward so every tile is full-sized (static shapes for XLA;
  the overlap is recomputed, writes are clipped to unwritten extents);
- reads grow each write tile by the context ((input-output)/2) and
  reflect-pad outside the volume (gp.Pad reflect capability);
- B tiles are batched per device step and the next batch's host reads
  overlap the current device compute (double buffering);
- model outputs (sigmoid in [0,1]) are written as uint8 x255, into
  Zarrs whose chunks the driver aligns to the output tile
  (``predict.py:143-179`` behaviour);
- 2D setups slide over z with ``adj_slices`` neighbouring sections as
  channels and re-stack predictions into 3D (``stack_infer``,
  ``2d_mtlsd/predict.py:81-88`` behaviour).
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.arrays import Array
from ..core.geometry import Coordinate, Roi
from ..models.model import Model, head_dims


def auto_shape_increase(
    net_config: dict,
    volume_vox_shape,
    max_input_voxels: int = 45_000_000,
) -> list:
    """Pick a shape_increase maximising output voxels per FLOP.

    Valid convolutions make outputs independent of tile size, so larger
    tiles amortise the fixed context. Strategy: grow z first (the
    z-context dominates: e.g. 28 of 32 input slices are context for 4
    output slices in the 3d_affs config), then y/x in steps of the
    pooling factor product; stay inside the volume and the input-voxel
    budget. The 45M budget tracks the measured HBM model of the
    slab-barrier graph (~0.28 GB temp arena per M input voxels on a
    16 GB v5e; the measured-best (152,540,540) tile is 44.3M and runs
    at a 12.2 GB arena — see BASELINE.md round-3 A/B).
    """
    base_in = list(net_config["input_shape"])
    base_out = list(net_config["output_shape"])
    dims = len(base_in)
    if dims != 3:
        return list(net_config.get("shape_increase", [0] * dims))
    vol = list(volume_vox_shape)[-3:]
    factors = net_config["downsample_factors"]
    step = [1, 1, 1]
    for f in factors:
        step = [a * b for a, b in zip(step, f)]

    inc = [0, 0, 0]

    def input_voxels(inc):
        return int(np.prod([i + s for i, s in zip(base_in, inc)]))

    def fits(inc):
        out = [o + s for o, s in zip(base_out, inc)]
        inp = [i + s for i, s in zip(base_in, inc)]
        return (
            all(o <= v for o, v in zip(out, vol))
            and input_voxels(inc) <= max_input_voxels
        )

    # grow z (any integer step is conv-valid when z isn't pooled);
    # 124 output slices = the measured-best headline tile's z — taller
    # measured no better ((168/184,540,540) A/B, BASELINE.md)
    z_step = step[0]
    while True:
        cand = [inc[0] + max(z_step, 4), inc[1], inc[2]]
        if base_out[0] + cand[0] > 124 or not fits(cand):
            break
        inc = cand
    # grow y and x together in pooling-product steps
    while True:
        cand = [inc[0], inc[1] + step[1], inc[2] + step[2]]
        if not fits(cand):
            break
        inc = cand
    return inc


def shrink_shape_increase(model: "Model", volume_vox_shape, inc=None) -> list:
    """Shrink a tile's ``shape_increase`` (possibly below zero) so one
    output tile fits inside the volume — the sub-tile-volume analog of
    the reference's ``fit="shrink"`` edge handling (reference
    ``bootstrapper/predict.py:37``, daisy fit modes).

    Shrinks per dim in pooling-product steps (any step where the dim is
    never pooled), keeping the shrunk input/output pair valid for the
    net's conv arithmetic (checked via ``compute_output_shape``).  Stops
    at the smallest valid tile; callers still reject volumes below that
    floor.
    """
    from ..models import compute_output_shape

    nc = model.net_config
    dims = model.dims
    base_in = list(nc["input_shape"])
    base_out = list(nc["output_shape"])
    if inc is None:
        inc = list(nc.get("shape_increase", [0] * dims))
    inc = list(inc)
    vol = list(volume_vox_shape)[-dims:]
    step = [1] * dims
    for f in nc["downsample_factors"]:
        step = [a * b for a, b in zip(step, f)]

    def valid(cand):
        ishape = [a + b for a, b in zip(base_in, cand)]
        oshape = [a + b for a, b in zip(base_out, cand)]
        if any(o < 1 for o in oshape):
            return False
        try:
            got = compute_output_shape(model.unet_config, tuple(ishape))
        except ValueError:
            return False
        return list(got) == oshape

    for d in range(dims):
        while base_out[d] + inc[d] > vol[d]:
            cand = list(inc)
            cand[d] -= step[d]
            if not valid(cand):
                break
            inc = cand
    return inc


def tile_rois(total: Roi, tile_size: Coordinate, with_fresh: bool = False):
    """Cover ``total`` with full-sized tiles; edge tiles shift inward.

    Requires total.shape >= tile_size (caller ensures via ROI choice).

    ``with_fresh=True`` returns ``(tile, fresh)`` pairs, where ``fresh``
    is the part of the tile NOT covered by any earlier tile: inward-
    shifted edge tiles overlap their neighbour, so statistics summed
    over whole tiles would count the overlap twice.
    """
    starts_per_dim = []
    fresh_per_dim = []
    for b, e, t in zip(total.begin, total.end, tile_size):
        starts = list(range(b, e - t + 1, t))
        if not starts:
            starts = [b]
        if starts[-1] + t < e:
            starts.append(e - t)
        starts_per_dim.append(starts)
        fresh = []
        prev_end = None
        for s in starts:
            fb = s if prev_end is None else max(s, prev_end)
            fresh.append((fb, s + t))
            prev_end = s + t
        fresh_per_dim.append(fresh)
    out = []

    def rec(d, acc, facc):
        if d == len(starts_per_dim):
            tile = Roi(Coordinate(acc), tile_size)
            if with_fresh:
                fresh = Roi(
                    Coordinate(fb for fb, _ in facc),
                    Coordinate(fe - fb for fb, fe in facc),
                )
                out.append((tile, fresh))
            else:
                out.append(tile)
            return
        for s, f in zip(starts_per_dim[d], fresh_per_dim[d]):
            rec(d + 1, acc + [s], facc + [f])

    rec(0, [], [])
    return out


class Predictor:
    """Tiled, batched inference for one setup."""

    def __init__(
        self,
        model: Model,
        params,
        voxel_size,
        shape_increase: Optional[Sequence[int]] = None,
        batch_tiles: Optional[int] = None,
        compute_dtype=jnp.bfloat16,
    ):
        self.model = model
        self.voxel_size = Coordinate(voxel_size)
        nc = model.net_config
        inc = (
            list(shape_increase)
            if shape_increase is not None
            else list(nc.get("shape_increase", [0] * len(nc["input_shape"])))
        )
        in_shape = [a + b for a, b in zip(nc["input_shape"], inc)]
        out_shape = [a + b for a, b in zip(nc["output_shape"], inc)]
        if model.dims == 2:
            adj = nc.get("adj_slices", 1)
            in_shape = [adj, *in_shape]
            out_shape = [1, *out_shape]
        self.input_tile = tuple(in_shape)
        self.output_tile = tuple(out_shape)
        self.input_size = Coordinate(self.input_tile) * self.voxel_size
        self.output_size = Coordinate(self.output_tile) * self.voxel_size
        self.context = (self.input_size - self.output_size) / 2
        if batch_tiles is None:
            # auto: one 3D tile already fills the MXU (batch-2 measured
            # SLOWER — BASELINE.md round-3), but a 2D section is tiny, so
            # z-sections batch until the MXU saturates: 4->14.8, 8->27.9,
            # 32->32.7, 64->34.7 Mvox/s measured for 2d_mtlsd at the
            # 412-tile on a v5e. 32 is the knee (94% of batch-64 at half
            # the latency); memory is trivial (88 MB of inputs).
            batch_tiles = 32 if model.dims == 2 else 1
        self.batch_tiles = batch_tiles

        self.params = jax.tree_util.tree_map(
            lambda p: jnp.asarray(p, compute_dtype), params
        )
        model2 = Model(
            model.net_config,
            stack_infer=(model.dims == 2),
            compute_dtype=compute_dtype,
        )
        # build the folded-weight transforms once per checkpoint load
        # (one jitted params->params step) instead of inside every
        # per-tile forward call
        self.params = jax.jit(model2.prefold)(self.params)

        from ..utils.xla import bs_jit, tpu_default_options

        is_image = "raw" in model.net_config.get("inputs", {"raw": {}})
        self._is_image = is_image

        @bs_jit(compiler_options=tpu_default_options())
        def forward(params, x):
            if x.dtype == jnp.uint8:
                # raw-byte transfer: tiles ship as stored uint8 (4x less
                # host->device traffic than float32) and normalise here,
                # in float32 so the result is bit-identical to the host
                # normalize_raw path
                x = x.astype(jnp.float32) / 255.0
                if is_image:
                    x = x * 2.0 - 1.0
            outs = model2.apply(params, x)
            # to uint8 on device: round(clip(y)*255)
            return {
                k: jnp.round(jnp.clip(v, 0, 1) * 255).astype(jnp.uint8)
                for k, v in outs.items()
            }

        self._forward = forward

    # -- core --------------------------------------------------------------

    def predict(
        self,
        raw,
        outputs: Dict[str, Array],
        roi: Optional[Roi] = None,
    ) -> dict:
        """Run inference over ``roi`` (default: all of ``raw``), writing
        into the given output Arrays. Returns timing stats.

        ``raw`` may be one Array (image input, scaled to [-1,1] like the
        reference predict scripts) or a list of Arrays whose channel
        dims are concatenated (chained 'from' setups: prediction inputs
        stay in [0,1], reference ``3d_affs_from_2d_mtlsd/predict.py:158-162``).
        """
        inputs = raw if isinstance(raw, (list, tuple)) else [raw]
        is_image = self._is_image
        total = roi if roi is not None else next(iter(outputs.values())).roi
        tiles = tile_rois(total, self.output_size)
        B = self.batch_tiles
        t0 = time.perf_counter()
        # shared reader: all-uint8 inputs ship as raw bytes; the jitted
        # forward normalises on device (same float32 math, 4x less
        # transfer)
        from ._pipeline import make_tile_reader

        read_tile = make_tile_reader(inputs, self.context, is_image)

        def read_batch(batch_tiles):
            arrs = [read_tile(t) for t in batch_tiles]
            while len(arrs) < B:
                arrs.append(arrs[-1])  # pad batch; extra results discarded
            return np.stack(arrs)

        batches = [tiles[i : i + B] for i in range(0, len(tiles), B)]
        # shared reader-thread + one-deep pipeline + ROI-clipped writes:
        # dispatch batch i+1 before fetching batch i, so device compute
        # overlaps the previous batch's device->host transfer + writes
        # (over the TPU relay the fetch is a multi-hundred-MB round trip)
        from ._pipeline import TileWriter, run_pipelined

        writer = TileWriter(
            outputs, self.model.net_config["outputs"], self.voxel_size
        )
        run_pipelined(
            batches,
            read=read_batch,
            dispatch=lambda arrs: self._forward(
                self.params, jnp.asarray(arrs)
            ),
            drain=writer.drain_batch,
        )
        writer.finish()
        dt = time.perf_counter() - t0
        out_voxels = sum(
            np.prod(np.asarray(t.shape) // np.asarray(self.voxel_size))
            for t in tiles
        )
        return {
            "tiles": len(tiles),
            "seconds": dt,
            "voxels_per_sec": float(out_voxels / dt),
        }


def prepare_prediction_outputs(
    container: str,
    model: Model,
    roi: Roi,
    voxel_size,
    dataset_prefix: str = "",
    predictor: Optional[Predictor] = None,
) -> Dict[str, Array]:
    """Create output Zarrs for each model output over ``roi``, chunked to
    the inference tile (the reference chunks outputs by write block,
    ``predict.py:143-179``)."""
    from ..core.arrays import prepare_ds

    vs = Coordinate(voxel_size)
    out = {}
    vox_shape = tuple(Coordinate(roi.shape) / vs)
    for name, ocfg in model.net_config["outputs"].items():
        dims = head_dims(ocfg)
        if predictor is not None:
            # streaming predictors expose a chunk_tile aligned to their
            # (warm-offset) write grid; tiled predictors write whole
            # output tiles
            chunk = (
                dims,
                *getattr(predictor, "chunk_tile", predictor.output_tile),
            )
        else:
            chunk = None
        ds_name = f"{dataset_prefix}{name}" if dataset_prefix else name
        out[name] = prepare_ds(
            f"{container}/{ds_name}",
            shape=(dims, *vox_shape),
            offset=roi.offset,
            voxel_size=vs,
            dtype=np.uint8,
            chunk_shape=chunk,
        )
    return out
