"""Spatially-sharded inference: ONE tile split across the device mesh.

``ShardedPredictor`` (sharded.py) replicates the model and shards the
*tile batch* — it scales throughput but not memory, so the largest
processable tile is still bounded by one chip's HBM.  This module
shards a single tile's *spatial extent* over the mesh instead (the
TPU-native mapping of the reference's block-halo scheme, reference
``bootstrapper/predict.py:128-132``, where daisy workers each process a
grown read ROI):

- the padded input tile is laid out over the mesh along one spatial
  axis (``jax.sharding``, equal slabs per device);
- inside ``shard_map``, devices exchange boundary halos with their
  mesh neighbours via ``lax.ppermute`` (one hop left + one hop right
  over ICI) so every device holds its output slab's full receptive
  field;
- each device then runs the standard forward (fold/lazy-decoder
  optimisations intact — valid convolutions are translation-equivariant,
  so slab outputs equal the corresponding rows of the whole-tile
  output) and writes its 1/N of the output;
- per-device working set is that of a ``1/N + halo`` slab, so the
  mesh's aggregate HBM bounds the tile, not a single chip's.

Redundant halo compute is ``2*context / own_slab`` along the sharded
axis; the predictor shards the longest output axis to minimise it.
"""

from __future__ import annotations

import logging
import math
import time
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.arrays import Array
from ..core.geometry import Coordinate, Roi
from ..models import Model
from .scan import tile_rois

logger = logging.getLogger(__name__)


def slab_is_valid(unet_cfg, in_tile, out_tile, d: int, n_dev: int) -> bool:
    """A device's slab (own output rows + full context) must itself be a
    valid input to the net along axis ``d``: output extents move on the
    downsample-factor lattice, so ``own`` must keep the slab's input
    length conv/pool-compatible."""
    from ..models.unet import compute_output_shape

    own = out_tile[d] // n_dev
    ctx = (in_tile[d] - out_tile[d]) // 2
    slab = list(in_tile)
    slab[d] = own + 2 * ctx
    try:
        produced = compute_output_shape(unet_cfg, slab)
    except Exception:
        return False
    expect = list(out_tile)
    expect[d] = own
    return list(produced) == expect


def pick_shard_axis(out_tile: Sequence[int], context: Sequence[int],
                    n_dev: int, unet_cfg=None,
                    in_tile: Optional[Sequence[int]] = None) -> int:
    """Axis with the least halo overhead: maximise own_slab / context
    among axes whose output extent splits evenly into valid slabs."""
    best, best_cost = None, None
    for d in range(len(out_tile)):
        if out_tile[d] % n_dev:
            continue
        own = out_tile[d] // n_dev
        if own < 1:
            continue
        if unet_cfg is not None and not slab_is_valid(
            unet_cfg, in_tile, out_tile, d, n_dev
        ):
            continue
        cost = (2 * context[d]) / own  # redundant fraction
        if best_cost is None or cost < best_cost:
            best, best_cost = d, cost
    if best is None:
        raise ValueError(
            f"no output axis of {tuple(out_tile)} divides into {n_dev} "
            "valid slabs; adjust shape_increase (slab outputs must land "
            "on the net's downsample lattice)"
        )
    return best


def spatial_shape_increase(nc: dict, n_dev: int,
                           vol_shape: Optional[Sequence[int]] = None):
    """shape_increase growing the net's default tile so one axis splits
    into ``n_dev`` valid slabs (used when ``--sharded spatial`` is given
    without an explicit tile).

    Picks the axis with the least halo overhead whose grown extent still
    fits the volume; each device's output slab is at least the net's
    default output extent rounded up to the downsample lattice."""
    from math import ceil, prod

    from ..models import Model

    in0, out0 = list(nc["input_shape"]), list(nc["output_shape"])
    ctx = [(i - o) // 2 for i, o in zip(in0, out0)]
    dims = len(in0)
    steps = [
        prod(f[d] for f in nc["downsample_factors"]) for d in range(dims)
    ]
    cfg = Model(nc).unet_config
    best = None
    for d in range(dims):
        own = steps[d] * ceil(max(out0[d], 2 * ctx[d]) / steps[d])
        for _ in range(8):  # bump until the slab is lattice-valid
            inc = [0] * dims
            inc[d] = n_dev * own - out0[d]
            in_tile = [a + b for a, b in zip(in0, inc)]
            out_tile = [a + b for a, b in zip(out0, inc)]
            if inc[d] >= 0 and slab_is_valid(
                cfg, in_tile, out_tile, d, n_dev
            ):
                break
            own += steps[d]
        else:
            continue
        if vol_shape is not None and out_tile[d] > vol_shape[d]:
            continue
        cost = 2 * ctx[d] / own
        if best is None or cost < best[0]:
            best = (cost, inc)
    if best is None:
        raise ValueError(
            f"cannot grow tile {tuple(out0)} into {n_dev} valid slabs "
            f"within volume {vol_shape}; use fewer devices or pass "
            "shape_increase explicitly"
        )
    return best[1]


class SpatialShardedPredictor:
    """Tiled inference with each tile's spatial extent sharded over the
    mesh (halo exchange via collective permute)."""

    def __init__(
        self,
        model: Model,
        params,
        voxel_size,
        devices: Optional[Sequence] = None,
        shape_increase: Optional[Sequence[int]] = None,
        shard_axis: Optional[int] = None,
        compute_dtype=jnp.bfloat16,
    ):
        if model.dims != 3:
            raise ValueError(
                "spatial sharding targets 3D volumes; 2D setups use the "
                "batch-sharded predictor"
            )
        self.model = model
        self.voxel_size = Coordinate(voxel_size)
        devices = list(devices if devices is not None else jax.devices())
        self.n_dev = n = len(devices)
        self.mesh = Mesh(np.asarray(devices), ("space",))

        nc = model.net_config
        inc = (
            list(shape_increase)
            if shape_increase is not None
            else list(nc.get("shape_increase", [0] * len(nc["input_shape"])))
        )
        in_shape = [a + b for a, b in zip(nc["input_shape"], inc)]
        out_shape = [a + b for a, b in zip(nc["output_shape"], inc)]
        self.in_tile = tuple(in_shape)
        self.out_tile = tuple(out_shape)
        self.input_size = Coordinate(self.in_tile) * self.voxel_size
        self.output_size = Coordinate(self.out_tile) * self.voxel_size
        self.context = (self.input_size - self.output_size) / 2
        ctx_vox = tuple(
            (i - o) // 2 for i, o in zip(self.in_tile, self.out_tile)
        )

        d = (
            shard_axis
            if shard_axis is not None
            else pick_shard_axis(
                self.out_tile, ctx_vox, n,
                unet_cfg=model.unet_config, in_tile=self.in_tile,
            )
        )
        if self.out_tile[d] % n:
            raise ValueError(
                f"output extent {self.out_tile[d]} along axis {d} not "
                f"divisible into {n} slabs"
            )
        if not slab_is_valid(model.unet_config, self.in_tile,
                             self.out_tile, d, n):
            raise ValueError(
                f"slab along axis {d} is not a valid net input "
                f"(own={self.out_tile[d] // n} rows must land on the "
                "downsample lattice); adjust shape_increase"
            )
        self.shard_axis = d
        self.own_out = own = self.out_tile[d] // n
        # equal input slabs (padded to divisibility)
        self.c_in = c_in = math.ceil(self.in_tile[d] / n)
        self.in_padded = c_in * n
        L = own + 2 * ctx_vox[d]  # rows each device needs
        # halo bounds: device k needs global rows
        # [k*own, k*own + L) of the input; it owns [k*c_in, (k+1)*c_in).
        # The overlap with neighbours can span more than one slab for
        # context-heavy tiles, so halos travel as whole-slab
        # collective-permute hops (m_l to the right, m_r to the left).
        h_l = (n - 1) * (c_in - own)
        h_r = max(0, L - c_in)
        m_l = -(-h_l // c_in)  # ceil
        m_r = -(-h_r // c_in)
        self.halo = (h_l, h_r)
        self.hops = (m_l, m_r)

        ax = 1 + d  # batch axis first
        spatial_spec = [None] * 3
        spatial_spec[d] = "space"
        self.in_spec = P(None, *spatial_spec, None)

        is_image = "raw" in model.net_config.get("inputs", {"raw": {}})
        self._is_image = is_image
        model2 = Model(model.net_config, compute_dtype=compute_dtype)
        self.params = jax.device_put(
            jax.jit(model2.prefold)(
                jax.tree_util.tree_map(
                    lambda p: jnp.asarray(p, compute_dtype), params
                )
            ),
            NamedSharding(self.mesh, P()),
        )

        def fwd(params, x_local):
            # halo exchange: whole-slab ppermute hops along the 'space'
            # ring; after hop j leftward, device k holds slab k-j
            # (devices past the edge receive zeros, which the slice
            # below never reads)
            parts = [x_local]
            cur = x_local
            for _ in range(m_l):
                cur = jax.lax.ppermute(
                    cur, "space", [(i, i + 1) for i in range(n - 1)]
                )
                parts.insert(0, cur)
            cur = x_local
            for _ in range(m_r):
                cur = jax.lax.ppermute(
                    cur, "space", [(i, i - 1) for i in range(1, n)]
                )
                parts.append(cur)
            ext = (
                jnp.concatenate(parts, axis=ax) if len(parts) > 1 else x_local
            )
            # ext covers global rows [(k-m_l)*c_in, (k+m_r+1)*c_in);
            # this device's receptive field starts at global row k*own
            k = jax.lax.axis_index("space")
            start = k * own - k * c_in + m_l * c_in
            slab = jax.lax.dynamic_slice_in_dim(ext, start, L, axis=ax)
            if slab.dtype == jnp.uint8:
                # raw-byte transfer: tiles ship (and halos ppermute!)
                # as uint8 — 4x less host->device AND ICI traffic;
                # normalise here, bit-identical to host normalize_raw
                slab = slab.astype(jnp.float32) / 255.0
                if is_image:
                    slab = slab * 2.0 - 1.0
            outs = model2.apply(params, slab)
            return {
                name: jnp.round(jnp.clip(v, 0, 1) * 255).astype(jnp.uint8)
                for name, v in outs.items()
            }

        out_specs = {
            name: self.in_spec for name in model.net_config["outputs"]
        }
        from ..utils.xla import bs_jit, tpu_default_options

        self._forward = bs_jit(
            shard_map(
                fwd,
                mesh=self.mesh,
                in_specs=(P(), self.in_spec),
                out_specs=out_specs,
                check_vma=False,
            ),
            compiler_options=tpu_default_options(),
        )
        self.in_sharding = NamedSharding(self.mesh, self.in_spec)

    @property
    def input_tile(self):
        """Alias matching Predictor's naming (used by output chunking)."""
        return self.in_tile

    @property
    def output_tile(self):
        return self.out_tile

    # -- core --------------------------------------------------------------

    def _read_tile(self, inputs, write_roi: Roi) -> np.ndarray:
        from ._pipeline import make_tile_reader

        x = make_tile_reader(inputs, self.context, self._is_image)(
            write_roi
        )
        pad = self.in_padded - x.shape[self.shard_axis]
        if pad:
            widths = [(0, 0)] * x.ndim
            widths[self.shard_axis] = (0, pad)
            x = np.pad(x, widths, mode="edge")  # never read by any slab
        return x[None]  # batch axis

    def predict(
        self,
        raw,
        outputs: Dict[str, Array],
        roi: Optional[Roi] = None,
    ) -> dict:
        inputs = raw if isinstance(raw, (list, tuple)) else [raw]
        total = roi if roi is not None else next(iter(outputs.values())).roi
        tiles = tile_rois(total, self.output_size)
        t0 = time.perf_counter()

        # shared reader-thread + one-deep pipeline + ROI-clipped writes
        # (same machinery as Predictor.predict, ._pipeline); one tile is
        # a batch of one here — the extra in-flight uint8 output set
        # stays sharded on device, small next to the activation arena
        from ._pipeline import TileWriter, run_pipelined

        writer = TileWriter(
            outputs, self.model.net_config["outputs"], self.voxel_size
        )
        run_pipelined(
            tiles,
            read=lambda wroi: self._read_tile(inputs, wroi),
            dispatch=lambda arr_np: self._forward(
                self.params,
                jax.device_put(jnp.asarray(arr_np), self.in_sharding),
            ),
            drain=lambda wroi, outs: writer.drain_batch([wroi], outs),
        )
        writer.finish()
        dt = time.perf_counter() - t0
        out_voxels = len(tiles) * int(np.prod(self.out_tile))
        return {
            "tiles": len(tiles),
            "devices": self.n_dev,
            "shard_axis": self.shard_axis,
            "halo": self.halo,
            "seconds": dt,
            "voxels_per_sec": out_voxels / dt,
        }
