"""World-unit chunked arrays backed by TensorStore (Zarr v2 on disk).

Equivalent capability to ``funlib.persistence.open_ds/prepare_ds`` as used
throughout the reference (e.g. reference ``bootstrapper/predict.py:97-179``):
a Zarr array plus ``offset / voxel_size / axis_names / units`` attributes,
addressed by world-unit :class:`~bootstrapper_tpu.core.geometry.Roi`.

TensorStore is the TPU-native choice here: async chunked IO with an
in-process cache, no GIL contention, and the same storage format the
reference tooling reads/writes (plain Zarr v2 + .zattrs JSON).

Arrays may have non-spatial leading dimensions (e.g. affinity channels);
only the trailing ``len(voxel_size)`` dimensions are spatial and addressed
by ROIs.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import numpy as np
import tensorstore as ts

from .geometry import Coordinate, Roi


def _split_store_path(path: str) -> tuple[str, str]:
    """Split '/a/b.zarr/c/d' into ('/a/b.zarr', 'c/d').

    If no '.zarr' component exists, treat the full path as the array dir.
    Paths are absolutised: TensorStore's file kvstore rejects relative
    paths ("Invalid file path: ./...").
    """
    path = os.path.abspath(path).rstrip("/")
    parts = path.split("/")
    for i, p in enumerate(parts):
        if p.endswith(".zarr"):
            return "/".join(parts[: i + 1]), "/".join(parts[i + 1 :])
    return path, ""


class Array:
    """A Zarr array with world-coordinate metadata."""

    def __init__(
        self,
        store: ts.TensorStore,
        offset: Coordinate,
        voxel_size: Coordinate,
        axis_names: Optional[Sequence[str]] = None,
        units: Optional[Sequence[str]] = None,
        path: str = "",
    ):
        self._store = store
        self.voxel_size = Coordinate(voxel_size)
        self.offset = Coordinate(offset)
        sdims = self.voxel_size.dims
        self.spatial_dims = sdims
        shape = tuple(store.shape)
        self.channel_shape = shape[: len(shape) - sdims]
        self.spatial_shape = shape[len(shape) - sdims :]
        self.axis_names = (
            list(axis_names)
            if axis_names is not None
            else [f"c{i}^" for i in range(len(self.channel_shape))]
            + ["zyx"[3 - sdims + i] for i in range(sdims)]
        )
        self.units = list(units) if units is not None else ["nm"] * sdims
        self.path = path

    # -- basic properties --------------------------------------------------

    @property
    def shape(self) -> tuple:
        return tuple(self._store.shape)

    @property
    def dtype(self):
        return self._store.dtype.numpy_dtype

    @property
    def roi(self) -> Roi:
        return Roi(
            self.offset, Coordinate(self.spatial_shape) * self.voxel_size
        )

    @property
    def chunk_shape(self) -> tuple:
        return tuple(self._store.chunk_layout.read_chunk.shape)

    @property
    def store(self) -> ts.TensorStore:
        return self._store

    # -- IO ----------------------------------------------------------------

    def _spatial_slices(self, roi: Roi) -> tuple:
        if not self.roi.contains(roi):
            raise IndexError(f"{roi} not contained in {self.roi}")
        for b, e, v, o in zip(
            roi.begin, roi.end, self.voxel_size, self.offset
        ):
            # funlib parity: reject unaligned ROIs instead of silently
            # floor-snapping (to_slices floor-divides, so an off-grid
            # request would read/write a shifted region with no error)
            if (b - o) % v or (e - o) % v:
                raise ValueError(
                    f"{roi} is not aligned to the voxel grid "
                    f"(voxel_size {tuple(self.voxel_size)}, "
                    f"offset {tuple(self.offset)})"
                )
        return roi.to_slices(self.voxel_size, self.offset)

    def __getitem__(self, key) -> np.ndarray:
        if isinstance(key, Roi):
            sl = (slice(None),) * len(self.channel_shape) + self._spatial_slices(
                key
            )
            return self._store[sl].read().result()
        if isinstance(key, Coordinate):
            # single world point -> value (all channels)
            idx = tuple(
                (k - o) // v
                for k, o, v in zip(key, self.offset, self.voxel_size)
            )
            sl = (slice(None),) * len(self.channel_shape) + idx
            return self._store[sl].read().result()
        return self._store[key].read().result()

    def __setitem__(self, key, value):
        value = np.asarray(value, dtype=self.dtype)
        if isinstance(key, Roi):
            sl = (slice(None),) * len(self.channel_shape) + self._spatial_slices(
                key
            )
            self._store[sl].write(value).result()
        else:
            self._store[key].write(value).result()

    def to_ndarray(
        self, roi: Optional[Roi] = None, fill_value=0, pad_mode: str = "constant"
    ) -> np.ndarray:
        """Read ``roi`` (default: full array), padding out-of-bounds with
        ``pad_mode`` ('constant' -> fill_value, or 'reflect')."""
        if roi is None:
            return self._store.read().result()
        if self.roi.contains(roi):
            return self[roi]
        inside = self.roi.intersect(roi)
        if inside.empty:
            vshape = tuple(Coordinate(roi.shape) / self.voxel_size)
            return np.full(
                self.channel_shape + vshape, fill_value, dtype=self.dtype
            )
        data = self[inside]
        lo = (inside.begin - roi.begin) / self.voxel_size
        hi = (roi.end - inside.end) / self.voxel_size
        pads = [(0, 0)] * len(self.channel_shape) + [
            (int(a), int(b)) for a, b in zip(lo, hi)
        ]
        if pad_mode == "constant":
            return np.pad(data, pads, constant_values=fill_value)
        return np.pad(data, pads, mode=pad_mode)


def _zattrs_path(path: str) -> str:
    return os.path.join(path, ".zattrs")


def _read_attrs(path: str) -> dict:
    p = _zattrs_path(path)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {}


def _write_attrs(path: str, attrs: dict):
    os.makedirs(path, exist_ok=True)
    with open(_zattrs_path(path), "w") as f:
        json.dump(attrs, f, indent=2)


def _normalize_attrs(attrs: dict, ndim: int) -> dict:
    """Map legacy attr names (resolution/transform) to canonical ones.

    Mirrors the intake normalisation of the reference volume tooling
    (reference ``bootstrapper/data/volumes.py:9-68``).
    """
    out = dict(attrs)
    if "voxel_size" not in out:
        if "resolution" in out:
            out["voxel_size"] = out["resolution"]
        elif "transform" in out and "scale" in out["transform"]:
            out["voxel_size"] = out["transform"]["scale"]
    if "offset" not in out:
        out["offset"] = [0] * len(out.get("voxel_size", [1] * ndim))
    if "voxel_size" not in out:
        out["voxel_size"] = [1] * ndim
    return out


def open_ds(path: str, mode: str = "r") -> Array:
    """Open an existing Zarr array with world metadata."""
    store_path, array_path = _split_store_path(path)
    spec = {
        "driver": "zarr",
        "kvstore": {"driver": "file", "path": store_path},
        "path": array_path,
        "open": True,
        "create": False,
    }
    store = ts.open(spec, read=True, write=(mode != "r")).result()
    attrs = _normalize_attrs(_read_attrs(path), store.ndim)
    voxel_size = Coordinate(attrs["voxel_size"])
    offset = Coordinate(attrs["offset"])
    return Array(
        store,
        offset,
        voxel_size,
        attrs.get("axis_names"),
        attrs.get("units"),
        path=path,
    )


def prepare_ds(
    path: str,
    shape: Sequence[int],
    offset: Sequence[int],
    voxel_size: Sequence[int],
    dtype,
    chunk_shape: Optional[Sequence[int]] = None,
    axis_names: Optional[Sequence[str]] = None,
    units: Optional[Sequence[str]] = None,
    mode: str = "w",
    compressor: Optional[dict] = None,
) -> Array:
    """Create (or open-compatible) a Zarr array with world metadata.

    ``shape`` is the full voxel shape including channel dims; ``offset`` and
    ``voxel_size`` cover only the trailing spatial dims.
    """
    voxel_size = Coordinate(voxel_size)
    offset = Coordinate(offset)
    shape = tuple(int(s) for s in shape)
    if chunk_shape is None:
        sdims = voxel_size.dims
        chunk_shape = shape[: len(shape) - sdims] + tuple(
            min(s, 256 if i >= len(shape) - 2 else 64)
            for i, s in enumerate(shape[len(shape) - sdims :], len(shape) - sdims)
        )
    chunk_shape = tuple(int(c) for c in chunk_shape)
    dtype = np.dtype(dtype)
    store_path, array_path = _split_store_path(path)
    zarr_dtype = dtype.str
    metadata = {
        "shape": list(shape),
        "chunks": list(chunk_shape),
        "dtype": zarr_dtype,
        "compressor": compressor
        if compressor is not None
        else {"id": "zstd", "level": 3},
        "fill_value": 0,
        "order": "C",
    }
    spec = {
        "driver": "zarr",
        "kvstore": {"driver": "file", "path": store_path},
        "path": array_path,
        "metadata": metadata,
    }
    if mode == "w":
        spec["create"] = True
        spec["delete_existing"] = True
    elif mode in ("a", "r+"):
        spec["create"] = True
        spec["open"] = True
    else:
        spec["open"] = True
    existing = mode != "w" and os.path.exists(
        os.path.join(path, ".zarray")
    )
    store = ts.open(spec, read=True, write=(mode != "r")).result()
    sdims = voxel_size.dims
    if existing:
        # opening a pre-existing array: keep its attributes (wholesale
        # rewriting would drop extra keys and could silently shift the
        # world frame) and require the requested frame to match
        attrs = _normalize_attrs(_read_attrs(path), store.ndim)
        have_off = Coordinate(attrs["offset"])
        have_vs = Coordinate(attrs["voxel_size"])
        if have_off != offset or have_vs != voxel_size:
            raise ValueError(
                f"{path} already exists with offset {tuple(have_off)} / "
                f"voxel_size {tuple(have_vs)}; requested "
                f"{tuple(offset)} / {tuple(voxel_size)} (mode={mode!r} "
                "keeps existing metadata — use mode='w' to recreate)"
            )
        return Array(
            store, have_off, have_vs, attrs.get("axis_names"),
            attrs.get("units"), path=path,
        )
    if axis_names is None:
        axis_names = [f"c{i}^" for i in range(len(shape) - sdims)] + [
            "zyx"[3 - sdims + i] for i in range(sdims)
        ]
    if units is None:
        units = ["nm"] * sdims
    _write_attrs(
        path,
        {
            "offset": list(offset),
            "voxel_size": list(voxel_size),
            "axis_names": list(axis_names),
            "units": list(units),
        },
    )
    return Array(store, offset, voxel_size, axis_names, units, path=path)
