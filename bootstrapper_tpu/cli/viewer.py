"""Dataset viewer (reference ``bootstrapper/view.py`` capability).

Uses neuroglancer when importable; otherwise prints a structured text
summary of each dataset (shape, dtype, ROI, voxel size, value summary)
— this environment ships no neuroglancer, and a text inspector keeps
``bs view`` useful in headless runs.
"""

from __future__ import annotations

import os

import numpy as np

from ..core.arrays import open_ds
from .styles import cli_echo


def _find_arrays(path: str) -> list:
    out = []
    for root, dirs, files in os.walk(path):
        if ".zarray" in files:
            out.append(root)
            dirs.clear()
    return sorted(out) or ([path] if os.path.exists(path) else [])


def view_datasets(paths, snapshot: bool = False):
    try:
        import neuroglancer  # noqa: F401

        return _view_neuroglancer(paths)
    except ImportError:
        pass
    for path in paths:
        for ds_path in _find_arrays(path):
            try:
                arr = open_ds(ds_path)
            except Exception as e:
                cli_echo(f"{ds_path}: cannot open ({e})", "view")
                continue
            data = None
            try:
                # sample the central chunk for a value summary
                data = arr.store[
                    tuple(slice(0, min(s, 64)) for s in arr.shape)
                ].read().result()
            except Exception:
                pass
            line = (
                f"{ds_path}: shape={arr.shape} dtype={arr.dtype} "
                f"roi={arr.roi} voxel_size={tuple(arr.voxel_size)}"
            )
            if data is not None and data.size:
                if np.issubdtype(arr.dtype, np.integer):
                    line += (
                        f" ids~{len(np.unique(data))}"
                        f" max={int(data.max())}"
                    )
                else:
                    line += f" range=[{data.min():.3f},{data.max():.3f}]"
            cli_echo(line, "view")


def _view_neuroglancer(paths):
    import neuroglancer

    neuroglancer.set_server_bind_address("0.0.0.0")
    viewer = neuroglancer.Viewer()
    with viewer.txn() as s:
        for path in paths:
            for ds_path in _find_arrays(path):
                arr = open_ds(ds_path)
                data = arr.to_ndarray()
                dims = neuroglancer.CoordinateSpace(
                    names=["z", "y", "x"][-arr.spatial_dims :],
                    units="nm",
                    scales=list(arr.voxel_size),
                )
                is_seg = np.issubdtype(arr.dtype, np.integer) and \
                    arr.dtype.itemsize >= 4
                layer_cls = (
                    neuroglancer.SegmentationLayer
                    if is_seg
                    else neuroglancer.ImageLayer
                )
                s.layers[os.path.basename(ds_path)] = layer_cls(
                    source=neuroglancer.LocalVolume(
                        data=data, dimensions=dims,
                        voxel_offset=[
                            o // v for o, v in zip(arr.offset, arr.voxel_size)
                        ],
                    )
                )
    cli_echo(str(viewer), "view")
    input("press enter to exit")
