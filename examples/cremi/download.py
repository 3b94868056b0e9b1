"""Fetch CREMI sample C and stage it as cremi_c.zarr.

Mirrors the reference example data prep (reference
``examples/cremi/download.py:9-28``): raw + gt labels + sparse 2D labels,
with the two defective sections (14, 74) zeroed.  When the CREMI server
is unreachable (e.g. no egress), fall back to a synthetic EM-like volume
with the same structure (see ``make_synthetic.py``) so the example
remains runnable end-to-end.
"""

import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)

CREMI_URL = "https://cremi.org/static/data/sample_C_20160501.hdf"
DEFECTIVE_SECTIONS = [14, 74]
VOXEL_SIZE = (40, 4, 4)


def stage(raw, gt_labels, out="cremi_c.zarr"):
    from bootstrapper_tpu.core.arrays import prepare_ds

    for z in DEFECTIVE_SECTIONS:
        if z < raw.shape[0]:
            raw[z] = 0

    # sparse 2D labels: every 10th section of the ground truth
    sparse = np.zeros_like(gt_labels)
    sparse[::10] = gt_labels[::10]

    for name, data in [
        ("raw", raw.astype(np.uint8)),
        ("gt_labels", gt_labels.astype(np.uint64)),
        ("sparse_labels", sparse.astype(np.uint64)),
    ]:
        ds = prepare_ds(
            f"{out}/{name}", data.shape, (0, 0, 0), VOXEL_SIZE, data.dtype
        )
        ds[ds.roi] = data
        print(f"wrote {out}/{name} {data.shape}")


def main():
    try:
        import urllib.request

        import h5py

        path, _ = urllib.request.urlretrieve(CREMI_URL, "sample_C.hdf")
        with h5py.File(path) as f:
            raw = f["volumes/raw"][:]
            gt = f["volumes/labels/neuron_ids"][:]
        stage(raw, gt)
    except Exception as e:
        print(f"CREMI download unavailable ({e}); generating synthetic data")
        from make_synthetic import synthetic_em

        raw, gt = synthetic_em()
        stage(raw, gt)


if __name__ == "__main__":
    main()
