import os
import sys

import numpy as np

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "examples", "cremi"),
)


def test_synthetic_em_generator():
    from make_synthetic import synthetic_em

    raw, labels = synthetic_em(shape=(8, 64, 64), seed=1)
    assert raw.shape == labels.shape == (8, 64, 64)
    assert raw.dtype == np.uint8
    assert labels.max() > 1
    # membranes are darker than object interiors
    boundary = np.zeros(labels.shape, bool)
    boundary[:, 1:, :] = labels[:, 1:, :] != labels[:, :-1, :]
    assert raw[boundary].mean() < raw[~boundary].mean() - 30


def test_stage_writes_zarr(tmp_path, monkeypatch):
    import download

    monkeypatch.chdir(tmp_path)
    raw = np.random.default_rng(0).integers(0, 255, (16, 32, 32)).astype(np.uint8)
    gt = np.ones((16, 32, 32), np.uint64)
    download.stage(raw, gt, out=str(tmp_path / "c.zarr"))
    from bootstrapper_tpu.core.arrays import open_ds

    sparse = open_ds(str(tmp_path / "c.zarr/sparse_labels")).to_ndarray()
    assert (sparse[::10] > 0).all()
    assert (sparse[1] == 0).all()
    r = open_ds(str(tmp_path / "c.zarr/raw")).to_ndarray()
    assert (r[14] == 0).all()  # defective section zeroed
