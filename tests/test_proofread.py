import numpy as np
import pytest

from bootstrapper_tpu.core.arrays import open_ds, prepare_ds
from bootstrapper_tpu.ops.affinities import seg_to_affs
from bootstrapper_tpu.proofread import ProofreadSession


@pytest.fixture
def session(tmp_path):
    shape = (4, 64, 64)
    gt = np.zeros(shape, np.int64)
    gt[:, :32, :] = 1
    gt[:, 32:, :] = 2
    raw = prepare_ds(str(tmp_path / "p.zarr/raw"), shape, (0, 0, 0), (1, 1, 1), np.uint8)
    raw[raw.roi] = np.full(shape, 128, np.uint8)
    affs = (np.asarray(seg_to_affs(gt, [[-1, 0, 0], [0, -1, 0], [0, 0, -1]])) * 255).astype(np.uint8)
    ads = prepare_ds(str(tmp_path / "p.zarr/affs"), affs.shape, (0, 0, 0), (1, 1, 1), np.uint8)
    ads[ads.roi] = affs
    return ProofreadSession(raw, ads), tmp_path


def test_segment_from_point_respects_boundaries(session):
    s, _ = session
    sid = s.segment_from_point((2, 10, 30))
    assert sid > 0
    grown = s.labels == sid
    assert grown[2, 10, 30]
    assert grown.sum() > 100
    # nothing grows into the second object
    assert not grown[:, 34:, :].any()


def test_merge_and_unmerge(session):
    s, _ = session
    a = s.segment_from_point((1, 10, 10))
    b = s.segment_from_point((1, 50, 50))
    assert a != b and a > 0 and b > 0
    keep = s.merge([a, b])
    assert set(np.unique(s.labels)) <= {0, keep}
    parts = s.unmerge(keep)
    assert len(parts) == 2  # two spatially disconnected components


def test_omit_excluded_from_mask(session):
    s, tmp = session
    a = s.segment_from_point((1, 10, 10))
    b = s.segment_from_point((1, 50, 50))
    s.omit(b)
    out = s.write(str(tmp / "p.zarr"))
    labels = open_ds(out["labels"]).to_ndarray()
    mask = open_ds(out["mask"]).to_ndarray()
    assert (mask[labels == a] == 1).all()
    assert (mask[labels == b] == 0).all()


def test_filter_small(session):
    s, _ = session
    a = s.segment_from_point((1, 10, 10))
    s.labels[0, 0, 0] = 999  # speck
    s.next_id = 1000
    removed = s.filter_small(5)
    assert removed == 1
    assert 999 not in s.labels
