import numpy as np
import pytest

from bootstrapper_tpu.ops.affinities import seg_to_affs
from bootstrapper_tpu.post.fragments import (
    cc_from_affinities,
    mutex_watershed_from_affinities,
    watershed_from_affinities,
)
from bootstrapper_tpu.post.segment import (
    METHOD_DEFAULTS,
    cc_segmentation,
    mws_segmentation,
    remove_small_segments,
    waterz_segmentation,
)


def _two_object_affs(shape=(6, 24, 24), split_at=12):
    """Perfect affinities of a volume with two y-separated objects."""
    seg = np.zeros(shape, np.int64)
    seg[:, :split_at, :] = 1
    seg[:, split_at:, :] = 2
    nbhd = [[-1, 0, 0], [0, -1, 0], [0, 0, -1]]
    affs = np.asarray(seg_to_affs(seg, nbhd)).astype(np.float32)
    return seg, affs


def _vi_split_equivalent(a, b):
    """Two labelings are equivalent iff they induce the same partition."""
    pairs = set(zip(a.ravel().tolist(), b.ravel().tolist()))
    return len(pairs) == len(set(x for x, _ in pairs)) == len(
        set(y for _, y in pairs)
    )


def test_watershed_fragments_separate_objects():
    seg, affs = _two_object_affs()
    frags, max_id = watershed_from_affinities(affs, fragments_in_xy=True)
    assert max_id > 0
    # no fragment spans the boundary
    top = set(np.unique(frags[:, :11, :]))
    bot = set(np.unique(frags[:, 13:, :]))
    assert not (top & bot - {0})


def test_waterz_segmentation_recovers_objects():
    seg, affs = _two_object_affs()
    segs = waterz_segmentation(affs, thresholds=[0.5], fragments_in_xy=True)
    out = segs[0.5]
    # interiors resolve to exactly two segments matching the gt partition
    interior = (slice(None), slice(1, 11), slice(1, 23))
    interior2 = (slice(None), slice(13, 23), slice(1, 23))
    a = out[interior]
    b = out[interior2]
    assert len(np.unique(a)) == 1 and np.unique(a)[0] != 0
    assert len(np.unique(b)) == 1 and np.unique(b)[0] != 0
    assert np.unique(a)[0] != np.unique(b)[0]


def test_waterz_threshold_monotonicity():
    """Higher thresholds merge more: segment count is non-increasing."""
    rng = np.random.default_rng(0)
    seg, affs = _two_object_affs()
    affs = np.clip(affs + rng.normal(0, 0.1, affs.shape), 0, 1).astype(
        np.float32
    )
    segs = waterz_segmentation(
        affs, thresholds=[0.1, 0.5, 0.9], fragments_in_xy=True
    )
    counts = [len(np.unique(segs[t])) for t in [0.1, 0.5, 0.9]]
    assert counts[0] >= counts[1] >= counts[2]


def test_mws_segmentation_separates_objects():
    seg, affs9 = _two_object_affs()
    nbhd = METHOD_DEFAULTS["mws"]["neighborhood"]
    affs = np.asarray(seg_to_affs(seg, nbhd)).astype(np.float32)
    out = mws_segmentation(
        affs,
        neighborhood=nbhd,
        bias=METHOD_DEFAULTS["mws"]["bias"],
        sigma=None,
        noise_eps=None,
        strides=None,
    )
    assert _vi_split_equivalent(out[:, 2:10], seg[:, 2:10])
    top = set(np.unique(out[:, :10, :]))
    bot = set(np.unique(out[:, 14:, :]))
    assert not (top & bot)


def test_cc_segmentation():
    seg, affs = _two_object_affs()
    out = cc_segmentation(affs, threshold=0.5)
    assert out.shape == seg.shape
    top = np.unique(out[:, 2:10, 2:22])
    bot = np.unique(out[:, 14:22, 2:22])
    assert len(top) == 1 and len(bot) == 1 and top[0] != bot[0]


def test_cc_uint8_affs_scaled():
    seg, affs = _two_object_affs()
    out = cc_segmentation((affs * 255).astype(np.uint8), threshold=0.5)
    top = np.unique(out[:, 2:10, 2:22])
    assert len(top) == 1 and top[0] != 0


def test_remove_small_segments():
    seg = np.zeros((10, 10), np.uint64)
    seg[:5, :5] = 1
    seg[9, 9] = 2
    out = remove_small_segments(seg, min_size=5)
    assert 2 not in out
    assert (out[:5, :5] == 1).all()


def test_roi_offset_without_shape_rejected(tmp_path):
    """bs segment --roi-offset without --roi-shape is a usage error,
    not a TypeError."""
    import pytest

    from bootstrapper_tpu.utils import tomlio
    from bootstrapper_tpu.workflows.segment import run_segmentation

    cfg = {"segment": {"v": {"affs_dataset": "x", "seg_dataset_prefix": "y"}}}
    path = str(tmp_path / "seg.toml")
    tomlio.dump(cfg, path)
    with pytest.raises(ValueError, match="together"):
        run_segmentation(path, roi_offset=(0, 0, 0))
