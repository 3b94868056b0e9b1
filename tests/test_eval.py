import networkx as nx
import numpy as np
import pytest

from bootstrapper_tpu.core.arrays import prepare_ds
from bootstrapper_tpu.eval.errors import compute_aff_errors, compute_lsd_errors
from bootstrapper_tpu.eval.skeletons import expected_run_length
from bootstrapper_tpu.eval.voi import rand_voi


def test_voi_perfect():
    gt = np.array([[1, 1, 2, 2]])
    out = rand_voi(gt, gt)
    assert out["voi_split"] == pytest.approx(0.0, abs=1e-9)
    assert out["voi_merge"] == pytest.approx(0.0, abs=1e-9)
    assert out["rand_split"] == pytest.approx(1.0)


def test_voi_relabeled_is_perfect():
    gt = np.array([[1, 1, 2, 2]])
    seg = np.array([[7, 7, 3, 3]])
    out = rand_voi(gt, seg)
    assert out["voi_split"] + out["voi_merge"] == pytest.approx(0.0, abs=1e-9)


def test_voi_split_merge_direction():
    gt = np.array([1, 1, 1, 1, 2, 2, 2, 2])
    over = np.array([1, 1, 3, 3, 2, 2, 4, 4])  # each gt split in two
    under = np.array([1, 1, 1, 1, 1, 1, 1, 1])  # all merged
    o = rand_voi(gt, over)
    assert o["voi_split"] > 0 and o["voi_merge"] == pytest.approx(0, abs=1e-9)
    u = rand_voi(gt, under)
    assert u["voi_merge"] > 0 and u["voi_split"] == pytest.approx(0, abs=1e-9)
    # split of each gt object into 2 halves costs exactly 1 bit
    assert o["voi_split"] == pytest.approx(1.0)


def test_voi_ids_beyond_32_bits():
    # blockwise fragment/segment ids are block_id * voxels_per_block and
    # exceed 2**32 on large volumes; bit-packing raw ids would silently
    # merge distinct segments (round-1 VERDICT item 6)
    big = np.uint64(1) << np.uint64(40)
    gt = np.array([1, 1, 2, 2, big, big, big + np.uint64(1)], np.uint64)
    # seg splits big into two + relabels everything with >2**32 ids
    seg = np.array(
        [big + np.uint64(7), big + np.uint64(7), 3, 3,
         big * np.uint64(2), big * np.uint64(3), big * np.uint64(3)],
        np.uint64,
    )
    out = rand_voi(gt, seg)
    # gt 2**40 is split (2 seg ids) and seg big*3 merges gt ids
    assert out["voi_split"] > 0
    assert out["voi_merge"] > 0
    # a distinct-high-id perfect relabeling must still be perfect
    seg2 = gt + (np.uint64(1) << np.uint64(45))
    perfect = rand_voi(gt, seg2)
    assert perfect["voi_split"] + perfect["voi_merge"] == pytest.approx(
        0.0, abs=1e-9
    )
    # regression: two seg ids that collide modulo 2**32 stay distinct
    gt3 = np.array([1, 1, 1, 1], np.uint64)
    seg3 = np.array([5, 5, 5 + (1 << 32), 5 + (1 << 32)], np.uint64)
    out3 = rand_voi(gt3, seg3)
    assert out3["voi_split"] == pytest.approx(1.0)


def test_voi_ignores_gt_zero():
    gt = np.array([0, 0, 1, 1])
    seg = np.array([5, 6, 7, 7])
    out = rand_voi(gt, seg)
    assert out["voi_split"] == pytest.approx(0.0, abs=1e-9)


def _line_skeleton(n, seg_ids, skel_prefix="s"):
    g = nx.Graph()
    for i in range(n):
        g.add_node(f"{skel_prefix}{i}", position=(0.0, 0.0, float(i * 10)))
    for i in range(n - 1):
        g.add_edge(f"{skel_prefix}{i}", f"{skel_prefix}{i+1}")
    ids = {f"{skel_prefix}{i}": seg_ids[i] for i in range(n)}
    return g, ids


def test_erl_perfect():
    g, ids = _line_skeleton(5, [1, 1, 1, 1, 1])
    m = expected_run_length(g, ids)
    assert m["erl"] == pytest.approx(40.0)  # full 40nm line
    assert m["nerl"] == pytest.approx(1.0)
    assert m["split_count"] == 0 and m["merge_count"] == 0


def test_erl_split():
    g, ids = _line_skeleton(5, [1, 1, 1, 2, 2])
    m = expected_run_length(g, ids)
    # runs of 20 and 10 over total 40: (400+100)/40
    assert m["erl"] == pytest.approx(12.5)
    assert m["split_count"] == 1


def test_erl_merge_detected():
    g1, ids1 = _line_skeleton(3, [1, 1, 1], "a")
    g2, ids2 = _line_skeleton(3, [1, 1, 1], "b")
    g = nx.union(g1, g2)
    ids = {**ids1, **ids2}
    m = expected_run_length(g, ids)
    assert m["merge_count"] == 1
    # merged segment excluded from runs -> erl 0
    assert m["erl"] == pytest.approx(0.0)


def test_erl_background_breaks_runs():
    g, ids = _line_skeleton(5, [1, 1, 0, 1, 1])
    m = expected_run_length(g, ids)
    assert m["erl"] == pytest.approx((100 + 100) / 40.0)


def _write_seg(tmp_path, seg, vs=(1, 1, 1), name="seg"):
    a = prepare_ds(str(tmp_path / f"e.zarr/{name}"), seg.shape, (0, 0, 0), vs, seg.dtype)
    a[a.roi] = seg
    return a


def test_aff_errors_flag_bad_segmentation(tmp_path):
    from bootstrapper_tpu.ops.affinities import seg_to_affs

    nbhd = [[-1, 0, 0], [0, -1, 0], [0, 0, -1]]
    gt = np.zeros((8, 16, 16), np.uint64)
    gt[:, :8, :] = 1
    gt[:, 8:, :] = 2
    affs = np.asarray(seg_to_affs(gt, nbhd))  # perfect predictions
    affs_ds = prepare_ds(
        str(tmp_path / "e.zarr/affs"), (3, 8, 16, 16), (0, 0, 0), (1, 1, 1),
        np.float32,
    )
    affs_ds[affs_ds.roi] = affs

    good = _write_seg(tmp_path, gt, name="good")
    bad = np.ones_like(gt)  # everything merged
    bad_ds = _write_seg(tmp_path, bad, name="bad")

    r_good = compute_aff_errors(
        good, affs_ds, nbhd, str(tmp_path / "out_good.zarr"),
        block_shape=(8, 16, 16),
    )
    r_bad = compute_aff_errors(
        bad_ds, affs_ds, nbhd, str(tmp_path / "out_bad.zarr"),
        block_shape=(8, 16, 16),
    )
    assert r_bad["nonzero_ratio"] > r_good["nonzero_ratio"]


def test_lsd_errors_run(tmp_path):
    from bootstrapper_tpu.ops.lsd import lsd_descriptors

    gt = np.zeros((4, 16, 16), np.uint64)
    gt[:, :8, :] = 1
    gt[:, 8:, :] = 2
    lsds = np.asarray(lsd_descriptors(gt.astype(np.int32), sigma=4.0, max_labels=4))
    lsds_ds = prepare_ds(
        str(tmp_path / "e.zarr/lsds"), lsds.shape, (0, 0, 0), (1, 1, 1),
        np.float32,
    )
    lsds_ds[lsds_ds.roi] = lsds
    seg_ds = _write_seg(tmp_path, gt)
    r = compute_lsd_errors(
        seg_ds, lsds_ds, sigma=4.0, out_container=str(tmp_path / "out.zarr"),
        block_shape=(4, 16, 16), downsample=1,
    )
    assert 0 <= r["nonzero_ratio"] <= 0.5


def test_lsd_errors_dense_labels_not_clamped(tmp_path):
    """Regression: blocks with more ids than the one-hot kernel width
    (MAX_LABELS=256) used to be renumber-clamped, silently merging all
    high-ranked segments into one — corrupting the error map exactly in
    the densest regions. The chunked recompute must match a direct
    computation with a wide-enough one-hot."""
    from bootstrapper_tpu.eval.errors import MAX_LABELS
    from bootstrapper_tpu.ops.lsd import lsd_descriptors

    rng = np.random.default_rng(0)
    # ~400 small segments in one block (> MAX_LABELS)
    n = MAX_LABELS + 144
    gt = np.arange(1, n + 1, dtype=np.uint64).reshape(4, 10, 10)
    gt = np.repeat(np.repeat(gt, 2, axis=1), 2, axis=2)  # (4,20,20)
    assert len(np.unique(gt)) > MAX_LABELS

    # exact LSDs via a single wide one-hot (ids < 1024)
    lsds = np.asarray(
        lsd_descriptors(gt.astype(np.int32), sigma=4.0, max_labels=1024)
    )
    lsds_ds = prepare_ds(
        str(tmp_path / "e.zarr/lsds"), lsds.shape, (0, 0, 0), (1, 1, 1),
        np.float32,
    )
    lsds_ds[lsds_ds.roi] = lsds
    seg_ds = _write_seg(tmp_path, gt)
    r = compute_lsd_errors(
        seg_ds, lsds_ds, sigma=4.0, out_container=str(tmp_path / "out.zarr"),
        block_shape=(4, 20, 20), downsample=1,
    )
    # perfect predictions of the same seg: error ~0 everywhere
    assert r["nonzero_ratio"] == 0.0, r


def test_errors_roi_smaller_than_block(tmp_path):
    """Sub-block volumes must evaluate (block size clamps to the ROI)
    and stats must count every voxel exactly once."""
    nbhd = [[-1, 0, 0], [0, -1, 0], [0, 0, -1]]
    gt = np.zeros((4, 12, 12), np.uint64)
    gt[:, :6, :] = 1
    gt[:, 6:, :] = 2
    from bootstrapper_tpu.ops.affinities import seg_to_affs

    affs = np.asarray(seg_to_affs(gt, nbhd))
    affs_ds = prepare_ds(
        str(tmp_path / "e.zarr/affs"), affs.shape, (0, 0, 0), (1, 1, 1),
        np.float32,
    )
    affs_ds[affs_ds.roi] = affs
    seg_ds = _write_seg(tmp_path, gt)
    # default block_shape (16,128,128) >> volume
    r = compute_aff_errors(
        seg_ds, affs_ds, nbhd, str(tmp_path / "out.zarr"),
    )
    assert r["total_voxels"] == gt.size


def test_errors_stats_count_overlap_once(tmp_path):
    """Non-multiple volumes shift edge tiles inward; the overlap must
    not be double-counted in total/nonzero."""
    nbhd = [[-1, 0, 0], [0, -1, 0], [0, 0, -1]]
    gt = np.ones((6, 20, 20), np.uint64)  # 20 not a multiple of 12
    from bootstrapper_tpu.ops.affinities import seg_to_affs

    affs = np.asarray(seg_to_affs(gt, nbhd))
    affs_ds = prepare_ds(
        str(tmp_path / "e.zarr/affs"), affs.shape, (0, 0, 0), (1, 1, 1),
        np.float32,
    )
    affs_ds[affs_ds.roi] = affs
    seg_ds = _write_seg(tmp_path, gt)
    r = compute_aff_errors(
        seg_ds, affs_ds, nbhd, str(tmp_path / "out.zarr"),
        block_shape=(6, 12, 12),
    )
    assert r["total_voxels"] == gt.size
