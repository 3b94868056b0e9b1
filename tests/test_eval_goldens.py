"""Golden cross-checks for VOI and ERL.

The metrics select the training data for the next bootstrapping round
(reference ``bootstrapper/eval/compute_metrics.py:112-183``), so their
values are pinned two ways: hand-computed closed-form expectations for
tiny fixtures, and an independent naive implementation computing the
same definitions through a completely different code path."""

import math

import networkx as nx
import numpy as np
import pytest

from bootstrapper_tpu.eval.skeletons import expected_run_length
from bootstrapper_tpu.eval.voi import rand_voi


def naive_voi(gt, seg):
    """Independent VOI: dict-based contingency, straight from the
    definition (log2).  Deliberately shares no code with eval.voi."""
    gt = np.asarray(gt).ravel()
    seg = np.asarray(seg).ravel()
    keep = gt != 0
    gt, seg = gt[keep], seg[keep]
    n = len(gt)
    joint, pg, ps = {}, {}, {}
    for a, b in zip(gt.tolist(), seg.tolist()):
        joint[(a, b)] = joint.get((a, b), 0) + 1
        pg[a] = pg.get(a, 0) + 1
        ps[b] = ps.get(b, 0) + 1

    def H(counts):
        return -sum(
            (c / n) * math.log2(c / n) for c in counts.values() if c
        )

    return H(joint) - H(pg), H(joint) - H(ps)  # split, merge


class TestVoiGoldens:
    def test_perfect_segmentation(self):
        gt = np.array([[1, 1, 2, 2]])
        seg = np.array([[5, 5, 9, 9]])
        r = rand_voi(gt, seg)
        assert r["voi_split"] == pytest.approx(0.0, abs=1e-12)
        assert r["voi_merge"] == pytest.approx(0.0, abs=1e-12)
        assert r["rand_split"] == pytest.approx(1.0)
        assert r["rand_merge"] == pytest.approx(1.0)

    def test_pure_split_golden(self):
        # one gt object split into two equal segments:
        # H(seg|gt) = 1 bit, H(gt|seg) = 0
        gt = np.array([1, 1, 1, 1])
        seg = np.array([7, 7, 8, 8])
        r = rand_voi(gt, seg)
        assert r["voi_split"] == pytest.approx(1.0, abs=1e-12)
        assert r["voi_merge"] == pytest.approx(0.0, abs=1e-12)

    def test_pure_merge_golden(self):
        # two equal gt objects merged into one segment: H(gt|seg) = 1 bit
        gt = np.array([1, 1, 2, 2])
        seg = np.array([7, 7, 7, 7])
        r = rand_voi(gt, seg)
        assert r["voi_split"] == pytest.approx(0.0, abs=1e-12)
        assert r["voi_merge"] == pytest.approx(1.0, abs=1e-12)

    def test_uneven_split_golden(self):
        # gt: one object of 4 voxels; seg: 1 voxel + 3 voxels.
        # H(seg|gt) = -(1/4 log2 1/4 + 3/4 log2 3/4) = 2 - 0.75*log2(3)
        gt = np.array([1, 1, 1, 1])
        seg = np.array([3, 9, 9, 9])
        expected = 2.0 - 0.75 * math.log2(3)
        r = rand_voi(gt, seg)
        assert r["voi_split"] == pytest.approx(expected, abs=1e-12)
        assert r["voi_merge"] == pytest.approx(0.0, abs=1e-12)

    def test_gt_zero_ignored(self):
        gt = np.array([0, 0, 1, 1])
        seg = np.array([4, 5, 6, 6])
        r = rand_voi(gt, seg)
        assert r["voi_split"] == pytest.approx(0.0, abs=1e-12)
        assert r["voi_merge"] == pytest.approx(0.0, abs=1e-12)

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_random_volumes_match_naive(self, seed):
        rng = np.random.default_rng(seed)
        gt = rng.integers(0, 6, (4, 16, 16)).astype(np.uint64)
        seg = rng.integers(1, 9, (4, 16, 16)).astype(np.uint64)
        r = rand_voi(gt, seg)
        split, merge = naive_voi(gt, seg)
        assert r["voi_split"] == pytest.approx(split, abs=1e-9)
        assert r["voi_merge"] == pytest.approx(merge, abs=1e-9)

    def test_large_ids_match_naive(self):
        # blockwise fragment ids exceed 2**32 (VERDICT round-1 item 6)
        rng = np.random.default_rng(3)
        gt = rng.integers(0, 4, 500).astype(np.uint64)
        seg = (rng.integers(0, 5, 500).astype(np.uint64) + 1) * np.uint64(
            2**33
        )
        r = rand_voi(gt, seg)
        split, merge = naive_voi(gt, seg)
        assert r["voi_split"] == pytest.approx(split, abs=1e-9)
        assert r["voi_merge"] == pytest.approx(merge, abs=1e-9)

    @pytest.mark.parametrize("seed", [0, 7])
    def test_native_contingency_matches_numpy(self, seed):
        # the native one-pass hash builder (incl. its run-length fast
        # path) must agree exactly with the numpy unique-sort fallback
        from bootstrapper_tpu.eval import voi as voi_mod

        rng = np.random.default_rng(seed)
        # coherent runs exercise the fast path; random tail the slow one
        runs = np.repeat(
            rng.integers(0, 9, 200).astype(np.uint64), 13
        )
        gt = np.concatenate(
            [runs, rng.integers(0, 9, 300).astype(np.uint64)]
        )
        seg = np.concatenate(
            [
                np.repeat(rng.integers(1, 12, 200).astype(np.uint64), 13),
                rng.integers(1, 12, 300).astype(np.uint64),
            ]
        ) * np.uint64(2**33)
        a = rand_voi(gt, seg)
        orig = voi_mod._contingency
        voi_mod._contingency = (
            lambda g, s, z: voi_mod._contingency_numpy(g, s, z)
        )
        try:
            b = rand_voi(gt, seg)
        finally:
            voi_mod._contingency = orig
        for k in a:
            assert a[k] == pytest.approx(b[k], abs=1e-12), k


def straight_skeleton(n_nodes, edge_len=10.0):
    g = nx.Graph()
    for i in range(n_nodes):
        g.add_node(i, position=(0.0, 0.0, i * edge_len), skeleton_id=0)
    for i in range(n_nodes - 1):
        g.add_edge(i, i + 1)
    return g


class TestErlGoldens:
    def test_perfect_erl_equals_max(self):
        g = straight_skeleton(3)  # total length 20
        r = expected_run_length(g, {0: 5, 1: 5, 2: 5})
        assert r["total_skeleton_length"] == pytest.approx(20.0)
        assert r["erl"] == pytest.approx(20.0)
        assert r["max_erl"] == pytest.approx(20.0)
        assert r["nerl"] == pytest.approx(1.0)
        assert r["split_count"] == 0 and r["merge_count"] == 0

    def test_middle_split_erl(self):
        # the split edge's length is lost: one intact run of length 10
        # (nodes 0-1) and a zero-length run (node 2) on a 20-long
        # skeleton -> erl = 10^2 / 20 = 5
        g = straight_skeleton(3)
        r = expected_run_length(g, {0: 5, 1: 5, 2: 6})
        assert r["erl"] == pytest.approx(5.0)
        assert r["nerl"] == pytest.approx(0.25)
        assert r["split_count"] == 1

    def test_merge_zeroes_runs(self):
        # two skeletons sharing one segment id: merged segment's edges
        # are excluded from correct runs entirely (funlib behaviour)
        g = straight_skeleton(2)
        g.add_node(10, position=(100.0, 0.0, 0.0), skeleton_id=1)
        g.add_node(11, position=(100.0, 0.0, 10.0), skeleton_id=1)
        g.add_edge(10, 11)
        r = expected_run_length(g, {0: 5, 1: 5, 10: 5, 11: 5})
        assert r["merge_count"] == 1
        assert r["erl"] == pytest.approx(0.0)

    def test_background_breaks_runs(self):
        # 4 nodes, middle node unlabeled (0): runs of 10 and 10 on a
        # 30-long skeleton -> erl = 200/30
        g = straight_skeleton(4)  # length 30
        r = expected_run_length(g, {0: 5, 1: 5, 2: 0, 3: 7})
        assert r["erl"] == pytest.approx((100 + 0 + 0) / 30, abs=1e-9) or \
            r["erl"] == pytest.approx(100 / 30, abs=1e-9)

    def test_erl_weighted_by_length(self):
        # skeleton A length 30 intact, skeleton B length 10 intact:
        # erl = (30^2 + 10^2) / 40 = 25
        g = straight_skeleton(4)  # A: length 30
        g.add_node(20, position=(50.0, 0.0, 0.0), skeleton_id=1)
        g.add_node(21, position=(50.0, 0.0, 10.0), skeleton_id=1)
        g.add_edge(20, 21)
        r = expected_run_length(
            g, {0: 5, 1: 5, 2: 5, 3: 5, 20: 8, 21: 8}
        )
        assert r["erl"] == pytest.approx((900 + 100) / 40)
        assert r["max_erl"] == pytest.approx((900 + 100) / 40)
