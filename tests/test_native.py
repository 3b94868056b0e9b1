import numpy as np
import pytest

from bootstrapper_tpu import native


def test_builds_and_loads():
    lib = native.get_lib()
    assert lib is not None


def test_connected_components_edges():
    # 0-1 close, 2-3 close, 1-2 far
    labels = native.connected_components_edges(
        4, [0, 1, 2], [1, 2, 3], [0.1, 0.9, 0.2], threshold=0.5
    )
    assert labels[0] == labels[1]
    assert labels[2] == labels[3]
    assert labels[0] != labels[2]


def test_cc_from_hard_affs():
    Z, Y, X = 2, 4, 4
    hard = np.zeros((3, Z, Y, X), np.uint8)
    # connect a 2x2 square in plane z=0 via y/x affinities
    hard[1, 0, 0, 0] = 1  # links (0,0,0)-(0,1,0)
    hard[2, 0, 0, 0] = 1  # links (0,0,0)-(0,0,1)
    hard[2, 0, 1, 0] = 1
    out = native.cc_from_hard_affs(hard)
    assert out[0, 0, 0] == out[0, 1, 0] == out[0, 0, 1] == out[0, 1, 1]
    assert out[1].sum() == 0  # z=1 has no affinities -> background
    assert out[0, 3, 3] == 0


def test_watershed_seeded_splits_at_ridge():
    land = np.zeros((1, 5, 11), np.float32)
    land[0, :, 5] = 10.0  # high ridge in the middle
    seeds = np.zeros((1, 5, 11), np.uint64)
    seeds[0, 2, 1] = 1
    seeds[0, 2, 9] = 2
    out = native.watershed_seeded(land, seeds)
    assert (out[0, :, :5] == 1).all()
    assert (out[0, :, 6:] == 2).all()
    assert set(np.unique(out[0, :, 5])) <= {1, 2}


def test_watershed_respects_mask():
    land = np.zeros((1, 3, 5), np.float32)
    seeds = np.zeros((1, 3, 5), np.uint64)
    seeds[0, 1, 0] = 1
    mask = np.ones((1, 3, 5), np.uint8)
    mask[0, :, 3:] = 0
    out = native.watershed_seeded(land, seeds, mask)
    assert (out[0, :, :3] == 1).all()
    assert (out[0, :, 3:] == 0).all()


def test_mutex_watershed_basic():
    # 4 nodes in a line; strong attraction 0-1 and 2-3, strong repulsion 1-2
    labels = native.mutex_watershed_edges(
        4,
        [0, 1, 2],
        [1, 2, 3],
        [0.9, -0.8, 0.7],
    )
    assert labels[0] == labels[1]
    assert labels[2] == labels[3]
    assert labels[1] != labels[2]


def test_mutex_watershed_mutex_blocks_merge():
    # repulsion installed first (|w| largest) prevents later attraction
    labels = native.mutex_watershed_edges(
        2, [0, 0], [1, 1], [-0.9, 0.5]
    )
    assert labels[0] != labels[1]
    # attraction first wins instead
    labels = native.mutex_watershed_edges(
        2, [0, 0], [1, 1], [-0.5, 0.9]
    )
    assert labels[0] == labels[1]


def _two_fragment_volume(boundary_aff):
    frags = np.zeros((1, 4, 8), np.uint64)
    frags[0, :, :4] = 101
    frags[0, :, 4:] = 202
    affs = np.ones((3, 1, 4, 8), np.float32)
    # x-affinity linking column 3 to 4 (stored at the farther voxel, x=4)
    affs[2, 0, :, 4] = boundary_aff
    return frags, affs


def test_agglomerate_merges_strong_boundary():
    frags, affs = _two_fragment_volume(0.9)
    eu, ev, es, merges = native.agglomerate(frags, affs, threshold=0.5)
    assert len(eu) == 1
    assert {int(eu[0]), int(ev[0])} == {101, 202}
    assert es[0] == pytest.approx(0.1, abs=0.02)
    assert len(merges) == 1


def test_agglomerate_keeps_weak_boundary():
    frags, affs = _two_fragment_volume(0.1)
    eu, ev, es, merges = native.agglomerate(frags, affs, threshold=0.5)
    assert len(eu) == 1
    assert es[0] == 2.0  # never merged below threshold
    assert len(merges) == 0


def test_agglomerate_chain_scores():
    """Three fragments A-B (strong), B-C (weak): A-B merges at low score,
    the A/B-C edges carry the later merge score."""
    frags = np.zeros((1, 2, 9), np.uint64)
    frags[0, :, :3] = 1
    frags[0, :, 3:6] = 2
    frags[0, :, 6:] = 3
    affs = np.ones((3, 1, 2, 9), np.float32)
    affs[2, 0, :, 3] = 0.9  # 1-2 boundary
    affs[2, 0, :, 6] = 0.6  # 2-3 boundary
    eu, ev, es, merges = native.agglomerate(frags, affs, threshold=1.0)
    pairs = {frozenset((int(a), int(b))): s for a, b, s in zip(eu, ev, es)}
    assert pairs[frozenset((1, 2))] == pytest.approx(0.1, abs=0.02)
    assert pairs[frozenset((2, 3))] == pytest.approx(0.4, abs=0.02)
    assert len(merges) == 2
    assert merges[0, 2] < merges[1, 2]


def test_agglomerate_hist_quantile():
    frags, affs = _two_fragment_volume(0.8)
    # quantile scoring uses the affinity distribution on the boundary
    eu, ev, es, merges = native.agglomerate(
        frags, affs, threshold=1.0, merge_function="hist_quant_50"
    )
    assert len(eu) == 1
    assert es[0] == pytest.approx(0.2, abs=0.05)


def test_replace_values():
    arr = np.array([[1, 2], [3, 99]], np.uint64)
    out = native.replace_values(arr, [1, 2, 3], [10, 20, 30])
    np.testing.assert_array_equal(out, [[10, 20], [30, 99]])


def test_mutex_watershed_dense_matches_edge_list_path():
    """Noise/strides off: the one-pass native path must reproduce the
    edge-list path (same generation order, weights, and clustering) —
    including the np.unique-style 1..K densification."""
    from bootstrapper_tpu.post.fragments import _grid_edges

    rng = np.random.default_rng(7)
    shape = (5, 16, 16)
    nb = [[-1, 0, 0], [0, -1, 0], [0, 0, -1], [0, -4, 0], [0, 0, -4]]
    bias = [-0.2, -0.2, -0.2, -0.6, -0.6]
    affs = rng.random((5,) + shape, dtype=np.float32)

    u, v, c = _grid_edges(shape, nb, None, False, rng)
    ew = affs.reshape(5, -1)[c, u].astype(np.float64) + np.asarray(bias)[c]
    labels = native.mutex_watershed_edges(int(np.prod(shape)), u, v, ew)
    uniq, dense = np.unique(labels.reshape(shape), return_inverse=True)
    ref = (dense.reshape(shape) + 1).astype(np.uint64)

    out, k = native.mutex_watershed_dense(
        affs, nb, bias, [[1, 1, 1]] * 5, [0] * 5, 0.0, 0
    )
    np.testing.assert_array_equal(out, ref)
    assert k == len(uniq)


def test_mutex_watershed_dense_rng_determinism():
    """Noise and randomized strides are counter-based: same seed ->
    identical labels across calls, different seed -> different draws."""
    rng = np.random.default_rng(1)
    affs = rng.random((4, 4, 12, 12), dtype=np.float32)
    nb = [[-1, 0, 0], [0, -1, 0], [0, 0, -1], [0, 0, -4]]
    bias = [-0.3] * 3 + [-0.5]
    st = [[1, 1, 1]] * 3 + [[1, 2, 2]]
    rd = [0, 0, 0, 1]
    a1, _ = native.mutex_watershed_dense(affs, nb, bias, st, rd, 0.01, 42)
    a2, _ = native.mutex_watershed_dense(affs, nb, bias, st, rd, 0.01, 42)
    b1, _ = native.mutex_watershed_dense(affs, nb, bias, st, rd, 0.01, 43)
    np.testing.assert_array_equal(a1, a2)
    assert not np.array_equal(a1, b1)
