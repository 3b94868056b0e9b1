import numpy as np
import pytest

from bootstrapper_tpu.ops.affinities import (
    affs_mask,
    balance_weights,
    grow_boundary,
    seg_to_affs,
)


def naive_affs(seg, neighborhood):
    """Direct per-voxel reference implementation."""
    seg = np.asarray(seg)
    out = np.zeros((len(neighborhood), *seg.shape), np.float32)
    for k, off in enumerate(neighborhood):
        for idx in np.ndindex(seg.shape):
            pidx = tuple(i + o for i, o in zip(idx, off))
            if all(0 <= p < s for p, s in zip(pidx, seg.shape)):
                a, b = seg[idx], seg[pidx]
                if a == b and a > 0 and b > 0:
                    out[(k, *idx)] = 1.0
    return out


def test_seg_to_affs_golden_2d():
    rng = np.random.default_rng(0)
    seg = rng.integers(0, 4, (9, 9)).astype(np.int32)
    nbhd = [[-1, 0], [0, -1], [-3, 0], [0, -3]]
    got = np.asarray(seg_to_affs(seg, nbhd))
    np.testing.assert_array_equal(got, naive_affs(seg, nbhd))


def test_seg_to_affs_golden_3d():
    rng = np.random.default_rng(1)
    seg = rng.integers(0, 3, (4, 6, 6)).astype(np.int32)
    nbhd = [[-1, 0, 0], [0, -1, 0], [0, 0, -1], [-2, 0, 0], [0, -3, 0]]
    got = np.asarray(seg_to_affs(seg, nbhd))
    np.testing.assert_array_equal(got, naive_affs(seg, nbhd))


def test_seg_to_affs_positive_offsets():
    seg = np.array([[1, 1, 2]], np.int32)
    got = np.asarray(seg_to_affs(seg, [[0, 1]]))
    np.testing.assert_array_equal(got, naive_affs(seg, [[0, 1]]))


def test_affs_mask():
    unlab = np.array([[1, 1, 0], [1, 1, 1]], np.uint8)
    got = np.asarray(affs_mask(unlab, [[0, -1]]))
    # mask requires voxel and its -y partner both labelled & in bounds
    expected = np.array([[[0, 1, 0], [0, 1, 1]]], np.float32)
    np.testing.assert_array_equal(got, expected)


def test_grow_boundary_between_labels():
    seg = np.zeros((1, 7), np.int32)
    seg[0, :3] = 1
    seg[0, 3:] = 2
    out = np.asarray(grow_boundary(seg, steps=1))
    # one voxel on each side of the 1|2 contact becomes 0
    np.testing.assert_array_equal(out[0], [1, 1, 0, 0, 2, 2, 2])


def test_grow_boundary_erodes_into_background():
    seg = np.zeros((5, 5), np.int32)
    seg[1:4, 1:4] = 7
    out = np.asarray(grow_boundary(seg, steps=1))
    assert out[2, 2] == 7
    assert out[1, 1] == 0  # edge of object eroded against background


def test_grow_boundary_only_xy():
    seg = np.zeros((2, 1, 3), np.int32)
    seg[0] = 1
    seg[1] = 2
    out = np.asarray(grow_boundary(seg, steps=1, only_xy=True))
    # contact is along z; xy-only erosion must not touch it
    np.testing.assert_array_equal(out, seg)


def test_grow_boundary_steps():
    seg = np.zeros((1, 10), np.int32)
    seg[0, :5] = 1
    seg[0, 5:] = 2
    out = np.asarray(grow_boundary(seg, steps=2))
    np.testing.assert_array_equal(out[0], [1, 1, 1, 0, 0, 0, 0, 2, 2, 2])


def test_balance_weights_binary():
    t = np.array([1, 1, 1, 0], np.float32)  # p=0.75
    w = np.asarray(balance_weights(t))
    np.testing.assert_allclose(w[0], 1 / (2 * 0.75), rtol=1e-6)
    np.testing.assert_allclose(w[3], 1 / (2 * 0.25), rtol=1e-6)
    # both classes carry equal total weight
    np.testing.assert_allclose(w[t > 0.5].sum(), w[t < 0.5].sum(), rtol=1e-6)


def test_balance_weights_mask_and_clip():
    t = np.ones((4,), np.float32)
    m = np.array([1, 1, 0, 0], np.float32)
    w = np.asarray(balance_weights(t, m))
    assert w[2] == 0 and w[3] == 0
    # p clips at 0.95
    np.testing.assert_allclose(w[0], 1 / (2 * 0.95), rtol=1e-6)


def test_balance_weights_slab():
    t = np.stack([np.array([1, 0, 0, 0]), np.array([1, 1, 1, 0])]).astype(
        np.float32
    )
    w = np.asarray(balance_weights(t, slab_axis=0))
    np.testing.assert_allclose(w[0, 0], 1 / (2 * 0.25), rtol=1e-6)
    np.testing.assert_allclose(w[1, 0], 1 / (2 * 0.75), rtol=1e-6)


def test_grow_boundary_mask_border_does_not_erode():
    """In-mask labels at the labels-mask border must NOT erode against
    the out-of-mask region: masked-out voxels are treated as same-label
    (reference gp/custom_grow_boundary.py:91-96)."""
    seg = np.full((1, 6, 6), 5, np.uint64)
    mask = np.zeros((1, 6, 6), np.uint64)
    mask[:, :, :3] = 1  # right half unlabelled
    out = np.asarray(grow_boundary(seg, steps=1, mask=mask))
    # the whole in-mask object survives (no other label touches it)
    np.testing.assert_array_equal(out[:, :, :3], 5)
    # out-of-mask voxels are never modified
    np.testing.assert_array_equal(out[:, :, 3:], 5)
    # but two labels meeting INSIDE the mask still erode
    seg2 = np.full((1, 6, 6), 5, np.uint64)
    seg2[:, 3:, :] = 8
    out2 = np.asarray(grow_boundary(seg2, steps=1, mask=np.ones_like(mask)))
    assert (out2[:, 2:4, :] == 0).all()
