import numpy as np
import pytest

from bootstrapper_tpu.ops.lsd import (
    gaussian_kernel,
    lsd_descriptors,
    lsd_descriptors_2d_stack,
    lsd_descriptors_downsampled,
)


def naive_lsds_2d(seg, sigma, truncate=3.0):
    """Direct windowed reference implementation (2D, voxel_size=1)."""
    seg = np.asarray(seg)
    radius = max(1, int(truncate * sigma + 0.5))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    g1 = np.exp(-0.5 * (x / sigma) ** 2)
    g1 /= g1.sum()
    out = np.zeros((6, *seg.shape))
    H, W = seg.shape
    for i in range(H):
        for j in range(W):
            L = seg[i, j]
            if L == 0:
                continue
            cnt = m = 0.0
            s1 = np.zeros(2)
            s2 = np.zeros((2, 2))
            for di in range(-radius, radius + 1):
                for dj in range(-radius, radius + 1):
                    u, v = i + di, j + dj
                    if not (0 <= u < H and 0 <= v < W):
                        continue
                    if seg[u, v] != L:
                        continue
                    w = g1[di + radius] * g1[dj + radius]
                    cnt += w
                    s1 += w * np.array([di, dj])
                    s2 += w * np.outer([di, dj], [di, dj])
            mean = s1 / cnt
            cov = s2 / cnt - np.outer(mean, mean)
            var = np.maximum(np.diag(cov), 0)
            pear = np.clip(
                cov[0, 1] / (np.sqrt(var[0] * var[1]) + 1e-6), -1, 1
            )
            out[0, i, j] = np.clip(mean[0] / sigma, -1, 1) * 0.5 + 0.5
            out[1, i, j] = np.clip(mean[1] / sigma, -1, 1) * 0.5 + 0.5
            out[2, i, j] = np.clip(var[0] / sigma**2, 0, 1)
            out[3, i, j] = np.clip(var[1] / sigma**2, 0, 1)
            out[4, i, j] = pear * 0.5 + 0.5
            out[5, i, j] = np.clip(cnt, 0, 1)
    return out


def test_gaussian_kernel_properties():
    g = gaussian_kernel(2.0, 0)
    assert g.sum() == pytest.approx(1.0, abs=1e-6)
    g1 = gaussian_kernel(2.0, 1)
    assert g1.sum() == pytest.approx(0.0, abs=1e-6)  # odd moment
    assert (g1[: len(g1) // 2] < 0).all()  # negative side


def test_lsd_golden_2d():
    rng = np.random.default_rng(0)
    seg = np.zeros((12, 12), np.int32)
    seg[2:9, 1:6] = 1
    seg[3:10, 7:11] = 2
    got = np.asarray(lsd_descriptors(seg, sigma=2.0, max_labels=4))
    want = naive_lsds_2d(seg, 2.0)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_lsd_background_zero():
    seg = np.zeros((8, 8), np.int32)
    seg[0:3, 0:3] = 1
    d = np.asarray(lsd_descriptors(seg, sigma=2.0, max_labels=2))
    assert (d[:, seg == 0] == 0).all()
    assert (d[:, seg > 0] != 0).any()


def test_lsd_offset_points_inward():
    # voxel at the right edge of a segment: mean offset in y is negative
    seg = np.zeros((9, 9), np.int32)
    seg[2:7, 2:7] = 1
    d = np.asarray(lsd_descriptors(seg, sigma=2.0, max_labels=2))
    # channel 1 = offset along axis1; at left edge offset>0.5, right <0.5
    assert d[1, 4, 2] > 0.5
    assert d[1, 4, 6] < 0.5
    # centre voxel: symmetric, offset ~0.5
    assert d[0, 4, 4] == pytest.approx(0.5, abs=0.02)
    assert d[1, 4, 4] == pytest.approx(0.5, abs=0.02)


def test_lsd_3d_shape_and_channels():
    rng = np.random.default_rng(2)
    seg = rng.integers(0, 5, (6, 10, 10)).astype(np.int32)
    d = np.asarray(
        lsd_descriptors(seg, sigma=3.0, voxel_size=(2, 1, 1), max_labels=8)
    )
    assert d.shape == (10, 6, 10, 10)
    assert d.min() >= 0.0 and d.max() <= 1.0


def test_lsd_downsampled_close_to_full():
    seg = np.zeros((16, 16), np.int32)
    seg[4:13, 3:14] = 1
    full = np.asarray(lsd_descriptors(seg, sigma=4.0, max_labels=2))
    ds = np.asarray(
        lsd_descriptors_downsampled(seg, sigma=4.0, downsample=2, max_labels=2)
    )
    assert ds.shape == full.shape
    inner = (slice(None), slice(6, 11), slice(6, 11))
    assert np.abs(ds[inner] - full[inner]).mean() < 0.1


def test_lsd_2d_stack():
    seg = np.zeros((3, 10, 10), np.int32)
    seg[:, 2:8, 2:8] = 1
    d = np.asarray(lsd_descriptors_2d_stack(seg, sigma=2.0, max_labels=2))
    assert d.shape == (6, 3, 10, 10)
    # each slice identical labels -> identical descriptors
    np.testing.assert_allclose(d[:, 0], d[:, 1], atol=1e-5)
