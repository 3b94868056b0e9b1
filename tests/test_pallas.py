import numpy as np
import pytest
from scipy import ndimage

from bootstrapper_tpu.ops.pallas_kernels import (
    seed_maxima,
    seed_maxima_3d,
    seed_maxima_auto,
)


def _reference_seeds(dist, mask, size):
    mx = ndimage.maximum_filter(dist, size=size)
    return ((dist >= mx) & (mask > 0)).astype(np.uint8)


@pytest.mark.parametrize("size", [2, 3, 7, 10, 11])
def test_seed_maxima_matches_scipy(size):
    """Exact scipy maximum_filter parity, incl. even (asymmetric) sizes."""
    rng = np.random.default_rng(0)
    dist = rng.uniform(size=(64, 128)).astype(np.float32)
    mask = (rng.uniform(size=(64, 128)) > 0.3).astype(np.float32)
    got = np.asarray(seed_maxima(dist, mask, size=size, interpret=True))
    want = _reference_seeds(dist, mask, size)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("size", [3, 10])
def test_seed_maxima_3d_sections(size):
    rng = np.random.default_rng(1)
    dist = rng.uniform(size=(5, 32, 64)).astype(np.float32)
    mask = (rng.uniform(size=(5, 32, 64)) > 0.4).astype(np.float32)
    got = np.asarray(seed_maxima_3d(dist, mask, size=size, interpret=True))
    for z in range(5):
        np.testing.assert_array_equal(
            got[z], _reference_seeds(dist[z], mask[z], size)
        )


def test_seed_maxima_auto_dispatch():
    dist = np.zeros((16, 128), np.float32)
    dist[8, 64] = 1.0
    mask = np.ones_like(dist)
    seeds = np.asarray(seed_maxima_auto(dist, mask, size=7))
    assert seeds[8, 64] == 1
    # plateau of zeros: everything is a "max"; the single peak suppresses
    # only its window
    assert seeds[8, 62:67].sum() == 1


def test_watershed_uses_device_seeds(monkeypatch):
    """The production watershed takes the kernel path (forced interpret
    here) and produces identical fragments to the scipy path."""
    from bootstrapper_tpu.post import fragments as FR

    rng = np.random.default_rng(2)
    affs = rng.uniform(size=(3, 4, 48, 48)).astype(np.float32)

    monkeypatch.setenv("BS_DEVICE_SEEDS", "0")
    f_scipy, n_scipy = FR.watershed_from_affinities(
        affs, fragments_in_xy=True, min_seed_distance=10
    )
    monkeypatch.setenv("BS_DEVICE_SEEDS", "1")
    called = {}
    orig = FR._device_seed_maxima

    def spy(*a, **k):
        out = orig(*a, **k)
        called["maxima"] = out
        return out

    monkeypatch.setattr(FR, "_device_seed_maxima", spy)
    f_dev, n_dev = FR.watershed_from_affinities(
        affs, fragments_in_xy=True, min_seed_distance=10
    )
    assert called["maxima"] is not None  # kernel path actually ran
    assert n_dev == n_scipy
    np.testing.assert_array_equal(f_dev, f_scipy)
