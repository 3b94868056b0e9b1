import jax
import numpy as np
import pytest
from scipy import ndimage

from bootstrapper_tpu.ops.pallas_kernels import seed_maxima, seed_maxima_auto


def _reference_seeds(dist, mask, radius):
    mx = ndimage.maximum_filter(dist, size=2 * radius + 1)
    return ((dist >= mx) & (mask > 0)).astype(np.uint8)


@pytest.mark.parametrize("radius", [1, 3, 5, 10])
def test_seed_maxima_matches_scipy(radius):
    rng = np.random.default_rng(0)
    dist = rng.uniform(size=(64, 128)).astype(np.float32)
    mask = (rng.uniform(size=(64, 128)) > 0.3).astype(np.float32)
    got = np.asarray(seed_maxima(dist, mask, radius=radius, interpret=True))
    want = _reference_seeds(dist, mask, radius)
    np.testing.assert_array_equal(got, want)


def test_seed_maxima_auto_dispatch():
    dist = np.zeros((16, 128), np.float32)
    dist[8, 64] = 1.0
    mask = np.ones_like(dist)
    seeds = np.asarray(seed_maxima_auto(dist, mask, radius=3))
    assert seeds[8, 64] == 1
    # plateau of zeros: everything is a "max"; the single peak suppresses
    # only its window
    assert seeds[8, 62:67].sum() == 1
