"""Synthetic EM-like volume for the example round (no-egress fallback).

Renders a random 3D instance segmentation (the same generator the
refiner models train on) into an EM-like raw image: dark membranes at
label boundaries, intensity texture inside objects, section noise.
"""

import os
import sys

import numpy as np
from scipy import ndimage

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)


def synthetic_em(shape=(64, 512, 512), seed=7, sigma=9.7):
    """``sigma`` pins the object scale (seed spacing of the Voronoi
    labels): the default reproduces the object statistics of the
    validated 48x512x512 system-test regime (~16k voxels/object) at any
    volume size. Before create_labels drew its parameters
    shape-independently, a (125,1250,1250) volume from the same seed
    landed on sigma 4.3 — 8x smaller objects, an unrealistically hard
    boundary density no sparse-label first link could learn."""
    from bootstrapper_tpu.train.synth import create_labels

    rng = np.random.default_rng(seed)
    labels = create_labels(
        rng, shape=shape, mode="random", p_blackout=0.0,
        anisotropy_range=(4, 5), sigma=sigma,
    )

    # membranes: boundary voxels between labels (xy only, EM-style)
    boundary = np.zeros(shape, bool)
    for ax in (1, 2):
        sl_a = [slice(None)] * 3
        sl_b = [slice(None)] * 3
        sl_a[ax] = slice(1, None)
        sl_b[ax] = slice(None, -1)
        diff = labels[tuple(sl_a)] != labels[tuple(sl_b)]
        boundary[tuple(sl_a)] |= diff
        boundary[tuple(sl_b)] |= diff
    boundary = ndimage.binary_dilation(
        boundary, np.ones((1, 2, 2), bool)
    )

    raw = rng.normal(170, 20, shape)
    texture = ndimage.gaussian_filter(rng.normal(0, 30, shape), (0, 3, 3))
    raw += texture
    raw[boundary] = rng.normal(60, 15, int(boundary.sum()))
    raw = ndimage.gaussian_filter(raw, (0, 0.8, 0.8))
    raw = np.clip(raw, 0, 255).astype(np.uint8)
    return raw, labels.astype(np.uint64)


if __name__ == "__main__":
    raw, labels = synthetic_em()
    print(raw.shape, labels.max())
