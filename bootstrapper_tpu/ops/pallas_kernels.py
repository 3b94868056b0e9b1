"""Pallas TPU kernels for post-processing preparation ops.

The watershed fragment extractor needs, per 2D section: the boundary
mask (mean affinity > 0.5), its distance transform, and seed points
(local maxima of the max-filtered distance, reference
``bootstrapper/post/ws.py:8-36``).  The seed-detection step is a
windowed max-equality — a perfect VPU pattern: each (8,128)-aligned
tile loads once into VMEM, the window maximum is computed by shifted
``jnp.maximum`` folds (O(log w) for the separable window), and the
equality mask comes out in the same pass, fused with the boundary
threshold.

``seed_maxima`` is the public entry: Pallas on TPU, ``interpret=True``
elsewhere (CPU tests run the same kernel through the interpreter).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shifted_masked(x, s: int, axis: int):
    """x shifted by s along axis; out-of-range entries become -inf."""
    n = x.shape[axis]
    rolled = jnp.roll(x, -s, axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    valid = (idx + s >= 0) & (idx + s < n)
    return jnp.where(valid, rolled, -jnp.inf)


def _window_max_1d(x, radius: int, axis: int):
    """Running max over a (2r+1) window: symmetric shifted-max folds
    with doubling steps (a fold of step s on a radius-t result extends
    coverage to t+s; valid while s <= t+1, which the doubling schedule
    satisfies)."""
    out = x
    shift = 1
    total = 0
    while total < radius:
        step = min(shift, radius - total)
        out = jnp.maximum(
            out,
            jnp.maximum(
                _shifted_masked(out, step, axis),
                _shifted_masked(out, -step, axis),
            ),
        )
        total += step
        shift *= 2
    return out


def _seed_kernel(dist_ref, mask_ref, out_ref, *, radius: int):
    d = dist_ref[:]
    m = mask_ref[:]
    mx = _window_max_1d(d, radius, 0)
    mx = _window_max_1d(mx, radius, 1)
    out_ref[:] = ((d >= mx) & (m > 0)).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def seed_maxima(dist, boundary_mask, radius: int = 5, interpret: bool = False):
    """Seeds = in-mask points that attain the windowed max of ``dist``.

    dist: (H, W) float32; boundary_mask: (H, W) {0,1}. Returns uint8.
    """
    H, W = dist.shape
    kernel = functools.partial(_seed_kernel, radius=radius)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.uint8),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            memory_space=pltpu.ANY if interpret else pltpu.VMEM
        ),
        interpret=interpret,
    )(dist.astype(jnp.float32), boundary_mask.astype(jnp.float32))


def seed_maxima_auto(dist, boundary_mask, radius: int = 5):
    """Backend-dispatching wrapper: compiled Pallas on TPU, interpreter
    elsewhere."""
    on_tpu = jax.default_backend() in ("tpu", "axon")
    return seed_maxima(
        jnp.asarray(dist),
        jnp.asarray(boundary_mask),
        radius=radius,
        interpret=not on_tpu,
    )
