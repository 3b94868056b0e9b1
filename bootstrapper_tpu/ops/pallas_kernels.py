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

Windows replicate ``scipy.ndimage.maximum_filter(x, size)`` exactly,
including the asymmetric [-size//2, size-1-size//2] support for even
sizes, so the production watershed can swap backends without changing
fragments.

``seed_maxima`` (2D) and ``seed_maxima_3d`` (one grid step per section)
are the public entries: Pallas on TPU, ``interpret=True`` elsewhere
(CPU tests run the same kernels through the interpreter).
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


def _directional_max(x, reach: int, axis: int, sign: int):
    """Running max over offsets sign*[0..reach]: shifted-max folds with
    doubling steps (a fold of step s on a reach-t result extends
    coverage to t+s; valid while s <= t+1, which doubling satisfies)."""
    out = x
    covered = 0
    shift = 1
    while covered < reach:
        step = min(shift, covered + 1, reach - covered)
        out = jnp.maximum(out, _shifted_masked(out, sign * step, axis))
        covered += step
        shift *= 2
    return out


def _window_max_1d(x, left: int, right: int, axis: int):
    """Max over the window [-left, +right] along axis (scipy
    maximum_filter support: left = size//2, right = size-1-size//2)."""
    fwd = _directional_max(x, right, axis, 1)
    bwd = _directional_max(x, left, axis, -1)
    return jnp.maximum(fwd, bwd)


def _window_lr(size: int):
    return size // 2, size - 1 - size // 2


def _seed_kernel(dist_ref, mask_ref, out_ref, *, size: int):
    d = dist_ref[:]
    m = mask_ref[:]
    left, right = _window_lr(size)
    mx = _window_max_1d(d, left, right, d.ndim - 2)
    mx = _window_max_1d(mx, left, right, d.ndim - 1)
    out_ref[:] = ((d >= mx) & (m > 0)).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("size", "interpret"))
def seed_maxima(dist, boundary_mask, size: int = 10, interpret: bool = False):
    """Seeds = in-mask points that attain the scipy-style windowed max
    of ``dist``.  dist: (H, W) float32; boundary_mask: (H, W) {0,1}."""
    H, W = dist.shape
    kernel = functools.partial(_seed_kernel, size=size)
    space = pl.ANY if interpret else pltpu.VMEM
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.uint8),
        in_specs=[
            pl.BlockSpec(memory_space=space),
            pl.BlockSpec(memory_space=space),
        ],
        out_specs=pl.BlockSpec(memory_space=space),
        interpret=interpret,
    )(dist.astype(jnp.float32), boundary_mask.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("size", "interpret"))
def seed_maxima_3d(
    dist, boundary_mask, size: int = 10, interpret: bool = False
):
    """Per-section seed detection for a whole (Z, H, W) volume in one
    device call: the Pallas grid iterates sections, each section's tile
    resident in VMEM (the production ``fragments_in_xy`` path)."""
    Z, H, W = dist.shape
    kernel = functools.partial(_seed_kernel, size=size)
    space = pl.ANY if interpret else pltpu.VMEM
    spec = pl.BlockSpec(
        (1, H, W), lambda z: (z, 0, 0), memory_space=space
    )
    return pl.pallas_call(
        kernel,
        grid=(Z,),
        out_shape=jax.ShapeDtypeStruct((Z, H, W), jnp.uint8),
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(dist.astype(jnp.float32), boundary_mask.astype(jnp.float32))


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def seed_maxima_auto(dist, boundary_mask, size: int = 10):
    """Backend-dispatching wrapper: compiled Pallas on TPU, interpreter
    elsewhere."""
    fn = seed_maxima_3d if np.ndim(dist) == 3 else seed_maxima
    return fn(
        jnp.asarray(dist),
        jnp.asarray(boundary_mask),
        size=size,
        interpret=not _on_tpu(),
    )
