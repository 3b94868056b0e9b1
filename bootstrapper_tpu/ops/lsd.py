"""Local shape descriptors (LSDs) as separable Gaussian moment convolutions.

Capability parity with the ``lsd`` package's ``LsdExtractor`` that the
reference uses for its ``*lsd*`` model targets (reference
``bootstrapper/gp/add_2d_lsds.py:4-131``; setups declare ``sigma`` and
``downsample`` in ``net_config.json``), re-derived for TPU:

For voxel ``v`` with label ``L``, the Gaussian-weighted statistics of the
same-label mask are, with ``m(u) = [seg(u) == L]`` and centred Gaussian
``g``:

    count(v)     = sum_u g(u-v) m(u)
    offset_d(v)  = sum_u g(u-v) (u_d - v_d) m(u) / count
    cov_de(v)    = sum_u g(u-v) (u_d-v_d)(u_e-v_e) m(u) / count
                   - offset_d offset_e

Every sum is a *correlation with a moment kernel* ``g(x) x_d^a x_e^b``
(a+b <= 2), and each such kernel is separable into per-axis 1D kernels
drawn from {g, g*x, g*x^2}.  So the whole descriptor stack is a chain of
1D convolutions over a one-hot label tensor — static shapes, fully
fused by XLA, MXU/VPU friendly — followed by a per-voxel gather of each
voxel's own label channel.

Descriptor layout (channels-first, like the reference's conventions):

- 3D (10): mean offset z,y,x | variance z,y,x | Pearson zy,zx,yx | size
- 2D (6):  mean offset y,x   | variance y,x   | Pearson yx        | size

Normalisation to [0,1]: offsets are scaled by 1/sigma_d and clipped to
[-1,1] then mapped to [0,1]; variances scaled by 1/sigma_d^2 and clipped;
Pearson coefficients mapped from [-1,1]; size is the covered fraction of
the Gaussian mass.  (Our own fixed convention — numeric parity with the
C-extension ``lsd`` package is not a goal; self-consistency between
training targets and error maps is.)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel(sigma_vox: float, order: int, truncate: float = 3.0):
    """1D moment kernel g(x)*x^order, x in voxel units, numpy (static)."""
    radius = max(1, int(truncate * sigma_vox + 0.5))
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    g = np.exp(-0.5 * (x / sigma_vox) ** 2)
    g /= g.sum()
    return (g * x**order).astype(np.float32)


def _conv1d_along(x, kernel, axis):
    """'SAME' 1D correlation along ``axis`` of an ND array."""
    x = jnp.moveaxis(x, axis, -1)
    shape = x.shape
    flat = x.reshape(-1, shape[-1], 1)
    # lax.conv_general_dilated is cross-correlation already: no flip
    k = jnp.asarray(kernel, x.dtype).reshape(-1, 1, 1)
    pad = (len(kernel) // 2, len(kernel) - 1 - len(kernel) // 2)
    out = jax.lax.conv_general_dilated(
        flat, k, (1,), [pad], dimension_numbers=("NHC", "HIO", "NHC")
    )
    return jnp.moveaxis(out.reshape(shape), -1, axis)


def _moment_exponents(dims: int):
    """Ordered exponent tuples: count, first moments, diag second, cross."""
    first = [tuple(1 if i == d else 0 for i in range(dims)) for d in range(dims)]
    diag = [tuple(2 if i == d else 0 for i in range(dims)) for d in range(dims)]
    cross = []
    for d in range(dims):
        for e in range(d + 1, dims):
            cross.append(
                tuple(1 if i in (d, e) else 0 for i in range(dims))
            )
    return [tuple([0] * dims)] + first + diag + cross


def _blur_moments(masks, sigmas_vox):
    """All <=2nd-order Gaussian moments of each channel of ``masks``.

    masks: (K, *spatial) float; returns dict[exponents] -> (K, *spatial).
    Shares 1D passes down the separable chain: axis 0 first with each
    needed order, then axis 1, ... so each moment costs dims 1D convs and
    common prefixes are computed once.
    """
    dims = masks.ndim - 1
    wanted = _moment_exponents(dims)
    partial_results = {(): masks}
    for d in range(dims):
        next_results = {}
        orders_needed = {}
        for expts in wanted:
            prefix = expts[: d + 1]
            orders_needed.setdefault(prefix[:-1], set()).add(prefix[-1])
        for prefix, orders in orders_needed.items():
            base = partial_results[prefix]
            for o in orders:
                k = gaussian_kernel(sigmas_vox[d], o)
                next_results[prefix + (o,)] = _conv1d_along(base, k, d + 1)
        partial_results = next_results
    return {e: partial_results[e] for e in wanted}


def lsd_descriptors(
    seg,
    sigma,
    voxel_size=None,
    max_labels: int = 64,
    dtype=jnp.float32,
):
    """LSDs of a label volume. seg: int (*spatial) with ids in [0, max_labels);
    0 is background. sigma: world units (scalar or per-dim); voxel_size
    defaults to 1s. Returns (C, *spatial) float in [0,1]."""
    seg = jnp.asarray(seg)
    dims = seg.ndim
    if np.isscalar(sigma):
        sigma = (float(sigma),) * dims
    voxel_size = tuple(voxel_size) if voxel_size is not None else (1.0,) * dims
    sigmas_vox = [s / v for s, v in zip(sigma, voxel_size)]

    # ids beyond max_labels merge into the last channel: out-of-range
    # gather indices are UNDEFINED on TPU (garbage/NaN reads; CPU merely
    # clamps), so the clamp must happen here, not just host-side
    seg = jnp.minimum(seg, max_labels - 1)

    # one-hot masks per label id (skip background channel 0 later)
    onehot = jax.nn.one_hot(seg, max_labels, axis=0, dtype=dtype)
    moments = _blur_moments(onehot, sigmas_vox)

    # gather this voxel's own label channel for every moment
    def pick(m):
        return jnp.take_along_axis(m, seg[None], axis=0)[0]

    expts = _moment_exponents(dims)
    count = jnp.maximum(pick(moments[expts[0]]), 1e-6)
    first = [pick(moments[e]) / count for e in expts[1 : 1 + dims]]
    diag = [
        pick(moments[e]) / count for e in expts[1 + dims : 1 + 2 * dims]
    ]
    cross = [pick(moments[e]) / count for e in expts[1 + 2 * dims :]]

    # voxel units -> world units
    first = [f * voxel_size[d] for d, f in enumerate(first)]
    diag = [s2 * voxel_size[d] ** 2 for d, s2 in enumerate(diag)]
    cross_pairs = [(d, e) for d in range(dims) for e in range(d + 1, dims)]
    cross = [
        c * voxel_size[d] * voxel_size[e]
        for (d, e), c in zip(cross_pairs, cross)
    ]

    variances = [jnp.maximum(s2 - f * f, 0.0) for f, s2 in zip(first, diag)]
    pearsons = []
    for (d, e), c in zip(cross_pairs, cross):
        cov = c - first[d] * first[e]
        denom = jnp.sqrt(variances[d] * variances[e]) + 1e-6
        pearsons.append(jnp.clip(cov / denom, -1.0, 1.0))

    # normalise
    channels = []
    for d in range(dims):
        channels.append(
            jnp.clip(first[d] / sigma[d], -1.0, 1.0) * 0.5 + 0.5
        )
    for d in range(dims):
        channels.append(jnp.clip(variances[d] / sigma[d] ** 2, 0.0, 1.0))
    for p in pearsons:
        channels.append(p * 0.5 + 0.5)
    channels.append(jnp.clip(count, 0.0, 1.0))

    out = jnp.stack(channels)
    return jnp.where(seg[None] > 0, out, 0.0)


def lsd_descriptors_downsampled(
    seg, sigma, voxel_size=None, downsample: int = 1, **kw
):
    """Compute LSDs on a strided grid and nearest-upsample back (the
    reference setups use ``downsample: 2`` for speed; same trade here)."""
    seg = jnp.asarray(seg)
    dims = seg.ndim
    if downsample == 1:
        return lsd_descriptors(seg, sigma, voxel_size, **kw)
    ds = (1,) + (downsample,) * (dims - 1) if dims == 3 else (downsample,) * dims
    voxel_size = tuple(voxel_size) if voxel_size is not None else (1.0,) * dims
    vs_ds = tuple(v * d for v, d in zip(voxel_size, ds))
    sub = seg[tuple(slice(None, None, d) for d in ds)]
    desc = lsd_descriptors(sub, sigma, vs_ds, **kw)
    for ax, d in enumerate(ds):
        if d > 1:
            desc = jnp.repeat(desc, d, axis=1 + ax)
    return desc[
        (slice(None),) + tuple(slice(0, s) for s in seg.shape)
    ]


def lsd_descriptors_2d_stack(seg3d, sigma, voxel_size_yx=None, **kw):
    """Per-z-slice 2D LSDs of a 3D label volume, stacked: (6, Z, Y, X)
    (the reference's Add2DLSDs behaviour, ``gp/add_2d_lsds.py:8-131``)."""
    fn = partial(lsd_descriptors, sigma=sigma, voxel_size=voxel_size_yx, **kw)
    return jnp.moveaxis(jax.vmap(fn)(jnp.asarray(seg3d)), 0, 1)


def calc_max_padding(output_size, voxel_size, sigma, mode: str = "shrink"):
    """Max upstream context needed for LSD targets: 3*sigma plus the xy
    diagonal half, snapped to the voxel grid (the reference's padding
    helper, ``bootstrapper/gp/calc_max_padding.py:5-30``)."""
    from ..core.geometry import Coordinate, Roi

    voxel_size = Coordinate(voxel_size)
    method_padding = Coordinate((0, 3 * sigma, 3 * sigma))
    diag = np.sqrt(output_size[1] ** 2 + output_size[2] ** 2)
    max_padding = Roi(
        (Coordinate([i // 2 for i in [output_size[0], diag, diag]])
         + method_padding),
        (0,) * 3,
    ).snap_to_grid(voxel_size, mode=mode)
    return max_padding.begin
