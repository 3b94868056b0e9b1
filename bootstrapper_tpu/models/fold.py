"""Space-to-depth (xy 2x2 fold) re-expression of full-resolution U-Net
levels.

The first U-Net level runs at full resolution with tiny channel counts
(1 -> 12 -> 12 for the image nets), which starves the TPU's 128-wide
vector lanes and makes XLA pick layouts that are mostly padding (the
HBM-OOM ceiling documented in BASELINE.md).  Folding each 2x2 xy block
into channels re-expresses the same math with 4x the channels and a
quarter the spatial positions:

- a stride-1 valid conv with odd xy kernel k becomes a valid conv with
  xy kernel ``k//2+1`` over 4x in/out channels (each output phase gathers
  from the input phases that its taps land on);
- the (1,2,2) max-pool becomes a max over the 4 phase channel groups --
  no spatial reduce at all;
- centre crops become folded slices, with a phase swap when the crop
  offset is odd.

All transforms are exact: same parameters, bit-identical math module
floating-point reassociation.  Used by ``unet_apply`` for level 0 when
``UNetConfig.fold_xy`` is on (reference behaviour baseline:
``bootstrapper/models/3d_affs/unet.py:440-478``; this file has no
reference counterpart -- it is a TPU-specific optimisation).

Layout: a folded array has shape (N, D, H/2, W/2, 4*C) with phase-major
channels: folded[..., (py*2+px)*C + c] == original[..., 2i+py, 2j+px, c].
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .unet import _ACTIVATIONS, _dim_numbers


def can_fold_kernel(kernel: Sequence[int]) -> bool:
    """xy taps must be odd (1 or 3 in all shipped configs)."""
    return len(kernel) == 3 and kernel[1] % 2 == 1 and kernel[2] % 2 == 1


def fold(x):
    """(N, D, H, W, C) -> (N, D, H/2, W/2, 4C), H and W even."""
    n, d, h, w, c = x.shape
    v = x.reshape(n, d, h // 2, 2, w // 2, 2, c)
    return v.transpose(0, 1, 2, 4, 3, 5, 6).reshape(n, d, h // 2, w // 2, 4 * c)


def unfold(xf):
    """(N, D, Hf, Wf, 4C) -> (N, D, 2*Hf, 2*Wf, C)."""
    n, d, hf, wf, c4 = xf.shape
    c = c4 // 4
    v = xf.reshape(n, d, hf, wf, 2, 2, c)
    return v.transpose(0, 1, 2, 4, 3, 5, 6).reshape(n, d, 2 * hf, 2 * wf, c)


def fold_conv_weights(w, b):
    """Transform (kz, ky, kx, ci, co) valid-conv weights into their folded
    equivalent (kz, ky//2+1, kx//2+1, 4*ci, 4*co); bias tiles phase-major."""
    kz, ky, kx, ci, co = w.shape
    qy_n, qx_n = ky // 2 + 1, kx // 2 + 1
    wf = jnp.zeros((kz, qy_n, qx_n, 4, ci, 4, co), w.dtype)
    for py in range(2):
        for px in range(2):
            for iy in range(ky):
                qy, ry = divmod(py + iy, 2)
                for ix in range(kx):
                    qx, rx = divmod(px + ix, 2)
                    wf = wf.at[:, qy, qx, ry * 2 + rx, :, py * 2 + px, :].set(
                        w[:, iy, ix]
                    )
    wf = wf.reshape(kz, qy_n, qx_n, 4 * ci, 4 * co)
    bf = jnp.tile(b, 4)
    return wf, bf


def folded_conv(xf, w, b, *, compute_dtype=jnp.bfloat16):
    """Valid conv on a folded array using ORIGINAL (unfolded) weights."""
    wf, bf = fold_conv_weights(w, b)
    y = jax.lax.conv_general_dilated(
        xf.astype(compute_dtype),
        wf.astype(compute_dtype),
        window_strides=(1, 1, 1),
        padding="VALID",
        dimension_numbers=_dim_numbers(3),
    )
    return y + bf.astype(compute_dtype)


def folded_conv_split(xfs, w, b, *, compute_dtype=jnp.bfloat16):
    """Folded conv over an implicit channel concat of folded arrays:
    original weights are split by each input's (unfolded) channel count,
    folded separately, and the partial convs summed — the wide folded
    concat is never materialised."""
    off = 0
    y = None
    for xf in xfs:
        c = xf.shape[-1] // 4
        wf, _ = fold_conv_weights(w[..., off : off + c, :], b)
        part = jax.lax.conv_general_dilated(
            xf.astype(compute_dtype),
            wf.astype(compute_dtype),
            window_strides=(1, 1, 1),
            padding="VALID",
            dimension_numbers=_dim_numbers(3),
        )
        y = part if y is None else y + part
        off += c
    return y + jnp.tile(b, 4).astype(compute_dtype)


def folded_spatial(xf) -> tuple:
    """Original (D, H, W) spatial extent represented by a folded array."""
    return (xf.shape[1], xf.shape[2] * 2, xf.shape[3] * 2)


def folded_crop(xf, target: Sequence[int], offsets: Sequence[int]):
    """Crop a folded array by ORIGINAL-coordinate offsets/target sizes.

    target y/x must be even; odd offsets swap phase groups (handled by
    per-phase shifted slices)."""
    n, _, hf, wf, c4 = xf.shape
    c = c4 // 4
    tz, ty, tx = target
    oz, oy, ox = offsets
    assert ty % 2 == 0 and tx % 2 == 0, (target,)
    xz = xf[:, oz : oz + tz]
    if oy % 2 == 0 and ox % 2 == 0:
        return xz[:, :, oy // 2 : (oy + ty) // 2, ox // 2 : (ox + tx) // 2, :]
    v = xz.reshape(n, tz, hf, wf, 2, 2, c)
    phases = []
    for py in range(2):
        ay, sy = divmod(oy + py, 2)
        for px in range(2):
            ax, sx = divmod(ox + px, 2)
            phases.append(
                v[:, :, ay : ay + ty // 2, ax : ax + tx // 2, sy, sx, :]
            )
    out = jnp.stack(phases, axis=-2)
    return out.reshape(n, tz, ty // 2, tx // 2, 4 * c)


def folded_center_crop(xf, target: Sequence[int]):
    spatial = folded_spatial(xf)
    offsets = [(s - t) // 2 for s, t in zip(spatial, target)]
    return folded_crop(xf, target, offsets)


def folded_phase_max(xf):
    """(1,2,2) max-pool of the original array == max over phase groups;
    returns an UNFOLDED half-resolution array (N, D, H/2, W/2, C)."""
    n, d, hf, wf, c4 = xf.shape
    c = c4 // 4
    return xf.reshape(n, d, hf, wf, 4, c).max(axis=-2)


def folded_concat(af, bf):
    """Channel-concat two folded arrays (phase-major interleave)."""
    n, d, hf, wf, ca4 = af.shape
    cb4 = bf.shape[-1]
    a = af.reshape(n, d, hf, wf, 4, ca4 // 4)
    b = bf.reshape(n, d, hf, wf, 4, cb4 // 4)
    out = jnp.concatenate([a, b], axis=-1)
    return out.reshape(n, d, hf, wf, ca4 + cb4)


def folded_upsample_linear(g):
    """(1,2,2) linear upsample of an UNFOLDED half-res array, produced
    directly in folded layout (N, D, h, w, 4C) — the full-resolution
    tensor is never materialised.

    Matches ``jax.image.resize(method='linear')`` (half-pixel, edge
    clamp): out[2i] = 0.25*g[i-1] + 0.75*g[i], out[2i+1] = 0.75*g[i] +
    0.25*g[i+1].
    """
    def taps(x, axis):
        pad_lo = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
        pad_hi = jax.lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis],
                                      axis=axis)
        p = jnp.concatenate([pad_lo, x, pad_hi], axis=axis)
        n = x.shape[axis]
        lo = jax.lax.slice_in_dim(p, 0, n, axis=axis)
        mid = jax.lax.slice_in_dim(p, 1, n + 1, axis=axis)
        hi = jax.lax.slice_in_dim(p, 2, n + 2, axis=axis)
        return 0.25 * lo + 0.75 * mid, 0.75 * mid + 0.25 * hi

    y0, y1 = taps(g, 2)
    phases = []
    for ph_y in (y0, y1):
        x0, x1 = taps(ph_y, 3)
        phases.extend([x0, x1])
    out = jnp.stack(phases, axis=-2)  # (n, d, h, w, 4, c) phase-major
    n, d, h, w, _, c = out.shape
    return out.reshape(n, d, h, w, 4 * c).astype(g.dtype)


def folded_crop_to_factor(xf, factor, kernel_sizes):
    """Folded equivalent of ``crop_to_factor`` (translation-equivariance
    crop before the next conv pass).  Returns None if the target extent
    is xy-odd (caller falls back to the unfolded path)."""
    spatial = folded_spatial(xf)
    dims = len(factor)
    conv_crop = tuple(
        sum(k[d] - 1 for k in kernel_sizes) for d in range(dims)
    )
    ns = tuple((s - c) // f for s, c, f in zip(spatial, conv_crop, factor))
    target = tuple(n * f + c for n, c, f in zip(ns, conv_crop, factor))
    if target == spatial:
        return xf
    if not all(t > c for t, c in zip(target, conv_crop)):
        raise ValueError(
            f"feature map {spatial} too small for factor {factor} "
            f"and convs {kernel_sizes}"
        )
    if target[1] % 2 or target[2] % 2:
        return None
    return folded_center_crop(xf, target)


def folded_conv_pass(
    params, xf, kernel_sizes, activation="relu", compute_dtype=jnp.bfloat16
):
    """Folded equivalent of ``conv_pass_apply``: N valid convs with
    activations between, plus a centre-cropped 1x1 residual projection.
    ``xf`` may be a list of folded arrays (implicit channel concat)."""
    act = _ACTIVATIONS[activation]
    xfs = xf if isinstance(xf, (list, tuple)) else [xf]
    nlayers = len(params["layers"])
    out = None
    for i, layer in enumerate(params["layers"]):
        if i == 0:
            out = folded_conv_split(
                xfs, layer["w"], layer["b"], compute_dtype=compute_dtype
            )
        else:
            out = folded_conv(
                out, layer["w"], layer["b"], compute_dtype=compute_dtype
            )
        if i < nlayers - 1:
            out = act(out)
    res = folded_conv_split(
        xfs,
        params["residual"]["w"],
        params["residual"]["b"],
        compute_dtype=compute_dtype,
    )
    res = folded_center_crop(res, folded_spatial(out))
    return act(out + res)
