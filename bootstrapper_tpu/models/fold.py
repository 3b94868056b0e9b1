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


def _fold_w_only(w):
    """(kz, ky, kx, ci, co) valid-conv weights -> folded equivalent
    (kz, ky//2+1, kx//2+1, 4*ci, 4*co)."""
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
    return wf.reshape(kz, qy_n, qx_n, 4 * ci, 4 * co)


def fold_conv_weights(w, b):
    """Transform (kz, ky, kx, ci, co) valid-conv weights into their folded
    equivalent (kz, ky//2+1, kx//2+1, 4*ci, 4*co); bias tiles phase-major."""
    return _fold_w_only(w), jnp.tile(b, 4)


def fold_w(layer, off: int = 0, c=None):
    """Folded weights for ``layer['w'][..., off:off+c, :]``.

    Consults the layer's prefolded cache (see ``prefold_conv_pass``) so
    the ~7x-sized folded kernel is built ONCE per checkpoint load
    instead of inside every jitted forward call — the per-call
    select/bitcast weight-formatting fusions diagnosed in BASELINE.md.
    On a miss the transform runs in-graph; either way the values are
    bit-identical (same ops on the same weights)."""
    w = layer["w"]
    if c is None:
        c = w.shape[3] - off
    pf = layer.get(f"_pf:{off}:{c}")
    if pf is not None:
        return pf
    if (off, c) != (0, w.shape[3]):
        w = w[..., off : off + c, :]
    return _fold_w_only(w)


def folded_conv(xf, w=None, b=None, *, layer=None, compute_dtype=jnp.bfloat16):
    """Valid conv on a folded array using ORIGINAL (unfolded) weights.

    Pass ``layer`` (a {'w','b'} dict, possibly with prefolded entries)
    from model code; the (w, b) form is kept for tests/probes."""
    from ..ops import quant

    if layer is not None:
        wf, bf = fold_w(layer), jnp.tile(layer["b"], 4)
    else:
        wf, bf = fold_conv_weights(w, b)
    if quant.int8_enabled():
        y = quant.qconv(xf, wf, out_dtype=compute_dtype)
        return y + bf.astype(compute_dtype)
    y = jax.lax.conv_general_dilated(
        xf.astype(compute_dtype),
        wf.astype(compute_dtype),
        window_strides=(1, 1, 1),
        padding="VALID",
        dimension_numbers=_dim_numbers(3),
    )
    return y + bf.astype(compute_dtype)


def folded_conv_split(xfs, layer, *, compute_dtype=jnp.bfloat16):
    """Folded conv over an implicit channel concat of folded arrays:
    original weights are split by each input's (unfolded) channel count,
    folded separately, and the partial convs summed — the wide folded
    concat is never materialised."""
    from ..ops import quant

    q8 = quant.int8_enabled()
    off = 0
    y = None
    for xf in xfs:
        c = xf.shape[-1] // 4
        wf = fold_w(layer, off, c)
        if q8:
            part = quant.qconv(xf, wf, out_dtype=compute_dtype)
        else:
            part = jax.lax.conv_general_dilated(
                xf.astype(compute_dtype),
                wf.astype(compute_dtype),
                window_strides=(1, 1, 1),
                padding="VALID",
                dimension_numbers=_dim_numbers(3),
            )
        y = part if y is None else y + part
        off += c
    return y + jnp.tile(layer["b"], 4).astype(compute_dtype)


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


def folded_pool_122(xf):
    """(1,2,2) max-pool that KEEPS the folded layout: the half-res
    result is itself returned 2x2-folded (N, D, Hf/2, Wf/2, 4C).

    ``fold(phase_max(xf))`` as one fused reshuffle+reduce, so deeper
    levels can stay folded without a full-resolution unfold write (the
    0.5-HBM-util data-formatting cost diagnosed in BASELINE.md).
    Requires even folded extents (i.e. original H, W divisible by 4)."""
    n, d, hf, wf, c4 = xf.shape
    c = c4 // 4
    g = xf.reshape(n, d, hf, wf, 4, c).max(axis=-2)  # phase max
    v = g.reshape(n, d, hf // 2, 2, wf // 2, 2, c)
    return v.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
        n, d, hf // 2, wf // 2, 4 * c
    )


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


def _axis_taps(c0, p, k):
    """Half-res tap positions for output phase ``p`` of a k-tap conv
    composed with the 2-tap half-pixel blend at crop offset ``c0``:
    {position: [(orig_tap_index, blend_coef), ...]}.

    Adding 2 to ``c0`` shifts every position by 1 and changes nothing
    else, so the *re-based* taps (hence the composite kernel values)
    depend only on ``c0 % 2``."""
    taps = {}
    for i in range(k):
        eb, q = divmod(c0 + p + i, 2)
        pairs = [(0, 0.25), (1, 0.75)] if q == 0 else [(1, 0.75), (2, 0.25)]
        for d, coef in pairs:
            taps.setdefault(eb + d, []).append((i, coef))
    return taps


def _build_up_kernel(w, ytaps, by, xtaps, bx):
    """Composite kernel array for one output phase from its tap maps."""
    kz, ky, kx, ci, co = w.shape
    ty = max(ytaps) - by + 1
    tx = max(xtaps) - bx + 1
    k = jnp.zeros((kz, ty, tx, ci, co), w.dtype)
    for posy, ylist in ytaps.items():
        for posx, xlist in xtaps.items():
            acc = None
            for iy, cy in ylist:
                for ix, cx in xlist:
                    term = (cy * cx) * w[:, iy, ix]
                    acc = term if acc is None else acc + term
            k = k.at[:, posy - by, posx - bx].add(acc)
    return k


def composite_up_kernels(w, c0y: int, c0x: int, layer=None, off: int = 0):
    """Fuse (1,2,2) linear upsample + crop offset + valid conv into four
    per-output-phase kernels over the *edge-padded half-resolution*
    input.

    The 2-tap half-pixel blend composed with a k-tap conv at output
    stride 2 is a ceil((k+1)/2)+...-tap conv in half-res space — for the
    ubiquitous k=3 it is exactly 3 taps, so the fusion is FLOP-neutral
    and the upsampled tensor never materialises.

    w: (kz, ky, kx, ci, co).  Returns [((py,px), kernel, (by, bx))] where
    ``kernel`` convolves gp = pad(g, 1, edge) sliced from (by, bx).

    With ``layer``/``off``, prefolded kernels (``prefold_conv_pass``)
    are used when present — kernel values depend only on the crop-offset
    *parities*, so the cache is keyed by (off, c, c0y%2, c0x%2, phase)
    and the slice bases are re-derived here."""
    kz, ky, kx, ci, co = w.shape
    out = []
    for py in range(2):
        ytaps = _axis_taps(c0y, py, ky)
        by = min(ytaps)
        for px in range(2):
            xtaps = _axis_taps(c0x, px, kx)
            bx = min(xtaps)
            kern = None
            if layer is not None:
                kern = layer.get(
                    f"_pfu:{off}:{ci}:{c0y % 2}{c0x % 2}:{py}{px}"
                )
            if kern is None:
                kern = _build_up_kernel(w, ytaps, by, xtaps, bx)
            out.append(((py, px), kern, (by, bx)))
    return out


def lazy_upsample_conv(
    g, w, crop_offsets, target, *, layer=None, off=0,
    compute_dtype=jnp.bfloat16
):
    """g-side of a decoder conv layer without materialising the
    upsample: equivalent to ``conv_valid(crop(upsample_linear_122(g)),
    w)`` (crop at ``crop_offsets`` to ``target``), returned in FOLDED
    layout (N, Dz', Ty', Tx', 4*co).  No bias."""
    kz, ky, kx, ci, co = w.shape
    c0z, c0y, c0x = crop_offsets
    tz, ty, tx = target
    ly, lx = (ty - ky + 1) // 2, (tx - kx + 1) // 2
    from ..ops import quant

    q8 = quant.int8_enabled()
    gp = jnp.pad(g, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    gp = gp[:, c0z : c0z + tz]
    phases = []
    for (_, kern, (by, bx)) in composite_up_kernels(
        w, c0y, c0x, layer=layer, off=off
    ):
        t_y, t_x = kern.shape[1], kern.shape[2]
        sl = gp[:, :, by : by + ly + t_y - 1, bx : bx + lx + t_x - 1, :]
        if q8:
            phases.append(quant.qconv(sl, kern, out_dtype=compute_dtype))
            continue
        phases.append(
            jax.lax.conv_general_dilated(
                sl.astype(compute_dtype),
                kern.astype(compute_dtype),
                window_strides=(1, 1, 1),
                padding="VALID",
                dimension_numbers=_dim_numbers(3),
            )
        )
    out = jnp.stack(phases, axis=-2)  # (n, dz', ly, lx, 4, co)
    n, dz, _, _, _, _ = out.shape
    return out.reshape(n, dz, ly, lx, 4 * co)


def up_crop_geometry(up_spatial, kernel_sizes, crop_factor):
    """crop_to_factor geometry on the implicit upsampled extent:
    (target, offsets), or None when the target is xy-odd (caller falls
    back to the unfolded path)."""
    conv_crop = tuple(
        sum(k[d] - 1 for k in kernel_sizes) for d in range(3)
    )
    ns = tuple(
        (s - c) // f for s, c, f in zip(up_spatial, conv_crop, crop_factor)
    )
    target = tuple(n * f + c for n, c, f in zip(ns, conv_crop, crop_factor))
    if target != up_spatial and not all(
        t > c for t, c in zip(target, conv_crop)
    ):
        raise ValueError(
            f"feature map {up_spatial} too small for factor {crop_factor} "
            f"and convs {kernel_sizes}"
        )
    if target[1] % 2 or target[2] % 2:
        return None
    offsets = [(s - t) // 2 for s, t in zip(up_spatial, target)]
    return target, offsets


def folded_decode_level(
    params,
    f_left_f,
    g,
    kernel_sizes,
    crop_factor,
    activation="relu",
    compute_dtype=jnp.bfloat16,
    return_folded: bool = False,
):
    """Decoder level with a *materialised* folded-blend upsample and a
    single folded conv pass over split inputs.  Best when channel counts
    are small (level 0): one conv keeps the MXU busier than the four
    per-phase lazy convs, and the folded temporaries are narrow."""
    if any(k[1] % 2 == 0 or k[2] % 2 == 0 for k in kernel_sizes):
        return None
    up_spatial = (g.shape[1], g.shape[2] * 2, g.shape[3] * 2)
    geom = up_crop_geometry(up_spatial, kernel_sizes, crop_factor)
    if geom is None:
        return None
    target, offsets = geom
    g_f = folded_upsample_linear(g)
    g_up_f = folded_crop(g_f, target, offsets)
    f_crop_f = folded_center_crop(f_left_f, target)
    out_f = folded_conv_pass(
        params, [f_crop_f, g_up_f], kernel_sizes, activation, compute_dtype
    )
    return out_f if return_folded else unfold(out_f)


def lazy_decode_level(
    params,
    f_left,
    g,
    kernel_sizes,
    crop_factor,
    activation="relu",
    compute_dtype=jnp.bfloat16,
    f_left_folded: bool = False,
    return_folded: bool = False,
):
    """A full decoder level — upsample(1,2,2) + crop_to_factor + skip
    concat + residual conv pass — with the upsample fused into the first
    conv layer and the residual, everything in folded layout.  Exact
    (same values as the reference path) and FLOP-neutral for the
    dominant 3-tap kernels.

    Returns None when ineligible: caller falls back."""
    k1 = kernel_sizes[0]
    if len(k1) != 3 or any(k[1] % 2 == 0 or k[2] % 2 == 0 for k in kernel_sizes):
        return None
    up_spatial = (g.shape[1], g.shape[2] * 2, g.shape[3] * 2)
    geom = up_crop_geometry(up_spatial, kernel_sizes, crop_factor)
    if geom is None:
        return None
    target, offsets = geom

    # skip side, folded (pad-to-even then parity-aware crop)
    if f_left_folded:
        f_spatial = folded_spatial(f_left)
        f_pad = f_left
    else:
        f_spatial = f_left.shape[1:4]
        pad_h, pad_w = f_spatial[1] % 2, f_spatial[2] % 2
        if pad_h or pad_w:
            f_left = jnp.pad(
                f_left, ((0, 0), (0, 0), (0, pad_h), (0, pad_w), (0, 0))
            )
        f_pad = fold(f_left)
    f_offsets = [(s - t) // 2 for s, t in zip(f_spatial, target)]
    f_crop_f = folded_crop(f_pad, target, f_offsets)
    cf = f_crop_f.shape[-1] // 4

    act = _ACTIVATIONS[activation]
    layers = params["layers"]
    w1, b1 = layers[0]["w"], layers[0]["b"]
    wf1 = fold_w(layers[0], 0, cf)
    f_side = jax.lax.conv_general_dilated(
        f_crop_f.astype(compute_dtype),
        wf1.astype(compute_dtype),
        window_strides=(1, 1, 1),
        padding="VALID",
        dimension_numbers=_dim_numbers(3),
    )
    g_side = lazy_upsample_conv(
        g, w1[..., cf:, :], offsets, target,
        layer=layers[0], off=cf, compute_dtype=compute_dtype
    )
    out = f_side + g_side + jnp.tile(b1, 4).astype(compute_dtype)
    for layer in layers[1:]:
        out = act(out)
        out = folded_conv(out, layer=layer, compute_dtype=compute_dtype)
    # residual: 1x1 over the implicit concat, centre-cropped
    wr, br = params["residual"]["w"], params["residual"]["b"]
    wrf = fold_w(params["residual"], 0, cf)
    res_f = jax.lax.conv_general_dilated(
        f_crop_f.astype(compute_dtype),
        wrf.astype(compute_dtype),
        window_strides=(1, 1, 1),
        padding="VALID",
        dimension_numbers=_dim_numbers(3),
    )
    res_g = lazy_upsample_conv(
        g, wr[..., cf:, :], offsets, target,
        layer=params["residual"], off=cf, compute_dtype=compute_dtype
    )
    res = res_f + res_g + jnp.tile(br, 4).astype(compute_dtype)
    res = folded_center_crop(res, folded_spatial(out))
    out = act(out + res)
    return out if return_folded else unfold(out)


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
            out = folded_conv_split(xfs, layer, compute_dtype=compute_dtype)
        else:
            out = folded_conv(out, layer=layer, compute_dtype=compute_dtype)
        if i < nlayers - 1:
            out = act(out)
    res = folded_conv_split(
        xfs, params["residual"], compute_dtype=compute_dtype
    )
    res = folded_center_crop(res, folded_spatial(out))
    return act(out + res)


# ---------------------------------------------------------------------------
# prefolding: build every folded-weight transform once at checkpoint load
# ---------------------------------------------------------------------------


def prefold_conv_pass(cp, split=None, up_phases=False):
    """Return a conv-pass params dict ({'layers': [...], 'residual': ...})
    with prefolded weight entries added to each layer dict.

    The folded forward rebuilds each conv's folded kernel (``fold_w``)
    and, on lazy decoder levels, the four composite upsample kernels
    (``composite_up_kernels``) from the original weights *inside* the
    jitted graph — pure functions of the parameters, recomputed every
    call.  Prefolding stores the results in the pytree under ``_pf:*``
    keys so the per-call graph only loads them; consumers fall back to
    the in-graph transform when a key is absent, and the values are
    bit-identical either way (same ops over the same weights).

    ``split``: the first-layer/residual input-channel split boundary
    (the decoder's implicit skip/upsample concat); ``up_phases`` adds
    the composite upsample kernels for the post-split slice at all four
    crop-offset parity combinations (values depend only on parity).
    """
    if any(
        not can_fold_kernel(tuple(layer["w"].shape[:3]))
        for layer in cp["layers"]
    ):
        return cp

    def with_entries(layer, first):
        w = layer["w"]
        ci = w.shape[3]
        new = dict(layer)
        if first and split:
            segs = [(0, split), (split, ci - split)]
        else:
            segs = [(0, ci)]
        for off, c in segs:
            sl = w if (off, c) == (0, ci) else w[..., off : off + c, :]
            new[f"_pf:{off}:{c}"] = _fold_w_only(sl)
        if first and split and up_phases:
            off, c = split, ci - split
            sl = w[..., off:, :]
            kz, ky, kx = w.shape[:3]
            for ry in (0, 1):
                for rx in (0, 1):
                    for py in (0, 1):
                        ytaps = _axis_taps(ry, py, ky)
                        for px in (0, 1):
                            xtaps = _axis_taps(rx, px, kx)
                            new[f"_pfu:{off}:{c}:{ry}{rx}:{py}{px}"] = (
                                _build_up_kernel(
                                    sl, ytaps, min(ytaps), xtaps, min(xtaps)
                                )
                            )
        return new

    return {
        "layers": [
            with_entries(layer, i == 0) for i, layer in enumerate(cp["layers"])
        ],
        "residual": with_entries(cp["residual"], True),
    }
