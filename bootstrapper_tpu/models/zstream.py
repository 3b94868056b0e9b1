"""Overlap-save z-streaming inference: zero redundant context compute.

The flagship nets never downsample z (all ``downsample_factors`` are
``(1, 2, 2)``), so every activation in the U-Net keeps full z
resolution and each valid conv merely consumes ``k_z - 1`` boundary
slices.  Tiled prediction (reference ``bootstrapper/predict.py:114-132``
and our ``predict/scan.py``) recomputes that 28-slice z context for
every tile — 18% of the input volume at the headline (152,540,540)
tile, ~7.6% of total conv FLOPs.

This module streams a volume in z instead, the convolutional analog of
FFT overlap-save: each step feeds ``s`` NEW z-slices and every level
keeps a small rolling cache —

- per level, the trailing ``sum(k_z - 1)`` slices of that level's input
  (so its conv pass sees exactly its context without recomputation);
- per decoder level, a skip FIFO whose constant length is derived from
  the warmup shapes (the encoder stream runs ahead of the decoder
  stream by the z-lag accumulated in the deeper levels).

Steady-state steps then convert ``s`` input slices into ``s`` output
slices with *no* z context overhead, and results are bit-identical to
the static graph on the concatenated input (valid convolutions are
exact under concatenation).  The per-step graphs reuse the production
decode machinery unchanged (space-to-depth fold, lazy/slab decoding,
prefolded weights), so all single-tile memory optimisations apply
per step.

State layout (a pytree, jit-friendly)::

    {"enc": [cache_per_level...],             # level-input z tails
     "dec_f": [fifo_per_level...],            # skip FIFOs (head-shared)
     "dec_g": [[g_cache_per_level...]]}       # per head, per level

``unet_stream_step(params, x, None, cfg)`` is the warmup step: it runs
the plain forward on a full-context input and returns the initial
caches; subsequent calls take ``s``-slice inputs.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .unet import (
    UNetConfig,
    _center_crop,
    _fold_depth,
    _try_lazy_decode,
    _z_slab_decode,
    conv_pass_apply,
    crop_to_factor,
    max_pool,
    upsample_resize,
)


def stream_eligible(cfg: UNetConfig) -> bool:
    """z-streaming applies to 3D valid-conv nets that never pool z."""
    return (
        cfg.dims == 3
        and cfg.padding == "valid"
        and cfg.constant_upsample
        and all(f[0] == 1 for f in cfg.downsample_factors)
    )


def _dz(kernels) -> int:
    """z context consumed by one conv pass."""
    return sum(k[0] - 1 for k in kernels)


def z_context(cfg: UNetConfig) -> int:
    """Total z context of the net (input z - output z)."""
    total = sum(_dz(k) for k in cfg.kernel_size_down)
    total += sum(_dz(k) for k in cfg.kernel_size_up)
    return total


def _cat_z(cache, new):
    if cache is None:
        return new
    return jnp.concatenate([cache.astype(new.dtype), new], axis=1)


def unet_stream_step(
    params,
    x,
    state: Optional[dict],
    cfg: UNetConfig,
    compute_dtype=jnp.bfloat16,
    return_folded: bool = False,
):
    """One z-streaming step. Returns (per-head outputs, new state).

    ``state=None`` is the warmup step: ``x`` must carry the full z
    context (output z extent = x z extent - ``z_context(cfg)``); later
    steps feed ``s`` new z slices and emit ``s`` output slices.  Output
    values are bit-identical to ``unet_apply`` on the concatenation of
    all inputs fed so far (valid convs are exact under concatenation;
    the fold/lazy/slab decode forms used per step are each bit-checked
    against the plain graph).
    """
    if not stream_eligible(cfg):
        raise ValueError("config not eligible for z streaming")
    from . import fold as F

    crop_factors = cfg.crop_factors
    L = cfg.num_levels
    warm = state is None
    new_state = {
        "enc": [None] * L,
        # the skip stream is head-independent, so its FIFO is stored
        # once per level; only the g context differs per head
        "dec_f": [None] * (L - 1),
        "dec_g": [[None] * (L - 1) for _ in range(cfg.num_heads)],
    }

    # -- encoder: each level caches the z tail of its own input --------
    m = _fold_depth(cfg, x)
    cur = x.astype(compute_dtype)
    if m:
        cur = F.fold(cur)
    skips = []  # this step's f_left slices per level (folded for i < m)
    for i in range(L):
        folded = i < m
        dz = _dz(cfg.kernel_size_down[i])
        cache = None if warm else state["enc"][i]
        cat = _cat_z(cache, cur)
        new_state["enc"][i] = cat[:, cat.shape[1] - dz :]
        if folded:
            f_left = F.folded_conv_pass(
                params["l_conv"][i], cat, cfg.kernel_size_down[i],
                cfg.activation, compute_dtype,
            )
        else:
            f_left = conv_pass_apply(
                params["l_conv"][i], cat, cfg.kernel_size_down[i],
                cfg.activation, compute_dtype,
            )
        skips.append(f_left)
        if i < L - 1:
            if folded and i + 1 < m:
                cur = F.folded_pool_122(f_left)  # stays folded
            elif folded:
                cur = F.folded_phase_max(f_left)  # unfolds for plain levels
            else:
                cur = max_pool(f_left, cfg.downsample_factors[i])

    def decode_plain(f, g, i, h):
        """Plain decoder level (mirrors unet_apply.decode_plain; the
        constant-upsample branch only — streaming gates on it)."""
        g_up = upsample_resize(g, cfg.downsample_factors[i])
        g_up = crop_to_factor(g_up, crop_factors[i], cfg.kernel_size_up[i])
        f_crop = _center_crop(f, g_up.shape[1 : 1 + cfg.dims])
        x_in = (
            [f_crop, g_up]
            if cfg.fold_xy
            else jnp.concatenate([f_crop, g_up], axis=-1)
        )
        return conv_pass_apply(
            params["r_conv"][h][i], x_in, cfg.kernel_size_up[i],
            cfg.activation, compute_dtype,
        )

    # -- decoder: g-context cache + constant-length skip FIFO ----------
    gs = [skips[L - 1]] * cfg.num_heads
    for i in range(L - 2, -1, -1):
        folded = i < m
        dz = _dz(cfg.kernel_size_up[i])
        rf = return_folded if i == 0 else False
        f_cat = _cat_z(None if warm else state["dec_f"][i], skips[i])
        outs = []
        for h in range(cfg.num_heads):
            g_cat = _cat_z(
                None if warm else state["dec_g"][h][i], gs[h]
            )
            e_g, e_f = g_cat.shape[1], f_cat.shape[1]
            if warm:
                # static-graph pairing: the decoder centre-crops the
                # skip in z; the FIFO keeps everything from the next
                # step's window start onward, a CONSTANT length
                # ceil((e_f - e_g)/2) + dz thereafter
                off = (e_f - e_g) // 2
                fifo = (e_f - e_g) - off + dz
                f_win = f_cat[:, off : off + e_g]
            else:
                fifo = state["dec_f"][i].shape[1]
                # steady state: the window is exactly the OLDEST
                # e_g slices of (FIFO + new) — see module docstring
                f_win = f_cat[:, :e_g]
            new_state["dec_g"][h][i] = g_cat[:, e_g - dz :]
            new_state["dec_f"][i] = f_cat[:, f_cat.shape[1] - fifo :]

            def dfn(f, g, h=h, i=i, rf=rf, folded=folded):
                out = _try_lazy_decode(
                    params, f, g, i, h, cfg, crop_factors, compute_dtype,
                    f_left_folded=folded, return_folded=rf,
                )
                if out is None:
                    out = decode_plain(
                        F.unfold(f) if folded else f, g, i, h
                    )
                return out

            out = _z_slab_decode(f_win, g_cat, i, cfg, crop_factors, dfn)
            outs.append(out if out is not None else dfn(f_win, g_cat))
        gs = outs
    return gs, new_state
