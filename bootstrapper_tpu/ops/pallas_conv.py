"""Hand-scheduled Pallas TPU kernel for 3D VALID convolution.

Target: the U-Net decoder conv fusions that xprof pins at ~35% MXU
efficiency under XLA's default lowering (the narrow folded decoder
levels and the 300-channel level-2 up-convs — BASELINE.md round-2/3
xprof tables; SURVEY §7.1 "Pallas kernels for conv/transpose-conv where
XLA's defaults underperform").  The reference leaves convolutions to
cuDNN (``bootstrapper/models/3d_affs/unet.py:440-478``); on TPU the
equivalent "let the library do it" is XLA, and this kernel exists to
beat XLA exactly where measurement says it underperforms.

Design — tap-accumulated matmul:

    out[z,y,x,co] = Σ_{dz,dy,dx,ci} in[z+dz, y+dy, x+dx, ci] · w[dz,dy,dx,ci,co]

For each of the kd·kh·kw taps, a [W_out, Cin] x [Cin, Cout] MXU matmul
per output row, accumulated in fp32.  The input stays in HBM and each
grid step (one z, ``block_y`` output rows) DMAs its
[kd, block_y+kh-1, W_in, Cin] window into a double-buffered VMEM
scratch, so the next window loads while the current one computes
(compute-bound by ~7x at the target shapes: 3.1 MFLOP vs ~1.8 KB HBM
traffic per output voxel at Cin=Cout=240).  Weights live in VMEM whole
(27·Cin·Cout bf16 — up to ~5 MB at the 300-channel level; the
1500-channel bottom conv is out of scope, and XLA already runs it at
high efficiency).

Efficiency model at the folded 60-channel decoder level (Cin=Cout=240,
W_out≈268): M=268→pad 384, K=N=240→pad 256 gives a ~62% MXU ceiling —
against the ~35% XLA measures there.  Bias add and ReLU are fused
(VPU, free next to the matmuls).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_block_y(h_out: int, target: int = 8) -> int:
    """Largest divisor of ``h_out`` that is <= target (DMA windows and
    output blocks must tile H exactly; remainder rows would need
    masking that costs more than a slightly smaller block)."""
    for b in range(min(target, h_out), 0, -1):
        if h_out % b == 0:
            return b
    return 1


def conv3d_supported(x_shape, w_shape, block_y: int = 8) -> bool:
    """Cheap static predicate: shapes this kernel handles well."""
    if len(x_shape) != 5 or x_shape[0] != 1 or len(w_shape) != 5:
        return False
    kd, kh, kw, ci, co = w_shape
    if x_shape[-1] != ci:
        return False
    # narrow contractions waste >half the MXU's K lanes; leave them
    # (and anything whose weights blow the VMEM budget) to XLA
    if ci < 128 or kd * kh * kw * ci * co * 2 > 6 * 2**20:
        return False
    d, h, w = x_shape[1:4]
    return d >= kd and h >= kh and w >= kw


def _conv3d_kernel(
    x_hbm, w_ref, b_ref, out_ref, buf, sem, *,
    taps, block_y, w_out, n_grid, relu,
):
    kd, kh, _ = (
        max(t[0] for t in taps) + 1,
        max(t[1] for t in taps) + 1,
        max(t[2] for t in taps) + 1,
    )
    zo = pl.program_id(0)
    yo = pl.program_id(1)
    n_y = pl.num_programs(1)
    step = zo * n_y + yo

    def window_copy(slot, zi, yi):
        return pltpu.make_async_copy(
            x_hbm.at[
                pl.ds(zi, kd), pl.ds(yi * block_y, block_y + kh - 1)
            ],
            buf.at[slot],
            sem.at[slot],
        )

    # warm-up: the very first step issues its own DMA
    @pl.when(step == 0)
    def _():
        window_copy(0, 0, 0).start()

    # double-buffer: start the next window while this one computes
    nxt = step + 1

    @pl.when(nxt < n_grid)
    def _():
        window_copy(nxt % 2, nxt // n_y, nxt % n_y).start()

    slot = step % 2
    window_copy(slot, zo, yo).wait()

    bias = b_ref[:].astype(jnp.float32)[None, :]

    def y_body(y, _):
        acc = None
        for t, (dz, dy, dx) in enumerate(taps):
            xs = buf[slot, dz, y + dy, dx : dx + w_out, :]
            p = jax.lax.dot_general(
                xs,
                w_ref[t],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = p if acc is None else acc + p
        acc = acc + bias
        if relu:
            acc = jnp.maximum(acc, 0.0)
        out_ref[0, y, :, :] = acc.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, block_y, y_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("relu", "block_y", "out_dtype", "interpret"),
)
def pallas_conv3d(
    x,
    w,
    b,
    *,
    relu: bool = False,
    block_y: int = 0,
    out_dtype=None,
    interpret: bool = False,
):
    """VALID stride-1 3D convolution ``(1,D,H,W,Ci) x (kd,kh,kw,Ci,Co)
    -> (1,D',H',W',Co)`` with fused bias (+ optional ReLU), fp32
    accumulation.  Matches ``lax.conv_general_dilated`` with NDHWC /
    DHWIO dimension numbers (models/unet.py ``_conv``)."""
    if x.ndim != 5 or x.shape[0] != 1:
        raise ValueError(f"expected (1,D,H,W,C) input, got {x.shape}")
    kd, kh, kw, ci, co = w.shape
    _, d, h, ww, cx = x.shape
    if cx != ci:
        raise ValueError(f"channel mismatch: x {cx} vs w {ci}")
    w_out_real = ww - kw + 1
    # Mosaic constrains manual-DMA slice extents to the (sublane, lane)
    # tiling: the x window's W must be a multiple of 8 and its C a
    # multiple of 128.  Zero-pad (zero input channels with zero weight
    # rows are exact; padded W columns produce garbage outputs cropped
    # below).  The MXU pads K to 128 lanes internally either way, so
    # the only real cost is the pad copy of x.
    w_pad = (-ww) % 8
    c_pad = (-ci) % 128
    if w_pad or c_pad:
        x = jnp.pad(
            x, ((0, 0), (0, 0), (0, 0), (0, w_pad), (0, c_pad))
        )
        if c_pad:
            w = jnp.pad(
                w, ((0, 0), (0, 0), (0, 0), (0, c_pad), (0, 0))
            )
        ww += w_pad
        ci += c_pad
    d_out, h_out, w_out = d - kd + 1, h - kh + 1, ww - kw + 1
    if block_y <= 0:
        block_y = _pick_block_y(h_out)
    if h_out % block_y:
        raise ValueError(f"H_out {h_out} not divisible by {block_y}")
    taps = [
        (dz, dy, dx)
        for dz in range(kd)
        for dy in range(kh)
        for dx in range(kw)
    ]
    dt = x.dtype
    n_grid = d_out * (h_out // block_y)
    kernel = functools.partial(
        _conv3d_kernel,
        taps=taps,
        block_y=block_y,
        w_out=w_out,
        n_grid=n_grid,
        relu=relu,
    )
    wt = w.reshape(kd * kh * kw, ci, co).astype(dt)
    vmem_bytes = (
        2 * kd * (block_y + kh - 1) * ww * ci * dt.itemsize  # buf
        + wt.size * dt.itemsize
        + block_y * w_out * co * (dt.itemsize + 4)  # out blk + fp32 acc
    )
    out = pl.pallas_call(
        kernel,
        grid=(d_out, h_out // block_y),
        in_specs=[
            # x must stay in HBM: ANY lets the compiler pick VMEM for
            # small inputs, where the DMA's window slice hits sublane
            # tiling alignment rules (Mosaic: "slice shape along
            # dimension 2 must be aligned to tiling (8)")
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # all taps' weights
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
        ],
        out_specs=pl.BlockSpec(
            (1, block_y, w_out, co), lambda zo, yo: (zo, yo, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (d_out, h_out, w_out, co), out_dtype or dt
        ),
        scratch_shapes=[
            pltpu.VMEM((2, kd, block_y + kh - 1, ww, ci), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                128 * 2**20, int(vmem_bytes * 1.5) + 2**20
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * d_out * h_out * w_out * ci * co * len(taps),
            bytes_accessed=dt.itemsize
            * (
                n_grid * kd * (block_y + kh - 1) * ww * ci
                + d_out * h_out * w_out * co
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x[0], wt, b.astype(dt))
    if w_pad:
        out = out[:, :, :w_out_real, :]
    return out[None]
