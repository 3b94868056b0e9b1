"""Hand-scheduled Pallas TPU kernel for 3D VALID convolution.

Target: the U-Net conv fusions that xprof pins at low MXU efficiency
under XLA's default lowering — measured on-chip (tools/
pallas_conv_probe.py): the 300-channel level-2 convs run at 30-66
TF/s (15-33% of the v5e's 197 TF/s bf16 peak).  The reference leaves
convolutions to cuDNN (``bootstrapper/models/3d_affs/unet.py:440-478``);
on TPU the equivalent "let the library do it" is XLA, and this kernel
exists to beat XLA exactly where measurement says it underperforms
(SURVEY §7.1).

Design — flattened tap-accumulated matmul:

    out[z,y,x,co] = Σ_{dz,dy,dx,ci} in[z+dz, y+dy, x+dx, ci] · w[dz,dy,dx,ci,co]

The (H, W) plane is flattened to one row axis, so for each of the
kd·kh·kw taps the whole (block_y·W)-row window is ONE
[block_y·W, Cin] x [Cin, Cout] MXU matmul (v1 did one small matmul per
output row — M=118 starved the MXU and accumulator traffic dominated).
Outputs at the last kw-1 columns of each row mix row ends ("wrap
garbage", ~2% of compute) and are cropped by the wrapper, as are the
rows/columns introduced by alignment padding.

The input stays in HBM; each grid step (one z, ``block_y`` output
rows) DMAs its [kd, (block_y+kh-1)·W, Cin] window into a
double-buffered VMEM scratch so the next window loads while the
current one computes (compute-bound ~7x at the target shapes).
Weights live in VMEM whole (kd·kh·kw · Cin · Cout bf16, capped at
~6 MB — the 1500-channel bottom convs are out of scope and already
run efficiently under XLA).  Bias add and ReLU are fused.

Alignment rules (Mosaic): manual-DMA slice extents must be multiples
of the (8, 128) tile, so the wrapper zero-pads W to 8k (flat rows stay
8-aligned), H so the row-block count divides evenly, and Cin to 128k
(exact: zero channels meet zero weight rows; the MXU pads K to lane
multiples internally anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: output rows per grid step; H is padded so this always divides
BLOCK_Y = 8


def conv3d_supported(x_shape, w_shape) -> bool:
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
    # the DMA window carries only 8 zero tail rows, so dx taps beyond 8
    # (kw > 9) would read past the copied window (see _conv3d_kernel)
    if kw > 9:
        return False
    d, h, w = x_shape[1:4]
    return d >= kd and h >= kh and w >= kw


def _conv3d_kernel(
    x_hbm, w_ref, b_ref, out_ref, buf, sem, *,
    taps, wp, n_rows_out, n_grid, relu, out_dtype,
):
    kd = max(t[0] for t in taps) + 1
    kh = max(t[1] for t in taps) + 1
    zo = pl.program_id(0)
    yo = pl.program_id(1)
    n_y = pl.num_programs(1)
    step = zo * n_y + yo
    # +8: the dx taps shift the window start by up to kw-1 flat rows,
    # so the last tap reads past the (BLOCK_Y+kh-1)*wp rows of the
    # plain window; x_flat carries 8 zero rows at the end to match
    win_rows = (BLOCK_Y + kh - 1) * wp + 8

    def window_copy(slot, zi, yi):
        return pltpu.make_async_copy(
            x_hbm.at[
                pl.ds(zi, kd), pl.ds(yi * BLOCK_Y * wp, win_rows)
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

    acc = None
    for t, (dz, dy, dx) in enumerate(taps):
        xs = buf[slot, dz, pl.ds(dy * wp + dx, n_rows_out), :]
        p = jax.lax.dot_general(
            xs,
            w_ref[t],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = p if acc is None else acc + p
    acc = acc + b_ref[:].astype(jnp.float32)[None, :]
    if relu:
        acc = jnp.maximum(acc, 0.0)
    out_ref[0, :, :] = acc.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("relu", "out_dtype", "interpret"),
)
def pallas_conv3d(
    x,
    w,
    b,
    *,
    relu: bool = False,
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
    if kw > 9:
        raise ValueError(
            f"kw={kw} > 9: the window DMA pads only 8 tail rows, wider "
            "kernels would read out-of-window data (conv3d_supported "
            "rejects these shapes)"
        )
    d_out = d - kd + 1
    h_out_real, w_out_real = h - kh + 1, ww - kw + 1
    # alignment padding (see module docstring): W -> 8k, H -> so that
    # BLOCK_Y divides h_out, Cin -> 128k
    w_pad = (-ww) % 8
    h_pad = (-(h - kh + 1)) % BLOCK_Y
    c_pad = (-ci) % 128
    if w_pad or c_pad or h_pad:
        x = jnp.pad(
            x, ((0, 0), (0, 0), (0, h_pad), (0, w_pad), (0, c_pad))
        )
        if c_pad:
            w = jnp.pad(
                w, ((0, 0), (0, 0), (0, 0), (0, c_pad), (0, 0))
            )
        h += h_pad
        ww += w_pad
        ci += c_pad
    h_out = h - kh + 1
    dt = x.dtype
    out_dt = out_dtype or dt
    taps = [
        (dz, dy, dx)
        for dz in range(kd)
        for dy in range(kh)
        for dx in range(kw)
    ]
    n_y = h_out // BLOCK_Y
    n_grid = d_out * n_y
    n_rows_out = BLOCK_Y * ww  # flat output rows per grid step
    kernel = functools.partial(
        _conv3d_kernel,
        taps=taps,
        wp=ww,
        n_rows_out=n_rows_out,
        n_grid=n_grid,
        relu=relu,
        out_dtype=out_dt,
    )
    wt = w.reshape(kd * kh * kw, ci, co).astype(dt)
    # 8 zero tail rows: see window_copy comment in the kernel
    x_flat = jnp.pad(
        x[0].reshape(d, h * ww, ci), ((0, 0), (0, 8), (0, 0))
    )
    win_rows = (BLOCK_Y + kh - 1) * ww + 8
    vmem_bytes = (
        2 * kd * win_rows * ci * dt.itemsize  # double-buffered window
        + wt.size * dt.itemsize
        + n_rows_out * co * (dt.itemsize + 4)  # out block + fp32 acc
    )
    out = pl.pallas_call(
        kernel,
        grid=(d_out, n_y),
        in_specs=[
            # x stays in HBM; windows are DMA'd manually (ANY lets
            # small inputs land in VMEM where window slices hit
            # sublane-tiling alignment rules)
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # all taps' weights
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
        ],
        out_specs=pl.BlockSpec(
            (1, n_rows_out, co), lambda zo, yo: (zo, yo, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (d_out, h_out * ww, co), out_dt
        ),
        scratch_shapes=[
            pltpu.VMEM((2, kd, win_rows, ci), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                128 * 2**20, int(vmem_bytes * 1.5) + 2**20
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * d_out * h_out * ww * ci * co * len(taps),
            bytes_accessed=dt.itemsize
            * (n_grid * kd * win_rows * ci + d_out * h_out * ww * co),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_flat, wt, b.astype(dt))
    # unflatten and crop wrap-garbage columns + alignment padding
    out = out.reshape(d_out, h_out, ww, co)
    return out[None, :, :h_out_real, :w_out_real, :]
