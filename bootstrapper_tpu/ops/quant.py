"""Dynamic int8 quantized convolution (inference-only, ``BS_INT8=1``).

v5e MXUs run s8 x s8 -> s32 at 394 TOPS — 2x the 197 TFLOP/s bf16 peak
— so on conv-bound graphs (BASELINE.md: ~70% of device time in conv
fusions) int8 is the one lever past the bf16 speed of light without
changing the model.  The reference has no quantized path; this is a
TPU-specific extension (measured accuracy impact recorded in
BASELINE.md before any default changes; default stays bf16).

Scheme: symmetric dynamic quantization, computed inside the jitted
graph (no calibration pass): per-tensor activation scale (amax/127),
per-output-channel weight scales, int32 accumulation, bf16 rescale.
Every convolution entry point (plain, channel-split, folded, lazy
phase convs) routes through :func:`qconv` when enabled, so the whole
U-Net + heads quantize uniformly.

Gradients of round/clip are not defined usefully — training never
enables this (the flag is read at trace time).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def int8_enabled() -> bool:
    """Read at trace time; BS_INT8=1 switches convs to int8."""
    return os.environ.get("BS_INT8", "0") == "1"


def _dim_numbers(dims: int):
    if dims == 2:
        return ("NHWC", "HWIO", "NHWC")
    return ("NDHWC", "DHWIO", "NDHWC")


def qconv(x, w, *, out_dtype=jnp.bfloat16):
    """``conv_valid(x, w)`` with s8 operands and s32 accumulation.

    x: (N, *spatial, Ci); w: (*kernel, Ci, Co).  Returns ``out_dtype``.
    Exact to quantization error: |err| <= ~(1/127) of each operand's
    dynamic range, measured end-to-end in tests/test_quant.py.
    """
    dims = w.ndim - 2
    xf = x.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-30) / 127.0
    sw = (
        jnp.maximum(
            jnp.max(jnp.abs(wf), axis=tuple(range(dims + 1))), 1e-30
        )
        / 127.0
    )
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    wq = jnp.clip(jnp.round(wf / sw), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq,
        wq,
        window_strides=(1,) * dims,
        padding="VALID",
        dimension_numbers=_dim_numbers(dims),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * (sx * sw)).astype(out_dtype)
