"""Probe: do int8 convolutions hit the v5e MXU's 2x int8 path via XLA?

v5e peaks at 394 TOPS int8 vs 197 TFLOP/s bf16.  If XLA:TPU lowers
``conv_general_dilated(s8, s8) -> s32`` onto the MXU's int8 mode, a
dynamically-quantized inference path could lift the 3d_affs throughput
well past the bf16 speed of light in BASELINE.md.  If it instead
falls back to upcasting, int8 is a dead end and this records that.

Times one representative conv per U-Net level (bf16 vs int8+rescale)
with forced readback.  Prints one JSON line per case.

Usage: python tools/int8_probe.py [--iters 20]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp

# (label, spatial (z,y,x), in_ch, out_ch) — 3d_affs levels at the
# (152,540,540) headline tile, folded where the production graph folds
CASES = [
    ("l0_folded", (148, 266, 266), 48, 48),
    ("l1_folded", (144, 129, 129), 240, 240),
    ("l2", (140, 128, 128), 300, 300),
    ("bottom", (66, 29, 29), 1500, 1500),
]


def bench(fn, args, iters):
    out = fn(*args)
    float(jnp.asarray(out, jnp.float32).mean())  # compile + force
    t0 = time.perf_counter()
    for _ in range(iters):
        float(jnp.asarray(fn(*args), jnp.float32).mean())
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    dn = ("NDHWC", "DHWIO", "NDHWC")

    for label, spatial, cin, cout in CASES:
        k = jax.random.PRNGKey(0)
        x = jax.random.normal(k, (1, *spatial, cin), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, cin, cout),
                              jnp.float32) * 0.05

        @jax.jit
        def conv_bf16(x, w):
            return jax.lax.conv_general_dilated(
                x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                (1, 1, 1), "VALID", dimension_numbers=dn)

        @jax.jit
        def conv_int8(x, w):
            # dynamic symmetric quantization: per-tensor activation
            # scale, per-output-channel weight scale
            sx = jnp.max(jnp.abs(x)) / 127.0
            sw = jnp.max(jnp.abs(w), axis=(0, 1, 2, 3)) / 127.0
            xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
            wq = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)
            acc = jax.lax.conv_general_dilated(
                xq, wq, (1, 1, 1), "VALID", dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            return acc.astype(jnp.bfloat16) * (sx * sw).astype(jnp.bfloat16)

        out_sp = tuple(s - 2 for s in spatial)
        flops = 2 * 27 * cin * cout
        for s in out_sp:
            flops *= s
        res = {"case": label, "spatial": spatial, "ch": [cin, cout]}
        try:
            dt = bench(conv_bf16, (x, w), args.iters)
            res["bf16_ms"] = round(dt * 1e3, 2)
            res["bf16_tfs"] = round(flops / dt / 1e12, 1)
        except Exception as e:
            res["bf16_error"] = str(e)[-200:]
        try:
            dt = bench(conv_int8, (x, w), args.iters)
            res["int8_ms"] = round(dt * 1e3, 2)
            res["int8_tops"] = round(flops / dt / 1e12, 1)
            # numeric sanity: int8 result within quantization error
            a = jnp.asarray(conv_bf16(x, w), jnp.float32)
            b = jnp.asarray(conv_int8(x, w), jnp.float32)
            denom = float(jnp.abs(a).mean()) or 1.0
            res["rel_err"] = round(float(jnp.abs(a - b).mean()) / denom, 4)
        except Exception as e:
            res["int8_error"] = str(e)[-200:]
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
