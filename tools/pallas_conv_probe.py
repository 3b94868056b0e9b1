"""A/B probe: pallas_conv3d vs XLA's lax conv at the real decoder shapes.

Round-3 verdict item: the last untried SURVEY §7.1 lever is a
hand-written Pallas conv for the fusions xprof pins at ~35% MXU
efficiency.  This tool provides the evidence either way:

  --shapes       trace the flagship inference graph (headline tile,
                 CPU eval_shape — no device) and inventory every
                 conv_general_dilated call: (x shape, w shape, count),
                 flagging which ones pallas_conv3d supports.
  --ab Z,Y,X,CI/KD,KH,KW,CO [--iters N]
                 on-chip A/B of one conv: median ms and TFLOP/s for
                 XLA vs Pallas at (1,Z,Y,X,CI) x (KD,KH,KW,CI,CO),
                 honest scalar readback per call.
  --auto         run --ab for every supported conv found by --shapes,
                 largest estimated FLOP share first (requires chip).

Run only when nothing else owns the chip.
"""

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def collect_shapes(shape_increase=(120, 344, 344)):
    """(x_shape, w_shape) -> call count for the flagship graph."""
    import jax
    import jax.numpy as jnp

    from bootstrapper_tpu.models import Model

    model = Model.from_setup("3d_affs")
    params = model.init(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16), params
    )
    params = jax.eval_shape(model.prefold, params)
    nc = model.net_config
    in_shape = [a + b for a, b in zip(nc["input_shape"], shape_increase)]

    calls = {}
    real = jax.lax.conv_general_dilated

    def spy(x, w, *a, **k):
        key = (tuple(x.shape), tuple(w.shape))
        calls[key] = calls.get(key, 0) + 1
        return real(x, w, *a, **k)

    jax.lax.conv_general_dilated = spy
    try:
        x = jax.ShapeDtypeStruct((1, *in_shape, 1), jnp.bfloat16)
        jax.eval_shape(
            lambda p, x: model.apply(p, x)["3d_affs"], params, x
        )
    finally:
        jax.lax.conv_general_dilated = real
    return calls


def report_shapes():
    from bootstrapper_tpu.ops.pallas_conv import conv3d_supported

    calls = collect_shapes()
    rows = []
    for (xs, ws), n in calls.items():
        if len(ws) != 5:
            continue  # 2D / non-spatial
        kd, kh, kw, ci, co = ws
        out = [a - b + 1 for a, b in zip(xs[1:4], (kd, kh, kw))]
        flops = 2 * n * ci * co * kd * kh * kw
        for o in out:
            flops *= o
        rows.append(
            {
                "x": list(xs),
                "w": list(ws),
                "calls": n,
                "gflop_total": round(flops / 1e9, 1),
                "pallas_ok": conv3d_supported(xs, ws),
            }
        )
    rows.sort(key=lambda r: -r["gflop_total"])
    total = sum(r["gflop_total"] for r in rows)
    for r in rows:
        r["flop_share_pct"] = round(100 * r["gflop_total"] / total, 1)
        print(json.dumps(r))
    print(
        json.dumps(
            {
                "total_gflop": round(total, 1),
                "pallas_eligible_pct": round(
                    100
                    * sum(
                        r["gflop_total"] for r in rows if r["pallas_ok"]
                    )
                    / total,
                    1,
                ),
            }
        )
    )
    return rows


def ab_one(x_shape, w_shape, iters=20):
    """On-chip A/B; returns dict with per-variant ms + TFLOP/s."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bootstrapper_tpu.ops.pallas_conv import pallas_conv3d

    kd, kh, kw, ci, co = w_shape
    # generate on device: host-side RNG at these shapes is GBs of f64
    # on a 1-core host
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(k1, (1, *x_shape, ci), jnp.bfloat16)
    w = jax.random.normal(k2, w_shape, jnp.bfloat16) * 0.05
    b = jax.random.normal(k3, (co,), jnp.bfloat16)

    @jax.jit
    def xla(x, w, b):
        return (
            jax.lax.conv_general_dilated(
                x, w, (1, 1, 1), "VALID",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
            + b
        )

    out_sp = [a - b_ + 1 for a, b_ in zip(x_shape, (kd, kh, kw))]
    flops = 2 * ci * co * kd * kh * kw
    for o in out_sp:
        flops *= o

    def run(fn, label):
        y = fn(x, w, b)
        float(y.astype(jnp.float32).mean())  # compile + force
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(fn(x, w, b).astype(jnp.float32).mean())
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts) * 1e3)
        return {
            f"{label}_ms": round(ms, 3),
            f"{label}_tflops": round(flops / (ms / 1e3) / 1e12, 2),
        }

    res = {"x": list(x_shape), "w": list(w_shape)}
    res.update(run(xla, "xla"))
    try:
        res.update(run(pallas_conv3d, "pallas"))
        res["speedup"] = round(res["xla_ms"] / res["pallas_ms"], 3)
        # equality spot check (bf16 output, fp32 accumulation in both);
        # diff reduced on device — full outputs are GBs
        a = xla(x, w, b).astype(jnp.float32)
        g = pallas_conv3d(x, w, b).astype(jnp.float32)
        res["max_abs_diff"] = float(jnp.abs(a - g).max())
    except Exception as e:
        res["pallas_error"] = f"{type(e).__name__}: {e}"[:300]
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", action="store_true")
    ap.add_argument("--ab", help="Z,Y,X,CI/KD,KH,KW,CO")
    ap.add_argument("--auto", action="store_true")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--top", type=int, default=6,
                    help="--auto: A/B the top-N supported convs")
    args = ap.parse_args()
    if args.shapes:
        report_shapes()
        return
    if args.ab:
        xs, ws = args.ab.split("/")
        z, y, xx, ci = (int(v) for v in xs.split(","))
        kd, kh, kw, co = (int(v) for v in ws.split(","))
        print(json.dumps(ab_one((z, y, xx), (kd, kh, kw, ci, co),
                                args.iters)))
        return
    if args.auto:
        rows = report_shapes()
        for r in rows:
            if not r["pallas_ok"]:
                continue
            if args.top <= 0:
                break
            args.top -= 1
            x_sp = r["x"][1:4]
            print(json.dumps(ab_one(tuple(x_sp), tuple(r["w"]),
                                    args.iters)), flush=True)
        return
    ap.print_help()


if __name__ == "__main__":
    main()
