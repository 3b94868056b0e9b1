"""Measure the jitted train step's time/TFLOPs/MFU across batch sizes.

The round-3 baseline (BASELINE.md) showed 19.5% train MFU at the
reference recipe (batch 1, 32x196x196 input): the tiny 4x104x104 output
leaves the MXU starved between crops. Batch is the clean lever — the
reference trains 3D nets at batch 1 (``models/3d_affs/train.py``), but
our step takes any leading batch dim, so this tool quantifies what a
larger-batch recipe buys on real hardware.

Usage: python tools/train_mfu.py [--batches 1,2,4,8] [--iters 8]
Prints one JSON line per batch size.
"""

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

PEAK_TFLOPS = {"tpu v5 lite": 197.0, "cpu": None}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,2,4,8")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--setup", default="3d_affs")
    ap.add_argument("--fold", action="store_true",
                    help="keep the space-to-depth fold in the training "
                    "graph (CHECK-crashes XLA's space-to-batch pass at "
                    "batch<8; at batch>=8 it compiles and measured 19%% "
                    "faster than unfolded)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from bootstrapper_tpu.models import Model
    from bootstrapper_tpu.train.loop import create_train_state, make_train_step

    # default mirrors production training (workflows/train.py):
    # unfolded graph — the folded gradient CHECK-crashes XLA's
    # space-to-batch converter at small batches; --fold keeps it
    model = Model.from_setup(args.setup)
    model = Model({**model.net_config, "fold_xy": bool(args.fold)})
    nc = model.net_config
    in_shape = tuple(nc["input_shape"])
    out_shape = tuple(nc["output_shape"])

    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "cpu").lower()
    peak = next((v for k, v in PEAK_TFLOPS.items() if k in kind), None)

    for b in [int(x) for x in args.batches.split(",")]:
        key = jax.random.PRNGKey(b)
        batch = {
            "input": jax.random.uniform(key, (b, *in_shape, 1), jnp.float32),
            "targets": {
                name: jnp.zeros(
                    (b, *out_shape, len(o.get("neighborhood", [0] * o.get("dims", 3)))),
                    jnp.float32,
                )
                for name, o in nc["outputs"].items()
            },
        }
        batch["weights"] = {
            k: jnp.ones_like(v) for k, v in batch["targets"].items()
        }
        res = {"batch": b, "setup": args.setup}
        try:
            # fresh state per batch size: the step donates its state
            # argument, so reuse across sizes reads deleted buffers
            st, tx = create_train_state(model, jax.random.PRNGKey(0))
            step = jax.jit(make_train_step(model, tx), donate_argnums=(0,))
            cost = step.lower(st, batch).compile().cost_analysis() or {}
            flops = cost.get("flops", 0.0)
            st, m = step(st, batch)  # compile+warmup
            float(m["loss"])
            t0 = time.perf_counter()
            for _ in range(args.iters):
                st, m = step(st, batch)
                float(m["loss"])
            dt = (time.perf_counter() - t0) / args.iters
            res["ms_per_step"] = round(dt * 1e3, 1)
            res["tflops_per_step"] = round(flops / 1e12, 2)
            res["tfs"] = round(flops / dt / 1e12, 1)
            if peak:
                res["mfu_pct"] = round(100 * flops / dt / 1e12 / peak, 1)
        except Exception as e:
            res["error"] = str(e)[-200:]
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
