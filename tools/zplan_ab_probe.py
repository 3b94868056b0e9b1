"""On-chip A/B validation of the z-stream plan chooser's cost model.

``workflows/predict.py`` picks between two multi-device stream plans —
(a) xy tiles shrunk until every device gets a column (min_columns =
n_dev) and (b) widest xy tiles with z-segmented columns
(``plan_z_groups``) — using an ESTIMATED device-work factor zf * xyf.
The round-4 verdict flagged that no on-chip measurement confirms the
crossover, so production dispatch could silently pick the slower plan.

This probe measures, on the one real chip, each candidate's actual
warm-step and steady-step wall times at its planned tile, then
reconstructs the lockstep per-device total the mesh would run:

    total(device) = n_groups * (T_warm + n_steady * T_steady)

(the same accounting the cost model does in FLOP units), and compares
the measured winner/ratio against the model's.  Single-chip measurement
of per-device work is exact for this comparison: lockstep columns run
the identical graphs, and ICI transfer is zero in both plans (columns
are independent; no collectives in the streaming path).

Usage: python tools/zplan_ab_probe.py --vol 1200,600,600 --ndev 8
           [--steady-iters 6]
Prints one JSON line per volume shape with model vs measured factors.
"""

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def measure_plan(model, inc, s, s_warm, steady_iters):
    """Real warm/steady step seconds for one plan's tile."""
    import jax.numpy as jnp
    import numpy as np

    from bootstrapper_tpu.predict.zstream import ZStreamPredictor

    zp = ZStreamPredictor(
        model, model.init_params, (40, 4, 4), shape_increase=inc,
        step_z=s, warm_step_z=s_warm,
    )
    in_z, iy, ix = zp.warm_input_tile
    rng = np.random.default_rng(0)
    warm_x = jnp.asarray(
        rng.integers(0, 255, (1, in_z, iy, ix, 1), dtype=np.uint8)
    )
    xs = [
        jnp.asarray(
            rng.integers(0, 255, (1, zp.s, iy, ix, 1), dtype=np.uint8)
        )
        for _ in range(2)
    ]
    # compile both graphs (forced readback per relay rules)
    outs, state = zp._warm(zp.params, warm_x)
    float(outs["3d_affs"].astype(jnp.float32).mean())
    outs, state = zp._steady(zp.params, xs[0], state)
    float(outs["3d_affs"].astype(jnp.float32).mean())

    t0 = time.perf_counter()
    outs, state0 = zp._warm(zp.params, warm_x)
    float(outs["3d_affs"].astype(jnp.float32).mean())
    t_warm = time.perf_counter() - t0

    state = state0
    t0 = time.perf_counter()
    for i in range(steady_iters):
        outs, state = zp._steady(zp.params, xs[i % 2], state)
        float(outs["3d_affs"].astype(jnp.float32).mean())
    t_steady = (time.perf_counter() - t0) / steady_iters
    return t_warm, t_steady, zp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vol", action="append", default=None,
                    help="out-voxel volume shape z,y,x (repeatable)")
    ap.add_argument("--ndev", type=int, default=8)
    ap.add_argument("--steady-iters", type=int, default=6)
    args = ap.parse_args()
    vols = args.vol or ["1200,600,600"]

    import jax

    from bootstrapper_tpu.models import Model
    from bootstrapper_tpu.predict.zstream import (
        plan_stream,
        plan_z_groups,
    )

    model = Model.from_setup("3d_affs")
    nc = model.net_config
    ctx_z = nc["input_shape"][0] - nc["output_shape"][0]
    ctx_xy = nc["input_shape"][1] - nc["output_shape"][1]
    params = model.init(jax.random.PRNGKey(0))
    # measure_plan builds predictors repeatedly; share params via attr
    object.__setattr__(model, "init_params", params)
    n_dev = args.ndev

    for volspec in vols:
        out_vox = tuple(int(v) for v in volspec.split(","))
        plans = {}
        for label, min_cols in (("narrow_cols", n_dev), ("wide_zseg", 1)):
            inc, s, s_warm = plan_stream(nc, out_vox, min_columns=min_cols)
            out_shape = [a + b for a, b in zip(nc["output_shape"], inc)]
            ncols = 1
            for v, t in zip(out_vox[1:], out_shape[1:]):
                ncols *= -(-v // t)
            g, seg, zf = plan_z_groups(
                out_vox[0], ncols, n_dev, s, s_warm, ctx_z
            )
            xyf = ((out_shape[1] + ctx_xy) / out_shape[1]) * (
                (out_shape[2] + ctx_xy) / out_shape[2]
            )
            n_steady = max(0, -(-(seg - s_warm) // s))
            n_groups = -(-(ncols * g) // n_dev)
            plans[label] = dict(
                inc=inc, s=s, s_warm=s_warm, ncols=ncols, g=g, seg=seg,
                n_steady=n_steady, n_groups=n_groups,
                model_factor=round(zf * xyf, 4),
            )

        result = {"vol": volspec, "n_dev": n_dev}
        for label, p in plans.items():
            t_warm, t_steady, zp = measure_plan(
                model, p["inc"], p["s"], p["s_warm"], args.steady_iters
            )
            per_device_s = p["n_groups"] * (
                t_warm + p["n_steady"] * t_steady
            )
            out_vox_n = out_vox[0] * out_vox[1] * out_vox[2]
            result[label] = {
                **{k: p[k] for k in (
                    "s", "s_warm", "ncols", "g", "n_groups", "n_steady",
                    "model_factor",
                )},
                "tile": "x".join(map(str, zp.input_tile)),
                "t_warm_s": round(t_warm, 3),
                "t_steady_s": round(t_steady, 3),
                "lockstep_total_s": round(per_device_s, 1),
                "mesh_mvox_per_s": round(
                    out_vox_n / per_device_s / 1e6, 2
                ),
            }
            print(f"# {volspec} {label}: {result[label]}", flush=True)

        a, b = result["narrow_cols"], result["wide_zseg"]
        result["model_winner"] = (
            "narrow_cols" if a["model_factor"] <= b["model_factor"]
            else "wide_zseg"
        )
        result["measured_winner"] = (
            "narrow_cols"
            if a["lockstep_total_s"] <= b["lockstep_total_s"]
            else "wide_zseg"
        )
        result["model_ratio"] = round(
            a["model_factor"] / b["model_factor"], 3
        )
        result["measured_ratio"] = round(
            a["lockstep_total_s"] / b["lockstep_total_s"], 3
        )
        result["agree"] = (
            result["model_winner"] == result["measured_winner"]
        )
        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
