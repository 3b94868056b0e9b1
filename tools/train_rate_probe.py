"""Instrumented long-run training-rate probe (round-3 weak item 7).

The synthetic refiner pipeline degraded ~3x in s/iter over a few
thousand iterations on the TPU relay (band-aided by subprocess
chunking in tools/train_refiners.py, never root-caused).  This probe
times windows of iterations while recording the candidate culprits:

  host RSS (leak?), GC collections, window wall-time split into
  host next_batch() vs device step dispatch+sync, and the jit cache
  sizes (recompilation creep).

Bisect logic: run it --cpu (pure host stack, no relay) and on the
chip.  Decay on CPU => pipeline/jax host cause; decay only on the
relay => relay/server session state (each chunked restart resets it).

  python tools/train_rate_probe.py --iters 3000 --cpu
  python tools/train_rate_probe.py --iters 5000            # on chip
  python tools/train_rate_probe.py --iters 3000 --no-train # pipeline only

Prints one JSON line per window; final line has the start->end ratio.
"""

import argparse
import gc
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) // 1024
    return -1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--window", type=int, default=100)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--setup", default="3d_affs_from_2d_mtlsd")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no-train", action="store_true",
                    help="only pull batches; no device train step")
    ap.add_argument("--tiny", action="store_true",
                    help="shrink the net (CPU-speed shapes)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from bootstrapper_tpu.models import Model
    from bootstrapper_tpu.pipeline.synthetic import SyntheticTrainingPipeline
    from bootstrapper_tpu.train import create_train_state, make_train_step
    from bootstrapper_tpu.utils.xla import bs_jit

    nc = dict(Model.from_setup(args.setup).net_config)
    if args.tiny:
        nc.update(
            num_fmaps=2, fmap_inc_factor=2, input_shape=[12, 48, 48],
            output_shape=[4, 8, 8], shape_increase=[0, 0, 0],
            downsample_factors=[[1, 2, 2]] * 2,
            kernel_size_down=[
                [[1, 3, 3], [1, 3, 3]],
                [[3, 3, 3], [3, 3, 3]],
                [[3, 3, 3], [3, 3, 3]],
            ],
            kernel_size_up=[[[1, 3, 3], [1, 3, 3]]] * 2,
        )
    model = Model({**nc, "fold_xy": False})
    model.validate_shapes()
    pipeline = SyntheticTrainingPipeline(
        model.net_config, voxel_size=(40, 4, 4), batch_size=args.batch
    )
    state = None
    step_fn = None
    if not args.no_train:
        state, tx = create_train_state(model, jax.random.PRNGKey(0))
        step_fn = bs_jit(make_train_step(model, tx), donate_argnums=(0,))

    windows = []
    t_host = t_dev = 0.0
    t_win = time.perf_counter()
    gc0 = sum(s["collections"] for s in gc.get_stats())
    try:
        for it in range(1, args.iters + 1):
            t0 = time.perf_counter()
            batch = pipeline.next_batch()
            t1 = time.perf_counter()
            if step_fn is not None:
                state, metrics = step_fn(state, batch)
                if it % 10 == 0:
                    float(metrics["loss"])  # production sync cadence
            else:
                jax.block_until_ready(batch)
            t2 = time.perf_counter()
            t_host += t1 - t0
            t_dev += t2 - t1
            if it % args.window == 0:
                dt = time.perf_counter() - t_win
                gc1 = sum(s["collections"] for s in gc.get_stats())
                row = {
                    "iter": it,
                    "s_per_iter": round(dt / args.window, 4),
                    "host_s": round(t_host, 2),
                    "dev_s": round(t_dev, 2),
                    "rss_mb": rss_mb(),
                    "gc_collections": gc1 - gc0,
                    "live_arrays": len(jax.live_arrays()),
                }
                windows.append(row)
                print(json.dumps(row), flush=True)
                t_host = t_dev = 0.0
                t_win = time.perf_counter()
    finally:
        pipeline.stop()
    if len(windows) >= 3:
        # steady-state ratio: last window vs the best early window
        # (window 1 includes compiles)
        early = min(w["s_per_iter"] for w in windows[1:4])
        late = windows[-1]["s_per_iter"]
        print(json.dumps({
            "verdict_ratio_late_over_early": round(late / early, 3),
            "early_s_per_iter": early,
            "late_s_per_iter": late,
            "rss_growth_mb": windows[-1]["rss_mb"] - windows[0]["rss_mb"],
        }), flush=True)


if __name__ == "__main__":
    main()
