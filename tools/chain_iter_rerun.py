"""Train the chain's first link longer, re-run the chain, record VOI.

Round-3/4 analysis showed chain VOI is first-link-limited: the 2d
link trains 1000 iterations in the recorded rounds vs the reference's
30001 default (``bootstrapper/configs.py:402-416``).  This tool extends
an EXISTING round-1 workspace's 2d link to ``--to-iter`` (auto-resume
from the saved checkpoint, RSS + stall watchdogs active), rewrites the
round's predict/segment/evaluate configs for the new checkpoint
iteration, re-runs the chain, and prints VOI vs the earlier link.

Usage: python tools/chain_iter_rerun.py
           [--round-dir /tmp/cremi_scale/round_1]
           [--setup 2d_mtlsd] [--from-iter 1000] [--to-iter 5000]
           [--workers 2]
Emits one JSON line per completed stage (CHAIN5K prefix).
"""

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def emit(result):
    print("CHAIN5K " + json.dumps(result), flush=True)


def rewrite(path, out_path, subs):
    with open(path) as f:
        text = f.read()
    for a, b in subs:
        text = text.replace(a, b)
    with open(out_path, "w") as f:
        f.write(text)
    return out_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round-dir", default="/tmp/cremi_scale/round_1")
    ap.add_argument("--setup", default="2d_mtlsd")
    ap.add_argument("--from-iter", type=int, default=1000)
    ap.add_argument("--to-iter", type=int, default=5000)
    ap.add_argument("--workers", type=int, default=2)
    args = ap.parse_args()

    from bootstrapper_tpu.workflows.evaluate import run_evaluation
    from bootstrapper_tpu.workflows.predict import run_prediction
    from bootstrapper_tpu.workflows.segment import run_segmentation
    from bootstrapper_tpu.workflows.train import run_training

    rd = os.path.abspath(args.round_dir)
    fi, ti = args.from_iter, args.to_iter
    timings = {}
    result = {
        "setup": args.setup, "from_iter": fi, "to_iter": ti,
        "timings": timings,
    }
    t_all = time.time()

    t0 = time.time()
    res = run_training(
        os.path.join(rd, f"01_train_{args.setup}.toml"),
        max_iterations=ti, save_checkpoints_every=1000,
    )
    timings["train_s"] = round(time.time() - t0, 1)
    result["final_loss"] = (
        None if res["final_loss"] is None else round(res["final_loss"], 4)
    )
    result["train_iterations"] = res["iterations"]
    emit({**result, "stage": "train"})

    # rewrite the chain configs for the new first-link iteration
    sub_dir = os.path.join(rd, f"rerun_{ti}")
    os.makedirs(sub_dir, exist_ok=True)
    subs = [
        (f"{args.setup}/{fi}", f"{args.setup}/{ti}"),
        (f"--from--{args.setup}_{fi}", f"--from--{args.setup}_{ti}"),
        (f"checkpoint_iteration = {fi}", f"checkpoint_iteration = {ti}"),
    ]
    predict_cfg = rewrite(
        os.path.join(rd, "02_predict.toml"),
        os.path.join(sub_dir, "02_predict.toml"), subs,
    )
    segment_cfg = rewrite(
        os.path.join(rd, "03_segment.toml"),
        os.path.join(sub_dir, "03_segment.toml"), subs,
    )
    evaluate_cfg = rewrite(
        os.path.join(rd, "04_evaluate.toml"),
        os.path.join(sub_dir, "04_evaluate.toml"), subs,
    )
    # keep eval results separate from the round-1 ones
    from bootstrapper_tpu.utils import tomlio

    ev_cfg = tomlio.load(evaluate_cfg)
    for vol in ev_cfg["evaluate"].values():
        vol["out_result_dir"] = os.path.join(sub_dir, "eval")
    tomlio.dump(ev_cfg, evaluate_cfg)

    t0 = time.time()
    run_prediction(predict_cfg, auto_tile=True)
    timings["predict_s"] = round(time.time() - t0, 1)
    emit({**result, "stage": "predict"})

    t0 = time.time()
    run_segmentation(segment_cfg, mode="mws", num_workers=args.workers)
    timings["segment_s"] = round(time.time() - t0, 1)
    emit({**result, "stage": "segment"})

    t0 = time.time()
    ev = run_evaluation(evaluate_cfg)
    timings["evaluate_s"] = round(time.time() - t0, 1)
    best = None
    for vol_results in ev.values():
        for seg_path, metrics in vol_results.items():
            voi = metrics.get("voi", metrics)
            if "voi_split" not in voi:
                continue
            s = voi["voi_split"] + voi["voi_merge"]
            if best is None or s < best["voi_sum"]:
                best = {
                    "seg": seg_path,
                    "voi_split": round(voi["voi_split"], 3),
                    "voi_merge": round(voi["voi_merge"], 3),
                    "voi_sum": round(s, 3),
                }
    result["best"] = best
    result["total_s"] = round(time.time() - t_all, 1)
    emit({**result, "stage": "evaluate"})


if __name__ == "__main__":
    main()
