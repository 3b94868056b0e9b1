"""Full bootstrap round at the reference's headline scale (CREMI sample C
dimensions: 125 x 1250 x 1250 voxels @ 40x4x4 nm — reference
``examples/cremi/download.py:9-28``, ``examples/cremi/README.md:16-23``).

Real CREMI data is egress-blocked in this environment, so this measures
the promised BASELINE metric — wall-clock ``bs predict`` + ``bs segment``
(plus the full round around them) — on a synthetic EM volume of the
exact CREMI shape.  Every stage runs through the production config
factories and workflows (``make_round_configs`` + the five stage
drivers), i.e. the same code path as the CLI round, at real scale:

    sparse 2D labels (every Nth section) -> train 2d_mtlsd ->
    chained predict through the SHIPPED 3d_affs_from_2d_mtlsd ->
    blockwise mutex-watershed segment -> evaluate (VOI vs full GT) ->
    filter -> pseudo-GT for the next round.

Usage: python tools/cremi_scale_round.py [--shape 125,1250,1250]
           [--iters 1000] [--out DIR] [--workers 2] [--sparse-every 4]
Prints one JSON line: per-stage wall-clock, VOI of the best threshold,
and end-to-end throughput.
"""

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="125,1250,1250")
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--out", default="/root/scratch/cremi_scale")
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--sparse-every", type=int, default=4)
    ap.add_argument("--batch-tiles", type=int, default=None,
                    help="default: auto (32 for 2D setups, 1 for 3D)")
    args = ap.parse_args()
    shape = tuple(int(v) for v in args.shape.split(","))
    nvox = shape[0] * shape[1] * shape[2]

    import numpy as np

    sys.path.insert(0, os.path.join(HERE, "examples", "cremi"))
    from make_synthetic import synthetic_em

    from bootstrapper_tpu.configs import make_round_configs
    from bootstrapper_tpu.core.arrays import open_ds, prepare_ds
    from bootstrapper_tpu.utils import tomlio
    from bootstrapper_tpu.workflows.evaluate import run_evaluation
    from bootstrapper_tpu.workflows.filter import run_filter
    from bootstrapper_tpu.workflows.predict import run_prediction
    from bootstrapper_tpu.workflows.segment import run_segmentation
    from bootstrapper_tpu.workflows.train import run_training

    out = os.path.abspath(args.out)
    os.makedirs(out, exist_ok=True)
    container = os.path.join(out, "vol.zarr")
    vs = (40, 4, 4)
    timings = {}
    t_total = time.time()

    # ---- volume: synthetic EM at CREMI dimensions -------------------
    t0 = time.time()
    raw_np, gt_np = synthetic_em(shape=shape, seed=11)
    sparse = np.zeros_like(gt_np)
    mask = np.zeros(shape, np.uint8)
    for z in range(0, shape[0], args.sparse_every):
        sparse[z] = gt_np[z]
        mask[z] = 1
    for name, data, dtype in [
        ("raw", raw_np, np.uint8),
        ("gt", gt_np, np.uint64),
        ("sparse", sparse, np.uint64),
        ("sparse_mask", mask, np.uint8),
    ]:
        ds = prepare_ds(f"{container}/{name}", shape, (0, 0, 0), vs, dtype)
        ds[ds.roi] = data
    n_gt = int(len(np.unique(gt_np)))
    del raw_np, gt_np, sparse, mask
    timings["make_volume_s"] = round(time.time() - t0, 1)
    print(f"volume ready: {shape} ({nvox/1e6:.0f} Mvox), {n_gt} gt "
          f"objects ({timings['make_volume_s']}s)", flush=True)

    # ---- prepare: the production config factory ---------------------
    t0 = time.time()
    volumes = {
        "vol": {
            "raw_dataset": f"{container}/raw",
            "labels_dataset": f"{container}/sparse",
            "labels_mask_dataset": f"{container}/sparse_mask",
            "voxel_size": list(vs),
            "output_container": container,
        }
    }
    round_dir = os.path.join(out, "round_1")
    refiner_dir = os.path.join(HERE, "pretrained", "3d_affs_from_2d_mtlsd")
    refiner_iter = max(
        int(n.rsplit("_", 1)[1])
        for n in os.listdir(refiner_dir)
        if n.startswith("model_checkpoint_")
    )
    paths = make_round_configs(
        round_dir, volumes, ["2d_mtlsd", "3d_affs_from_2d_mtlsd"],
        iterations=[args.iters, refiner_iter],
        max_iterations=args.iters,
        segment_method="mws", blockwise=True,
        gt_labels=f"{container}/gt",
    )
    timings["prepare_s"] = round(time.time() - t0, 1)
    print(f"configs ready (shipped refiner @ {refiner_iter} iters)",
          flush=True)

    # ---- train the 2D model on the sparse sections ------------------
    t0 = time.time()
    res = run_training(paths["train_2d_mtlsd"])
    timings["train_s"] = round(time.time() - t0, 1)
    loss = res["final_loss"]  # None when auto-resume found a finished run
    print(f"2d_mtlsd trained {args.iters} iters: loss "
          f"{'resumed-complete' if loss is None else f'{loss:.4f}'} "
          f"({timings['train_s']}s)", flush=True)

    # ---- chained prediction at scale ---------------------------------
    t0 = time.time()
    run_prediction(
        paths["predict"], auto_tile=True, batch_tiles=args.batch_tiles
    )
    timings["predict_s"] = round(time.time() - t0, 1)
    print(f"chained prediction done ({timings['predict_s']}s, "
          f"{nvox / timings['predict_s'] / 1e6:.2f} Mvox/s end-to-end)",
          flush=True)

    # ---- blockwise mutex-watershed segmentation ----------------------
    t0 = time.time()
    segs = run_segmentation(
        paths["segment"], mode="mws", num_workers=args.workers
    )
    timings["segment_s"] = round(time.time() - t0, 1)
    print(f"blockwise mws done ({timings['segment_s']}s)", flush=True)

    # ---- evaluate against the full GT --------------------------------
    t0 = time.time()
    ev = run_evaluation(paths["evaluate"])
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
    print(f"evaluated ({timings['evaluate_s']}s): best {best}", flush=True)

    # ---- filter -> pseudo-GT for round 2 ------------------------------
    t0 = time.time()
    run_filter(paths["filter"])
    timings["filter_s"] = round(time.time() - t0, 1)
    nxt = tomlio.load(os.path.join(round_dir, "next_volumes.toml"))
    pseudo = open_ds(
        next(iter(nxt["volumes"].values()))["labels_dataset"]
    ).to_ndarray()
    n_pseudo = int(len(np.unique(pseudo))) - 1
    del pseudo

    total = round(time.time() - t_total, 1)
    result = {
        "scale": "x".join(str(s) for s in shape),
        "n_voxels": nvox,
        "chain": f"2d_mtlsd({args.iters}it) -> "
                 f"3d_affs_from_2d_mtlsd({refiner_iter}it shipped)",
        **timings,
        "predict_plus_segment_s": round(
            timings["predict_s"] + timings["segment_s"], 1
        ),
        "total_s": total,
        "best": best,
        "n_gt_objects": n_gt,
        "n_pseudo_gt_objects": n_pseudo,
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
