"""On-hardware system test of the flagship chain with SHIPPED checkpoints.

Reproduces the reference's headline workflow (examples/cremi/README.md)
on a synthetic EM volume: sparse 2D labels -> train 2d_mtlsd briefly ->
chained predict through the *shipped* 3d_affs_from_2d_mtlsd checkpoint
(no refiner training) -> mutex-watershed segmentation -> VOI against
the full ground truth.  The transfer claim being validated: a refiner
trained purely on synthetic labels improves a weak 2D model's output on
an unseen volume (reference ``configs.py:354-382`` checkpoints).

Usage: python tools/chain_system_test.py [--iters 500] [--out DIR]
Prints one JSON line with the chain VOI.
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
    ap.add_argument("--iters", type=int, default=500)
    ap.add_argument("--out", default="/root/scratch/chain_test")
    ap.add_argument("--shape", default="48,512,512")
    args = ap.parse_args()
    shape = tuple(int(v) for v in args.shape.split(","))

    import numpy as np

    sys.path.insert(0, os.path.join(HERE, "examples", "cremi"))
    from make_synthetic import synthetic_em

    from bootstrapper_tpu.configs import setup_models
    from bootstrapper_tpu.core.arrays import prepare_ds, open_ds
    from bootstrapper_tpu.eval.voi import rand_voi
    from bootstrapper_tpu.utils import tomlio
    from bootstrapper_tpu.workflows.predict import run_prediction
    from bootstrapper_tpu.workflows.segment import run_segmentation
    from bootstrapper_tpu.workflows.train import run_training

    out = os.path.abspath(args.out)
    os.makedirs(out, exist_ok=True)
    container = os.path.join(out, "vol.zarr")
    t0 = time.time()

    raw_np, gt_np = synthetic_em(shape=shape, seed=11)
    vs = (40, 4, 4)
    raw = prepare_ds(
        f"{container}/raw", shape, (0, 0, 0), vs, np.uint8
    )
    raw[raw.roi] = raw_np
    gt = prepare_ds(f"{container}/gt", shape, (0, 0, 0), vs, np.uint64)
    gt[gt.roi] = gt_np
    # sparse 2D labels: every 4th section
    sparse = np.zeros_like(gt_np)
    mask = np.zeros(shape, np.uint8)
    for z in range(0, shape[0], 4):
        sparse[z] = gt_np[z]
        mask[z] = 1
    sp = prepare_ds(f"{container}/sparse", shape, (0, 0, 0), vs, np.uint64)
    sp[sp.roi] = sparse
    mk = prepare_ds(f"{container}/sparse_mask", shape, (0, 0, 0), vs, np.uint8)
    mk[mk.roi] = mask
    print(f"volume ready ({time.time()-t0:.0f}s)", flush=True)

    setups = setup_models(
        ["2d_mtlsd", "3d_affs_from_2d_mtlsd"], os.path.join(out, "setups")
    )
    refiner_ckpt = [
        n for n in os.listdir(setups[1]) if n.startswith("model_checkpoint")
    ]
    assert refiner_ckpt, "shipped refiner checkpoint was not installed"
    refiner_iter = max(int(n.rsplit("_", 1)[1]) for n in refiner_ckpt)
    print(f"shipped refiner checkpoint: iteration {refiner_iter}", flush=True)

    train_cfg = {
        "setup_dir": setups[0],
        "voxel_size": list(vs),
        "max_iterations": args.iters,
        "save_checkpoints_every": args.iters,
        "save_snapshots_every": 0,
        "min_masked": 0.3,
        "samples": [
            {
                "raw": f"{container}/raw",
                "labels": f"{container}/sparse",
                "mask": f"{container}/sparse_mask",
            }
        ],
    }
    p = os.path.join(out, "train.toml")
    tomlio.dump({"train": train_cfg}, p)
    res = run_training(p)
    print(f"2d_mtlsd trained: loss {res['final_loss']:.4f} "
          f"({time.time()-t0:.0f}s)", flush=True)

    pred_cfg = {
        "vol": {
            "raw_dataset": f"{container}/raw",
            "output_container": container,
            "chain": [
                {
                    "setup_dir": setups[0],
                    "checkpoint_iteration": args.iters,
                    "input_datasets": [f"{container}/raw"],
                    "output_container": container,
                    "output_prefix": f"2d_mtlsd/{args.iters}",
                },
                {
                    "setup_dir": setups[1],
                    "checkpoint_iteration": refiner_iter,
                    "input_datasets": [
                        f"{container}/2d_mtlsd/{args.iters}/2d_lsds",
                        f"{container}/2d_mtlsd/{args.iters}/2d_affs",
                    ],
                    "output_container": container,
                    "output_prefix": "chain",
                },
            ],
        }
    }
    p = os.path.join(out, "predict.toml")
    tomlio.dump({"predict": pred_cfg}, p)
    run_prediction(p)
    print(f"chained prediction done ({time.time()-t0:.0f}s)", flush=True)

    seg_cfg = {
        "vol": {
            "affs_dataset": f"{container}/chain/3d_affs",
            "seg_dataset_prefix": f"{container}/post/chain/segmentations",
        }
    }
    p = os.path.join(out, "segment.toml")
    tomlio.dump({"segment": seg_cfg}, p)
    segs = run_segmentation(p, mode="mws")
    seg_path = segs["vol"]["mws"]
    seg = open_ds(seg_path).to_ndarray()
    voi = rand_voi(gt_np, seg)
    result = {
        "chain": f"2d_mtlsd({args.iters}it) -> 3d_affs_from_2d_mtlsd"
                 f"({refiner_iter}it shipped)",
        "voi_split": round(voi["voi_split"], 3),
        "voi_merge": round(voi["voi_merge"], 3),
        "voi_sum": round(voi["voi_split"] + voi["voi_merge"], 3),
        "n_segments": int(len(np.unique(seg))),
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
