"""Trained-chain deep-volume run: production `bs predict` semantics
with REAL weights, plus stream-vs-tiled equality under saturation.

The round-4 deep-volume record (tools/deep_stream_predict.py) used a
random-init net whose mid-range sigmoids amplify bf16 cross-executable
noise (p99.9 = 8/255).  This drives the trained flagship chain — the
round's CREMI-trained 2d_mtlsd plus the SHIPPED 20k-iteration
3d_affs_from_2d_mtlsd refiner — over a deep synthetic EM volume, where
trained logits saturate, and records how the stream/tiled difference
collapses.  Run only when nothing else owns the chip.

  python tools/deep_chain_trained.py \
      --setups /tmp/cremi_scale/round_1/setups --shape 400,764,764
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
    ap.add_argument("--setups", required=True,
                    help="dir with trained 2d_mtlsd + refiner setups")
    ap.add_argument("--shape", default="400,764,764")
    ap.add_argument("--out", default="/tmp/deep_chain")
    ap.add_argument("--check-slices", type=int, default=152)
    args = ap.parse_args()
    shape = tuple(int(v) for v in args.shape.split(","))
    nvox = shape[0] * shape[1] * shape[2]

    import numpy as np

    sys.path.insert(0, os.path.join(HERE, "examples", "cremi"))
    from make_synthetic import synthetic_em

    from bootstrapper_tpu.core.arrays import open_ds, prepare_ds
    from bootstrapper_tpu.utils import tomlio
    from bootstrapper_tpu.workflows.predict import run_prediction

    os.makedirs(args.out, exist_ok=True)
    container = os.path.join(args.out, "vol.zarr")
    vs = (40, 4, 4)
    t0 = time.time()
    raw_np, _ = synthetic_em(shape=shape, seed=21)
    raw = prepare_ds(f"{container}/raw", shape, (0, 0, 0), vs, np.uint8)
    raw[raw.roi] = raw_np
    del raw_np
    make_s = round(time.time() - t0, 1)

    setups = [
        os.path.join(args.setups, "2d_mtlsd"),
        os.path.join(args.setups, "3d_affs_from_2d_mtlsd"),
    ]
    iters = [
        max(
            int(n.rsplit("_", 1)[1])
            for n in os.listdir(d)
            if n.startswith("model_checkpoint_")
        )
        for d in setups
    ]

    def cfg_for(prefix):
        return {"predict": {"vol": {
            "raw_dataset": f"{container}/raw",
            "voxel_size": list(vs),
            "output_container": container,
            "chain": [
                {
                    "setup_dir": setups[0],
                    "checkpoint_iteration": iters[0],
                    "output_prefix": f"{prefix}/2d",
                },
                {
                    "setup_dir": setups[1],
                    "checkpoint_iteration": iters[1],
                    "output_prefix": f"{prefix}/3d",
                    "input_datasets": [
                        f"{container}/{prefix}/2d/2d_lsds",
                        f"{container}/{prefix}/2d/2d_affs",
                    ],
                },
            ],
        }}}

    # full deep chain, streamed refiner
    os.environ["BS_ZSTREAM"] = "1"
    path = os.path.join(args.out, "p_stream.toml")
    tomlio.dump(cfg_for("stream"), path)
    t0 = time.time()
    res = run_prediction(path)
    stream_wall = round(time.time() - t0, 1)
    r3d = res["vol/stream/3d"]
    assert "columns" in r3d, f"refiner did not stream: {r3d}"

    # tiled refiner on a subvolume, reading the SAME 2d predictions
    os.environ["BS_ZSTREAM"] = "0"
    path = os.path.join(args.out, "p_tiled.toml")
    tomlio.dump(cfg_for("stream"), path)  # same inputs; re-run 3d only
    check_roi = (args.check_slices * vs[0], *raw.roi.shape[1:])
    t0 = time.time()
    # redirect the tiled output by a second config with its own prefix
    cfg = cfg_for("tiled")
    cfg["predict"]["vol"]["chain"][1]["input_datasets"] = [
        f"{container}/stream/2d/2d_lsds",
        f"{container}/stream/2d/2d_affs",
    ]
    tomlio.dump(cfg, path)
    run_prediction(
        path, setup_id="3d_affs_from", roi_offset=(0, 0, 0),
        roi_shape=check_roi,
    )
    tiled_wall = round(time.time() - t0, 1)
    os.environ.pop("BS_ZSTREAM", None)

    tiled = open_ds(f"{container}/tiled/3d/3d_affs")
    a = open_ds(f"{container}/stream/3d/3d_affs").to_ndarray(
        tiled.roi
    ).astype(np.int16)
    b = tiled.to_ndarray().astype(np.int16)
    diff = np.abs(a - b)
    print(json.dumps({
        "volume": "x".join(map(str, shape)),
        "n_voxels": nvox,
        "chain": f"2d_mtlsd({iters[0]}) -> refiner({iters[1]})",
        "make_volume_s": make_s,
        "stream_chain_wall_s": stream_wall,
        "refiner_stream_stats": {
            k: round(v, 2) if isinstance(v, float) else v
            for k, v in r3d.items()
        },
        "tiled_subvol_wall_s": tiled_wall,
        "equality_trained": {
            "max_abs_diff_uint8": int(diff.max()),
            "p999_abs_diff_uint8": int(np.percentile(diff, 99.9)),
            "mean_abs_diff_uint8": round(float(diff.mean()), 4),
            "frac_diff_nonzero": round(float((diff != 0).mean()), 4),
        },
    }), flush=True)


if __name__ == "__main__":
    main()
