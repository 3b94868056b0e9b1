"""Drive one real deep volume through production z-stream predict.

Round-3 verdict item 5: the z-stream production path had never run a
1000+-slice volume on the chip — warm amortisation and host-IO overlap
at depth were extrapolated from bench.py's 17-step loop.  This runs
``run_prediction`` (the exact ``bs predict`` code path) over a
``--shape`` (default 1200x764x764 = 700 Mvox, >= 1000 slices) synthetic
volume with the flagship 3d_affs setup, records sustained Mvox/s
end-to-end (device + host reads + Zarr writes overlapped by the
one-deep pipeline), then equality-spot-checks a subvolume against the
tiled path (``BS_ZSTREAM=0``).

Prints one JSON line for BASELINE.md.  Run only when nothing else owns
the chip.  Reference anchor: the tiled scheme this streams past,
``bootstrapper/predict.py:114-132``.
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
    ap.add_argument("--shape", default="1200,764,764")
    ap.add_argument("--out", default="/tmp/deep_stream")
    ap.add_argument("--check-slices", type=int, default=160,
                    help="z extent of the tiled equality subvolume")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke mode: tiny net + tiny volume to "
                         "validate the plumbing without a chip")
    args = ap.parse_args()
    if args.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.shape = "40,24,24"
        args.check_slices = 8
    shape = tuple(int(v) for v in args.shape.split(","))
    nvox = shape[0] * shape[1] * shape[2]

    import numpy as np

    from bootstrapper_tpu.configs import setup_models
    from bootstrapper_tpu.core.arrays import open_ds, prepare_ds
    from bootstrapper_tpu.core.geometry import Roi
    from bootstrapper_tpu.models import Model
    from bootstrapper_tpu.train import create_train_state, save_checkpoint
    from bootstrapper_tpu.utils import tomlio
    from bootstrapper_tpu.workflows.predict import run_prediction

    os.makedirs(args.out, exist_ok=True)
    container = os.path.join(args.out, "vol.zarr")
    vs = (40, 4, 4)

    raw = prepare_ds(f"{container}/raw", shape, (0, 0, 0), vs, np.uint8)
    t0 = time.time()
    rng = np.random.default_rng(7)
    # slab-wise fill: 700 MB of uint8 in bounded memory
    for z0 in range(0, shape[0], 100):
        z1 = min(z0 + 100, shape[0])
        raw[Roi(
            (z0 * vs[0], 0, 0), ((z1 - z0) * vs[0], *raw.roi.shape[1:])
        )] = rng.integers(0, 255, (z1 - z0, *shape[1:]), dtype=np.uint8)
    make_s = round(time.time() - t0, 1)

    import jax

    setup_dirs = setup_models(["3d_affs"], os.path.join(args.out, "setups"))
    if args.tiny:
        ncp = os.path.join(setup_dirs[0], "net_config.json")
        with open(ncp) as f:
            nc = json.load(f)
        nc.update(
            num_fmaps=2, fmap_inc_factor=2, input_shape=[24, 48, 48],
            output_shape=[4, 8, 8], shape_increase=[0, 0, 0],
            downsample_factors=[[1, 2, 2]] * 2,
            kernel_size_down=[[[3, 3, 3], [3, 3, 3]]] * 3,
            kernel_size_up=[[[3, 3, 3], [3, 3, 3]]] * 2,
        )
        with open(ncp, "w") as f:
            json.dump(nc, f)
    model = Model.from_setup(setup_dirs[0])
    state, _ = create_train_state(model, jax.random.PRNGKey(0))
    save_checkpoint(setup_dirs[0], state, 1)

    cfg = {"predict": {"vol": {
        "raw_dataset": f"{container}/raw",
        "voxel_size": list(vs),
        "output_container": container,
        "chain": [{
            "setup_dir": setup_dirs[0],
            "checkpoint_iteration": 1,
            "output_prefix": "stream",
        }],
    }}}
    cfg_path = os.path.join(args.out, "predict.toml")
    tomlio.dump(cfg, cfg_path)

    # --- production streamed predict over the full deep volume --------
    os.environ["BS_ZSTREAM"] = "1"
    t0 = time.time()
    res = run_prediction(cfg_path)
    stream_wall = time.time() - t0
    stats = next(iter(res.values()))
    assert "columns" in stats, f"z-stream not selected: {stats}"

    # --- tiled equality spot check on a subvolume ---------------------
    cfg["predict"]["vol"]["chain"][0]["output_prefix"] = "tiled"
    tomlio.dump(cfg, cfg_path)
    os.environ["BS_ZSTREAM"] = "0"
    check_z = args.check_slices * vs[0]
    t0 = time.time()
    run_prediction(
        cfg_path, roi_offset=(0, 0, 0),
        roi_shape=(check_z, *raw.roi.shape[1:]),
    )
    tiled_wall = time.time() - t0
    os.environ.pop("BS_ZSTREAM", None)

    a = open_ds(f"{container}/stream/3d_affs").to_ndarray(
        open_ds(f"{container}/tiled/3d_affs").roi
    ).astype(np.int16)
    b = open_ds(f"{container}/tiled/3d_affs").to_ndarray().astype(
        np.int16
    )
    diff = np.abs(a - b)
    check_vox = args.check_slices * shape[1] * shape[2]

    print(json.dumps({
        "volume": "x".join(map(str, shape)),
        "n_voxels": nvox,
        "make_volume_s": make_s,
        "stream_wall_s": round(stream_wall, 1),
        "stream_mvox_per_s_wall": round(nvox / stream_wall / 1e6, 2),
        "stream_mvox_per_s_predictor": round(
            stats["voxels_per_sec"] / 1e6, 2
        ),
        "columns": stats["columns"],
        "steps_per_column": stats["steps_per_column"],
        "tiled_subvol_mvox_per_s_wall": round(
            check_vox / tiled_wall / 1e6, 2
        ),
        # bf16 tolerance: the two paths are different XLA executables,
        # so logits differ by bf16 reassociation noise (the float32
        # equality tests in tests/test_zstream_predict.py pin the exact
        # semantics); expect p99.9 within a few uint8 steps
        "equality": {
            "max_abs_diff_uint8": int(diff.max()),
            "p999_abs_diff_uint8": int(np.percentile(diff, 99.9)),
            "mean_abs_diff_uint8": round(float(diff.mean()), 3),
            "frac_diff_nonzero": float((diff != 0).mean()),
        },
    }), flush=True)


if __name__ == "__main__":
    main()
