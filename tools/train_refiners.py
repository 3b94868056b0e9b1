"""Train the 4 synthetic-data refiner setups and ship their checkpoints.

The reference distributes release checkpoints for the ``3d_affs_from_*``
models, trained purely on synthetic labels so they transfer across
datasets (reference ``bootstrapper/configs.py:34-39,354-382``,
``models/3d_affs_from_*/train.py``).  This tool reproduces those
artefacts on TPU: each setup trains under ``pretrained/<name>/`` with
auto-resume, so repeated invocations extend training.

Usage: python tools/train_refiners.py [--iters N] [--setups a,b,...]
"""

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

REFINERS = [
    "3d_affs_from_2d_mtlsd",
    "3d_affs_from_2d_lsd",
    "3d_affs_from_2d_affs",
    "3d_affs_from_3d_lsd",
]


def prune_checkpoints(setup_dir: str, keep: int = 1):
    """Keep only the newest ``keep`` checkpoints (release artefacts stay
    small; auto-resume only ever reads the latest)."""
    import re

    ckpts = []
    for name in os.listdir(setup_dir):
        m = re.match(r"model_checkpoint_(\d+)$", name)
        if m:
            ckpts.append((int(m.group(1)), name))
    for _, name in sorted(ckpts)[:-keep]:
        os.remove(os.path.join(setup_dir, name))


def train_one(name: str, iters: int, save_every: int) -> dict:
    from bootstrapper_tpu.models.zoo import write_net_config
    from bootstrapper_tpu.utils import tomlio
    from bootstrapper_tpu.workflows.train import run_training

    setup_dir = os.path.join(HERE, "pretrained", name)
    write_net_config(name, setup_dir)
    cfg = {
        "setup_dir": setup_dir,
        "voxel_size": [1, 1, 1],
        "max_iterations": iters,
        "save_checkpoints_every": save_every,
        "save_snapshots_every": 0,
    }
    toml_path = os.path.join(setup_dir, "train.toml")
    tomlio.dump({"train": cfg}, toml_path)
    t0 = time.time()
    result = run_training(toml_path)
    result["wall_s"] = round(time.time() - t0, 1)
    prune_checkpoints(setup_dir)
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10000)
    ap.add_argument("--save-every", type=int, default=1000)
    ap.add_argument("--setups", default=",".join(REFINERS))
    args = ap.parse_args()
    for name in args.setups.split(","):
        print(f"=== training {name} to {args.iters} iterations", flush=True)
        res = train_one(name, args.iters, args.save_every)
        print(json.dumps({"setup": name, **res}), flush=True)


if __name__ == "__main__":
    main()
