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


def prune_checkpoints(setup_dir: str, keep: int = 1, slim: bool = True):
    """Keep only the newest ``keep`` checkpoints and strip optimiser
    state from the survivors (release artefacts ~3x smaller; resume
    re-inits Adam, which recovers within ~100 iterations)."""
    import re

    import numpy as np

    ckpts = []
    for name in os.listdir(setup_dir):
        m = re.match(r"model_checkpoint_(\d+)$", name)
        if m:
            ckpts.append((int(m.group(1)), name))
    ckpts.sort()
    for _, name in ckpts[:-keep]:
        os.remove(os.path.join(setup_dir, name))
    if not slim:
        return
    for _, name in ckpts[-keep:]:
        path = os.path.join(setup_dir, name)
        data = np.load(path)
        if not any(k.startswith("opt/") for k in data.files):
            continue
        arrays = {
            k: data[k] for k in data.files if not k.startswith("opt/")
        }
        with open(path + ".tmp", "wb") as f:
            np.savez(f, **arrays)
        os.replace(path + ".tmp", path)


def train_one(name, iters, save_every, chunk, deadline=None) -> dict:
    """Train in fresh-subprocess chunks (auto-resume stitches them): the
    long-lived training process slows ~3x over a few thousand
    iterations on this host, so bounded chunks keep the average rate."""
    import subprocess
    import re

    from bootstrapper_tpu.models.zoo import write_net_config
    from bootstrapper_tpu.utils import tomlio

    setup_dir = os.path.join(HERE, "pretrained", name)
    write_net_config(name, setup_dir)
    toml_path = os.path.join(setup_dir, "train.toml")
    t0 = time.time()

    def done_iters():
        best = 0
        for n in os.listdir(setup_dir):
            m = re.match(r"model_checkpoint_(\d+)$", n)
            if m:
                best = max(best, int(m.group(1)))
        return best

    while done_iters() < iters:
        if deadline and time.time() > deadline:
            break
        target = min(iters, done_iters() + chunk)
        cfg = {
            "setup_dir": setup_dir,
            "voxel_size": [1, 1, 1],
            "max_iterations": target,
            "save_checkpoints_every": save_every,
            "save_snapshots_every": 0,
        }
        tomlio.dump({"train": cfg}, toml_path)
        code = (
            f"import sys; sys.path.insert(0, {HERE!r})\n"
            "from bootstrapper_tpu.workflows.train import run_training\n"
            f"run_training({toml_path!r})\n"
        )
        proc = subprocess.run([sys.executable, "-c", code])
        if proc.returncode != 0:
            return {
                "iterations": done_iters(), "wall_s": round(time.time() - t0),
                "error": f"chunk rc={proc.returncode}",
            }
    prune_checkpoints(setup_dir)
    return {"iterations": done_iters(), "wall_s": round(time.time() - t0, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10000)
    ap.add_argument("--save-every", type=int, default=1000)
    ap.add_argument("--chunk", type=int, default=2000)
    ap.add_argument("--setups", default=",".join(REFINERS))
    ap.add_argument("--deadline", type=float, default=None,
                    help="unix time after which no new chunk starts")
    args = ap.parse_args()
    for name in args.setups.split(","):
        if args.deadline and time.time() > args.deadline:
            print(json.dumps({"setup": name, "skipped": "deadline"}),
                  flush=True)
            continue
        print(f"=== training {name} to {args.iters} iterations", flush=True)
        res = train_one(name, args.iters, args.save_every, args.chunk,
                        args.deadline)
        print(json.dumps({"setup": name, **res}), flush=True)


if __name__ == "__main__":
    main()
