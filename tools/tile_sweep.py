"""Sweep 3d_affs inference tile shapes on the real TPU and report
throughput per tile. Each shape runs in a subprocess so an OOM-ing
compile doesn't kill the sweep.

Usage: python tools/tile_sweep.py [--fold/--no-fold] [shapes...]
Shapes as z,y,x input sizes, e.g. 152,412,412. Results appended as JSON
lines to tile_sweep_results.jsonl in the CWD.
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, {here!r})
import jax, jax.numpy as jnp
from bootstrapper_tpu.models import Model
from bootstrapper_tpu.models.unet import compute_output_shape

fold = {fold!r}
shape = {shape!r}
model = Model.from_setup("3d_affs")
nc = dict(model.net_config)
if not fold:
    nc["fold_xy"] = False
model = Model(nc)
cfg = model.unet_config
import dataclasses
if not fold:
    cfg = dataclasses.replace(cfg, fold_xy=False)
out_shape = compute_output_shape(cfg, shape)
params = model.init(jax.random.PRNGKey(0))
params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)

def forward(params, x):
    outs = Model(nc).apply(params, x)
    return outs["3d_affs"]

if not fold:
    import bootstrapper_tpu.models.unet as U
    U_orig = U._fold_eligible
    U._fold_eligible = lambda *a: False

fwd = jax.jit(forward)
keys = jax.random.split(jax.random.PRNGKey(1), 4)
xs = [jax.random.uniform(k, (1, *shape, 1), jnp.bfloat16) for k in keys]
t0 = time.time()
y = fwd(params, xs[0]); _ = float(y.mean())
compile_s = time.time() - t0
times = []
for i in range(6):
    x = xs[(i + 1) % len(xs)]
    t0 = time.time()
    y = fwd(params, x)
    _ = float(y.mean())  # force readback: block_until_ready lies on axon
    times.append(time.time() - t0)
times = sorted(times)[:4]
dt = sum(times) / len(times)
import numpy as np
vox = int(np.prod(out_shape))
print(json.dumps({
    "shape": shape, "out_shape": list(out_shape), "fold": fold,
    "ms_per_tile": round(dt * 1000, 1),
    "mvox_per_s": round(vox / dt / 1e6, 2),
    "compile_s": round(compile_s, 1),
}))
"""


def run_shape(shape, fold, timeout=5400):
    code = (
        CHILD.replace("{here!r}", repr(HERE))
        .replace("{fold!r}", repr(fold))
        .replace("{shape!r}", repr(list(shape)))
    )
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return {"shape": list(shape), "fold": fold, "error": "timeout"}
    for line in proc.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    return {
        "shape": list(shape), "fold": fold, "rc": proc.returncode,
        "error": (proc.stderr or "")[-800:], "wall_s": round(time.time() - t0),
    }


def main():
    args = sys.argv[1:]
    fold = True
    if "--no-fold" in args:
        fold = False
        args.remove("--no-fold")
    if "--fold" in args:
        args.remove("--fold")
    shapes = [tuple(int(v) for v in a.split(",")) for a in args] or [
        (152, 412, 412),
    ]
    for shape in shapes:
        res = run_shape(shape, fold)
        print(json.dumps(res), flush=True)
        with open("tile_sweep_results.jsonl", "a") as f:
            f.write(json.dumps(res) + "\n")


if __name__ == "__main__":
    main()
