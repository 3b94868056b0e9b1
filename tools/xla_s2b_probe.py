"""Probe the XLA:TPU space-to-batch crash on folded-conv gradients.

Round-2 finding (BASELINE.md, NEXT.md): compiling the *gradient* graph
of channel-split or space-to-depth-folded convolutions crashes XLA:TPU
with a CHECK failure in ``space_to_batch_converter.cc:543``, so training
runs the plain unfolded graph (``fold_xy`` gate in workflows/train.py)
and only inference gets the fold's MXU win.

RESOLVED (round 3). Two findings close this:

1. **Bypass exists**: the offending pass can be disabled per-executable
   with ``jax.jit(step).lower(...).compile(compiler_options=
   {"xla_disable_hlo_passes": "space-to-batch-converter"})`` — the
   public DebugOptions pass-disable flag is honored by the relay's
   server-side TPU compiler (client-side XLA_FLAGS fatally rejects
   TPU-private flag names, so compiler_options is the only channel).
   Under it the full folded train step compiles and runs.

2. **Folded training is a measured NEGATIVE** (v5e, reference train
   tile 32x196x196, batch 1, 12-iter steady state):

       unfolded + default (s2b on)    133.8 ms/step   <- production
       folded   + s2b disabled        220.6 ms/step   (+65%)
       unfolded + s2b disabled        275.9 ms/step   (+106%)

   The space-to-batch pass is what makes small-tile conv *training*
   fast (it moves spatial extent into batch for the tiny 4x104x104
   output's gradient convs); the space-to-depth fold cannot compensate
   because at training tiles the MXU is starved by output size, not
   lane count. The ``fold_xy`` gate in workflows/train.py is therefore
   the *faster* configuration, not a workaround — do not re-chase
   folded training unless the train tile grows ~4x in xy.

This tool remains the contained repro/bisect harness, compiling each
candidate in a fresh subprocess (a CHECK failure takes the process
down, sometimes the relay session with it — run this only when nothing
else is using the chip):

    python tools/xla_s2b_probe.py            # probe all XLA_FLAGS candidates
    python tools/xla_s2b_probe.py --bare     # just the minimal repro
    python tools/xla_s2b_probe.py --graphs --copt   # graduated graphs
        # with the space-to-batch converter disabled via compiler_options

Outcome per candidate: 'ok' (compiled), 'crash' (CHECK), 'error'.
"""

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Candidate debug options that plausibly gate the space-to-batch
# converter on TPU (names vary across XLA versions; unknown flags are
# reported as 'badflag' and skipped).
CANDIDATE_FLAGS = [
    "",  # bare repro
    "--xla_tpu_enable_space_to_batch=false",
    "--xla_enable_space_to_batch=false",
    "--xla_tpu_conv_space_to_batch=false",
    "--xla_space_to_batch_converter=false",
]

REPRO = r"""
import sys
sys.path.insert(0, {here!r})
import jax, jax.numpy as jnp
from bootstrapper_tpu.models import fold as F

# minimal folded conv: (1,3,3) kernel folded to (1,2,2) over 4x channels,
# gradient graph compiled for TPU
def loss(w, b, xf):
    y = F.folded_conv(xf, w, b, compute_dtype=jnp.bfloat16)
    return jnp.sum(y.astype(jnp.float32) ** 2)

w = jnp.zeros((1, 3, 3, 4, 8), jnp.float32)
b = jnp.zeros((8,), jnp.float32)
xf = jnp.zeros((1, 4, 32, 32, 16), jnp.float32)
g = jax.jit(jax.grad(loss))
g.lower(w, b, xf).compile()
print("COMPILED_OK")
"""

# Graduated bisect graphs between the minimal repro (compiles) and the
# full folded train step (CHECK-fails): each candidate grad-compiles one
# more construct of the real training graph. The first 'crash' names the
# offending construct.
GRADUATED = {
    # folded conv -> phase-max pool -> folded conv
    "pool": r"""
import sys
sys.path.insert(0, {here!r})
import jax, jax.numpy as jnp
from bootstrapper_tpu.models import fold as F

def loss(w1, w2, b1, b2, xf):
    y = F.folded_conv(xf, w1, b1, compute_dtype=jnp.bfloat16)
    y = F.folded_pool_122(y)
    y = F.folded_conv(y, w2, b2, compute_dtype=jnp.bfloat16)
    return jnp.sum(y.astype(jnp.float32) ** 2)

w1 = jnp.zeros((1, 3, 3, 4, 8), jnp.float32)
w2 = jnp.zeros((1, 3, 3, 8, 8), jnp.float32)
b1 = jnp.zeros((8,), jnp.float32)
b2 = jnp.zeros((8,), jnp.float32)
# folded 3-tap is 2-tap over folded positions: 35 -> 34, even for the
# folded (1,2,2) pool's 2x2 reshape
xf = jnp.zeros((1, 4, 35, 35, 16), jnp.float32)
jax.jit(jax.grad(loss)).lower(w1, w2, b1, b2, xf).compile()
print("COMPILED_OK")
""",
    # minimal folded conv at the real training tile's folded geometry
    "trainshape": r"""
import sys
sys.path.insert(0, {here!r})
import jax, jax.numpy as jnp
from bootstrapper_tpu.models import fold as F

def loss(w, b, xf):
    y = F.folded_conv(xf, w, b, compute_dtype=jnp.bfloat16)
    return jnp.sum(y.astype(jnp.float32) ** 2)

w = jnp.zeros((1, 3, 3, 1, 48), jnp.float32)  # unfolded 1-ch raw -> 48
b = jnp.zeros((48,), jnp.float32)
xf = jnp.zeros((1, 32, 98, 98, 4), jnp.float32)  # (32,196,196) folded
jax.jit(jax.grad(loss)).lower(w, b, xf).compile()
print("COMPILED_OK")
""",
    # full folded U-Net forward, gradient of a scalar loss (tiny tile)
    "unet_tiny": r"""
import sys
sys.path.insert(0, {here!r})
import jax, jax.numpy as jnp
from bootstrapper_tpu.models import Model

nc = dict(Model.from_setup("3d_affs").net_config)
nc.update(num_fmaps=4, fmap_inc_factor=2,
          input_shape=[12, 48, 48], output_shape=[4, 8, 8],
          shape_increase=[0, 0, 0],
          downsample_factors=[[1, 2, 2]] * 2,
          kernel_size_down=[[[1, 3, 3], [1, 3, 3]],
                            [[3, 3, 3], [3, 3, 3]],
                            [[3, 3, 3], [3, 3, 3]]],
          kernel_size_up=[[[1, 3, 3], [1, 3, 3]],
                          [[1, 3, 3], [1, 3, 3]]],
          fold_xy=True)
m = Model(nc)
params = m.init(jax.random.PRNGKey(0))

def loss(params, x):
    out = m.apply(params, x)["3d_affs"]
    return jnp.sum(out.astype(jnp.float32) ** 2)

x = jnp.zeros((1, 12, 48, 48, 1), jnp.bfloat16)
jax.jit(jax.grad(loss)).lower(params, x).compile()
print("COMPILED_OK")
""",
    # full folded U-Net gradient at the REFERENCE training tile
    "unet_trainshape": r"""
import sys
sys.path.insert(0, {here!r})
import jax, jax.numpy as jnp
from bootstrapper_tpu.models import Model

nc = dict(Model.from_setup("3d_affs").net_config)
nc["fold_xy"] = True
m = Model(nc)
params = m.init(jax.random.PRNGKey(0))

def loss(params, x):
    out = m.apply(params, x)["3d_affs"]
    return jnp.sum(out.astype(jnp.float32) ** 2)

x = jnp.zeros((1, 32, 196, 196, 1), jnp.bfloat16)
jax.jit(jax.grad(loss)).lower(params, x).compile()
print("COMPILED_OK")
""",
    # the real train step (fwd+bwd+adam) with the fold enabled
    "trainstep": r"""
import sys
sys.path.insert(0, {here!r})
import jax, jax.numpy as jnp
from bootstrapper_tpu.models import Model
from bootstrapper_tpu.train import create_train_state, make_train_step

nc = dict(Model.from_setup("3d_affs").net_config)
nc["fold_xy"] = True
m = Model(nc)
state, tx = create_train_state(m, jax.random.PRNGKey(0))
step = jax.jit(make_train_step(m, tx))
dims = m.net_config["outputs"]["3d_affs"]["dims"]
batch = {{
    "input": jnp.zeros((1, 32, 196, 196, 1), jnp.bfloat16),
    "targets": {{"3d_affs": jnp.zeros((1, 4, 104, 104, dims), jnp.bfloat16)}},
    "weights": {{"3d_affs": jnp.ones((1, 4, 104, 104, dims), jnp.bfloat16)}},
}}
step.lower(state, batch).compile()
print("COMPILED_OK")
""",
}


def probe(flag: str, timeout: int = 1800, code: str = None) -> str:
    env = dict(os.environ)
    if flag:
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flag).strip()
    if code is None:
        code = REPRO.format(here=HERE)
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            env=env, capture_output=True, text=True, timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return "timeout"
    out = proc.stdout + proc.stderr
    if "COMPILED_OK" in out:
        return "ok"
    if "Unknown flag" in out or "unknown flag" in out:
        return "badflag"
    if proc.returncode != 0:
        if "space_to_batch" in out or proc.returncode < 0:
            return "crash"
        return f"error rc={proc.returncode}"
    return "unknown"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bare", action="store_true",
                    help="only the flagless minimal repro")
    ap.add_argument("--graphs", action="store_true",
                    help="bisect: grad-compile the graduated graphs "
                         "between the minimal repro and the full train "
                         "step; first crash names the construct")
    ap.add_argument("--flag", default="",
                    help="XLA flag to apply to every graduated graph")
    ap.add_argument("--copt", action="store_true",
                    help="disable the space-to-batch converter via "
                         "compiler_options (the channel that actually "
                         "reaches the relay's server-side compiler; "
                         "XLA_FLAGS cannot carry TPU-private flags)")
    args = ap.parse_args()
    results = {}
    if args.graphs:
        for name in ["bare", *GRADUATED]:
            code = (REPRO if name == "bare" else GRADUATED[name]).format(
                here=HERE
            )
            if args.copt:
                code = code.replace(
                    ".compile()",
                    '.compile(compiler_options={"xla_disable_hlo_passes":'
                    ' "space-to-batch-converter"})',
                )
            print(f"probing graph {name} ...", flush=True)
            results[name] = probe(args.flag, code=code)
            print(f"  -> {results[name]}", flush=True)
        print(json.dumps(results))
        return
    flags = [""] if args.bare else CANDIDATE_FLAGS
    code = REPRO.format(here=HERE)
    if args.copt:  # apply the bypass in bare/candidate modes too
        code = code.replace(
            ".compile()",
            '.compile(compiler_options={"xla_disable_hlo_passes":'
            ' "space-to-batch-converter"})',
        )
    for flag in flags:
        label = flag or "<none>"
        print(f"probing {label} ...", flush=True)
        results[label] = probe(flag, code=code)
        print(f"  -> {results[label]}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
