"""Probe the XLA:TPU space-to-batch crash on folded-conv gradients.

Round-2 finding (BASELINE.md, NEXT.md): compiling the *gradient* graph
of channel-split or space-to-depth-folded convolutions crashes XLA:TPU
with a CHECK failure in ``space_to_batch_converter.cc:543``, so training
runs the plain unfolded graph (``fold_xy`` gate in workflows/train.py)
and only inference gets the fold's MXU win.

This tool isolates the repro to its minimal form and probes whether any
XLA debug flag disables the offending pass, compiling each candidate in
a fresh subprocess (a CHECK failure takes the process down, sometimes
the relay session with it — run this only when nothing else is using
the chip):

    python tools/xla_s2b_probe.py            # probe all candidates
    python tools/xla_s2b_probe.py --bare     # just the minimal repro

Outcome per candidate: 'ok' (compiled), 'crash' (CHECK), 'error'.
If a flag compiles, workflows/train.py can enable folded training under
that flag; otherwise this file *is* the documented minimal repro.
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


def probe(flag: str, timeout: int = 1800) -> str:
    env = dict(os.environ)
    if flag:
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flag).strip()
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
    args = ap.parse_args()
    flags = [""] if args.bare else CANDIDATE_FLAGS
    results = {}
    for flag in flags:
        label = flag or "<none>"
        print(f"probing {label} ...", flush=True)
        results[label] = probe(flag)
        print(f"  -> {results[label]}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
