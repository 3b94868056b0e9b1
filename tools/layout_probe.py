"""Compile one 3d_affs graph variant and dump its optimized HLO + cost.

Usage: python tools/layout_probe.py <out_prefix> [z,y,x]
Variant selection is via the fold env knobs read by models/unet.py
(BS_FOLD_MAX_CH, BS_LAZY_UP_BYTES) — set them in the caller's env.
Compile-only: XLA runs remotely but nothing executes on the chip, so
probes are safe while training occupies it.  Writes <out_prefix>.txt
(HLO) and prints the tools/hlo_cost.py category table.
"""

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "tools"))


def main():
    out = sys.argv[1]
    shape = (152, 412, 412)
    if len(sys.argv) > 2:
        shape = tuple(int(v) for v in sys.argv[2].split(","))
    import jax
    import jax.numpy as jnp

    from bootstrapper_tpu.models import Model

    model = Model.from_setup("3d_affs")
    params = model.init(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)
    fwd = jax.jit(lambda p, x: model.apply(p, x)["3d_affs"])
    x = jnp.zeros((1, *shape, 1), jnp.bfloat16)
    t0 = time.time()
    compiled = fwd.lower(params, x).compile()
    print(f"{out}: compile took {time.time() - t0:.1f} s "
          f"(FOLD_MAX_CH={os.environ.get('BS_FOLD_MAX_CH', '')} "
          f"LAZY_UP_BYTES={os.environ.get('BS_LAZY_UP_BYTES', '')})")
    path = out + ".txt"
    with open(path, "w") as f:
        f.write(compiled.as_text())

    from hlo_cost import cost

    rep = cost(path)
    fmt = rep["categories"].get("data formatting", {"cycles": 0})
    sl = rep["categories"].get("slice", {"cycles": 0})
    print(f"total {rep['total_cycles']/1e6:.1f} Mcyc | "
          f"fmt {fmt['cycles']/1e6:.1f} | slice {sl['cycles']/1e6:.1f}")


if __name__ == "__main__":
    main()
