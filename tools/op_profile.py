"""Capture a TPU trace of the 3d_affs inference tile and print the
per-op-category time breakdown (where the non-MXU time goes).

Usage: python tools/op_profile.py [z,y,x]
"""

import glob
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    shape = (152, 412, 412)
    if len(sys.argv) > 1:
        shape = tuple(int(v) for v in sys.argv[1].split(","))
    import jax
    import jax.numpy as jnp

    from bootstrapper_tpu.models import Model

    model = Model.from_setup("3d_affs")
    params = model.init(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)
    fwd = jax.jit(lambda p, x: model.apply(p, x)["3d_affs"])
    xs = [
        jax.random.uniform(k, (1, *shape, 1), jnp.bfloat16)
        for k in jax.random.split(jax.random.PRNGKey(1), 3)
    ]
    y = fwd(params, xs[0])
    _ = float(y.mean())  # warm up + force

    trace_dir = "/root/scratch/trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for x in xs:
            y = fwd(params, x)
        _ = float(y.mean())

    xplanes = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    print("xplane files:", xplanes)
    if not xplanes:
        return
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data

        data, _ = raw_to_tool_data.xspace_to_tool_data(
            xplanes, "op_profile", {}
        )
        out = os.path.join(trace_dir, "op_profile.json")
        mode = "wb" if isinstance(data, bytes) else "w"
        with open(out, mode) as f:
            f.write(data)
        print("wrote", out)
    except Exception as e:
        print("op_profile conversion failed:", e)
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data

        data, _ = raw_to_tool_data.xspace_to_tool_data(
            xplanes, "framework_op_stats", {}
        )
        out = os.path.join(trace_dir, "op_stats.json")
        mode = "wb" if isinstance(data, bytes) else "w"
        with open(out, mode) as f:
            f.write(data)
        print("wrote", out)
    except Exception as e:
        print("op_stats conversion failed:", e)


if __name__ == "__main__":
    main()
