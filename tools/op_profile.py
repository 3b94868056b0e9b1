"""Capture a TPU trace of the 3d_affs inference tile and print the
per-op-category time breakdown (where the non-MXU time goes).

Usage: python tools/op_profile.py [z,y,x]
"""

import glob
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "tools"))
# must be set before anything drags protobuf in, or the generated
# xplane module trips the C-extension descriptor check
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


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
    params = jax.jit(model.prefold)(params)  # match the production graph
    from bootstrapper_tpu.utils.xla import bs_jit  # honors BS_XLA_OPTS

    fwd = bs_jit(lambda p, x: model.apply(p, x)["3d_affs"])
    xs = [
        jax.random.uniform(k, (1, *shape, 1), jnp.bfloat16)
        for k in jax.random.split(jax.random.PRNGKey(1), 3)
    ]
    y = fwd(params, xs[0])
    _ = float(y.mean())  # warm up + force

    import shutil

    trace_dir = os.environ.get("BS_TRACE_DIR") or "/tmp/bs_trace"
    shutil.rmtree(trace_dir, ignore_errors=True)
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
    # the tensorboard_plugin_profile converters are broken in this image
    # (protobuf descriptor mismatch + missing pywrap symbol); our own
    # XSpace analyzer prints the category shares and top ops directly
    from xplane_report import main as report

    sys.argv = [sys.argv[0], trace_dir]
    report()


if __name__ == "__main__":
    main()
