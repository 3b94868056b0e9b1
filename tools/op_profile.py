"""Capture a TPU trace of the 3d_affs inference tile and print the
per-op-category time breakdown (where the non-MXU time goes).

Usage: python tools/op_profile.py [z,y,x]
       python tools/op_profile.py --stream [s,xy_in]

``--stream`` profiles the overlap-save z-streaming STEADY step
(predict/zstream.py) instead of the static tile: the trace covers
steady steps only (warm runs outside the trace), so the breakdown
shows the per-step cache-concat/FIFO overhead that the tiled graph
does not have. Default (s, xy_in) = the planner's deep-volume pick.
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
    stream = "--stream" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    import jax
    import jax.numpy as jnp

    from bootstrapper_tpu.models import Model

    model = Model.from_setup("3d_affs")
    params = model.init(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)
    params = jax.jit(model.prefold)(params)  # match the production graph
    from bootstrapper_tpu.utils.xla import bs_jit  # honors BS_XLA_OPTS

    if stream:
        from bootstrapper_tpu.models.zstream import z_context
        from bootstrapper_tpu.predict.zstream import plan_stream

        if args:
            s, xy_in = (int(v) for v in args[0].split(","))
        else:
            inc, s, _ = plan_stream(
                model.net_config, (4000, 4000, 4000)
            )
            xy_in = model.net_config["input_shape"][1] + inc[1]
        ctx = z_context(model.unet_config)

        def fwd_warm(p, x):
            outs, st = model.apply_stream(p, x, None)
            return outs["3d_affs"], st

        def fwd_steady(p, x, st):
            outs, st2 = model.apply_stream(p, x, st)
            return outs["3d_affs"], st2

        warm = bs_jit(fwd_warm)
        steady = bs_jit(fwd_steady, donate_argnums=(2,))
        keys = jax.random.split(jax.random.PRNGKey(1), 3)
        x_warm = jax.random.uniform(
            keys[0], (1, s + ctx, xy_in, xy_in, 1), jnp.bfloat16
        )
        xs = [
            jax.random.uniform(k, (1, s, xy_in, xy_in, 1), jnp.bfloat16)
            for k in keys
        ]
        print(f"stream steady step: s={s} xy_in={xy_in}")
        y, st = warm(params, x_warm)
        _ = float(y.mean())
        y, st = steady(params, xs[0], st)  # compile outside the trace
        _ = float(y.mean())

        def run_once(x):
            nonlocal st
            y, st = steady(params, x, st)
            return y
    else:
        shape = (152, 412, 412)
        if args:
            shape = tuple(int(v) for v in args[0].split(","))

        fwd = bs_jit(lambda p, x: model.apply(p, x)["3d_affs"])
        xs = [
            jax.random.uniform(k, (1, *shape, 1), jnp.bfloat16)
            for k in jax.random.split(jax.random.PRNGKey(1), 3)
        ]
        y = fwd(params, xs[0])
        _ = float(y.mean())  # warm up + force

        def run_once(x):
            return fwd(params, x)

    import shutil

    trace_dir = os.environ.get("BS_TRACE_DIR") or "/tmp/bs_trace"
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        for x in xs:
            y = run_once(x)
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
