"""On-chip A/B: overlap-save z-streaming steady step vs the static tile.

Times (a) the static headline tile forward ((152,540,540) -> 124 out z)
and (b) the streaming steady step (124 new input slices -> 124 output
slices, caches carried on device) at the same xy.  Both produce the
same 124x448x448 output per step; streaming skips the 28-slice z
context recompute (~7.6% of conv FLOPs — see models/zstream.py).

Unlike tiling, overlap-save makes FLOP/voxel independent of the z step
``s`` (context is never recomputed), so small ``s`` trades nothing but
dispatch overhead for a much smaller temp arena — the probe's job is to
find the (s, xy) sweet spot, not just to A/B the headline shape.

Usage: python tools/zstream_probe.py [s] [xy_increase] [iters] [--no-static]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bootstrapper_tpu.models import Model
from bootstrapper_tpu.models.zstream import z_context
from bootstrapper_tpu.utils.xla import bs_jit, tpu_default_options


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    do_static = "--no-static" not in sys.argv
    s = int(args[0]) if len(args) > 0 else 124
    xy_inc = int(args[1]) if len(args) > 1 else 344
    iters = int(args[2]) if len(args) > 2 else 8

    model = Model.from_setup("3d_affs")
    cfg = model.unet_config
    ctx = z_context(cfg)
    nc = model.net_config
    xy_in = nc["input_shape"][1] + xy_inc
    params = model.init(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16), params
    )
    params = jax.jit(model.prefold)(params)

    def fwd_static(params, x):
        return model.apply(params, x)["3d_affs"]

    def fwd_warm(params, x):
        outs, st = model.apply_stream(params, x, None)
        return outs["3d_affs"], st

    static = bs_jit(fwd_static, compiler_options=tpu_default_options())
    warm = bs_jit(fwd_warm, compiler_options=tpu_default_options())

    def fwd_steady(params, x, st):
        outs, st2 = model.apply_stream(params, x, st)
        return outs["3d_affs"], st2

    steady = bs_jit(
        fwd_steady,
        donate_argnums=(2,),  # old caches die as new ones are built
        compiler_options=tpu_default_options(),
    )

    keys = jax.random.split(jax.random.PRNGKey(1), 2)
    x_tile = [
        jax.random.uniform(k, (1, s + ctx, xy_in, xy_in, 1), jnp.bfloat16)
        for k in keys
    ]
    x_step = [x[:, :s] for x in x_tile]

    # --- static tile ---------------------------------------------------
    dt_static = None
    if do_static:
        out = static(params, x_tile[0])
        print("static out", out.shape, flush=True)
        for x in x_tile:
            float(static(params, x).mean())
        t0 = time.perf_counter()
        for i in range(iters):
            float(static(params, x_tile[i % 2]).mean())
        dt_static = (time.perf_counter() - t0) / iters
        out_vox = int(out.shape[1] * out.shape[2] * out.shape[3])
        print(f"static: {dt_static*1e3:.1f} ms/tile  "
              f"{out_vox/dt_static/1e6:.2f} Mvox/s", flush=True)

    # --- streaming -----------------------------------------------------
    y, st = warm(params, x_tile[0])
    print("warm out", y.shape, flush=True)
    float(y.mean())
    out_vox = int(y.shape[1] * y.shape[2] * y.shape[3])
    try:
        mem = steady.lower(params, x_step[0], st).compile().memory_analysis()
        print(f"steady temp arena: {mem.temp_size_in_bytes/2**30:.2f} G",
              flush=True)
    except Exception:
        pass
    y, st = steady(params, x_step[0], st)
    float(y.mean())
    y, st = steady(params, x_step[1], st)
    float(y.mean())
    t0 = time.perf_counter()
    for i in range(iters):
        y, st = steady(params, x_step[i % 2], st)
        float(y.mean())
    dt = (time.perf_counter() - t0) / iters
    vs = (
        f"  (+{(dt_static / dt - 1) * 100:.1f}% vs static)"
        if dt_static is not None
        else ""
    )
    print(f"steady: {dt*1e3:.1f} ms/step  "
          f"{out_vox/dt/1e6:.2f} Mvox/s{vs}", flush=True)

    # warmup amortisation at a realistic column depth
    t0 = time.perf_counter()
    y, st = warm(params, x_tile[0])
    float(y.mean())
    dt_warm = time.perf_counter() - t0
    print(f"warmup: {dt_warm*1e3:.1f} ms", flush=True)
    for n in (4, 8, 16):
        eff = out_vox * n / (dt_warm + dt * (n - 1)) / 1e6
        print(f"column of {n} steps ({n*y.shape[1]} z): "
              f"{eff:.2f} Mvox/s", flush=True)


if __name__ == "__main__":
    main()
