"""Time several U-Net graph variants in one process (same relay/session)
so variant deltas aren't confounded by tunnel variance.

Usage: python tools/variant_bench.py [z,y,x [z,y,x...]]
"""

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def bench_one(model_ctor, shape, iters=8):
    import jax
    import jax.numpy as jnp

    from bootstrapper_tpu.models.unet import compute_output_shape

    model = model_ctor()
    params = model.init(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)
    fwd = jax.jit(lambda p, x: model.apply(p, x)["3d_affs"])
    # two resident inputs only: borderline variants (the adaptive-slab
    # graph's temp arena is ~300 MB under HBM at the 540 tile) OOM with
    # four pre-staged inputs but run with two (see BASELINE.md round-3
    # late-session A/B)
    xs = [
        jax.random.uniform(k, (1, *shape, 1), jnp.bfloat16)
        for k in jax.random.split(jax.random.PRNGKey(1), 2)
    ]
    t0 = time.time()
    y = fwd(params, xs[0])
    _ = float(y.mean())
    compile_s = time.time() - t0
    times = []
    for i in range(iters):
        x = xs[(i + 1) % len(xs)]
        t0 = time.time()
        y = fwd(params, x)
        _ = float(y.mean())
        times.append(time.time() - t0)
    times = sorted(times)[: max(1, iters * 3 // 4)]
    dt = sum(times) / len(times)
    import numpy as np

    out_shape = compute_output_shape(model.unet_config, shape)
    vox = int(np.prod(out_shape))
    return {
        "ms": round(dt * 1000, 1),
        "mvox_s": round(vox / dt / 1e6, 2),
        "compile_s": round(compile_s, 1),
    }


def main():
    shapes = [tuple(int(v) for v in a.split(",")) for a in sys.argv[1:]] or [
        (152, 412, 412)
    ]
    from bootstrapper_tpu.models import Model

    def make(fold=True):
        nc = dict(Model.from_setup("3d_affs").net_config)
        nc["fold_xy"] = fold
        return Model(nc)

    variants = [
        ("nofold", lambda: make(False), {}),
        ("auto", lambda: make(True), {}),
        ("all-lazy", lambda: make(True), {"BS_LAZY_UP_BYTES": "0"}),
        # fully-materialised upsamples: XLA's own cost model scores this
        # ~7% under 'auto' at the 412 tile (tools/layout_probe.py sweep);
        # may OOM the 540 tile — runs last, errors are recorded
        ("materialized", lambda: make(True), {"BS_LAZY_UP_BYTES": "1e18"}),
        # z-slab decode: per-level slab buffers drop under the lazy
        # threshold, so every level takes the materialised (best-MXU)
        # form at a 13%-FLOP halo cost (models/unet.py _z_slab_decode)
        ("slab4", lambda: make(True), {"BS_DECODE_Z_SLABS": "4"}),
        ("slab2", lambda: make(True), {"BS_DECODE_Z_SLABS": "2"}),
        # adaptive slabs + optimization_barrier pinning per-slab
        # relayouts below the z slices — the default since round 3;
        # 'nobarrier' is the unpinned (round-2 'auto') graph
        ("barrier", lambda: make(True), {"BS_SLAB_BARRIER": "1"}),
        ("nobarrier", lambda: make(True), {"BS_SLAB_BARRIER": "0"}),
        # dynamic int8 convs (ops/quant.py): 2x MXU peak if XLA maps
        # s8 convs onto the int8 systolic path
        ("int8", lambda: make(True), {"BS_INT8": "1"}),
    ]
    only = os.environ.get("BS_VARIANTS")
    if only:
        names = set(only.split(","))
        variants = [v for v in variants if v[0] in names]
    for shape in shapes:
        for name, ctor, env in variants:
            for k, v in env.items():
                os.environ[k] = v
            try:
                res = bench_one(ctor, shape)
                print(json.dumps({"variant": name, "shape": shape, **res}),
                      flush=True)
            except Exception as e:
                print(json.dumps({"variant": name, "shape": shape,
                                  "error": str(e)[-300:]}), flush=True)
            for k in env:
                del os.environ[k]


if __name__ == "__main__":
    main()
