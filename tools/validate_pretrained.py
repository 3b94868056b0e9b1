"""Smoke-validate the shipped refiner checkpoints on the TPU.

For each pretrained/<setup> checkpoint: generate a synthetic labelled
volume, build the setup's *inputs* (2D LSDs / affs of an obfuscated
copy — exactly the training distribution), run the refiner, and check
the predicted 3D affinities separate ground-truth boundaries from
interiors (the transfer property the reference's release checkpoints
promise, reference ``bootstrapper/configs.py:354-382``).

Prints one JSON line per setup.
"""

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def validate(name: str) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bootstrapper_tpu.models import Model
    from bootstrapper_tpu.pipeline.synthetic import (
        MAX_LABELS,
        make_synth_device_transform,
    )
    from bootstrapper_tpu.train.loop import latest_checkpoint, load_params
    from bootstrapper_tpu.train.sampler import fold_ids_u32
    from bootstrapper_tpu.train.synth import synthetic_pair

    setup_dir = os.path.join(HERE, "pretrained", name)
    ckpt = latest_checkpoint(setup_dir)
    if not ckpt:
        return {"setup": name, "ok": False, "error": "no checkpoint"}
    model = Model.from_setup(setup_dir)
    params = load_params(ckpt)

    rng = np.random.default_rng(123)
    clean, obf = synthetic_pair(rng, shape=tuple(model.input_shape))
    transform = make_synth_device_transform(
        model.net_config, (1, 1, 1)
    )
    x, targets, weights = transform(
        jax.random.PRNGKey(0),
        jnp.asarray(fold_ids_u32(clean)),
        jnp.asarray(fold_ids_u32(obf)),
    )
    preds = model.apply(params, x[None])["3d_affs"][0]
    gt = np.asarray(targets["3d_affs"])
    pred = np.asarray(preds, np.float32)

    boundary = gt[..., :3].max(axis=-1) < 0.5
    interior = gt[..., :3].min(axis=-1) > 0.5
    mean_b = float(pred[..., :3].mean(axis=-1)[boundary].mean())
    mean_i = float(pred[..., :3].mean(axis=-1)[interior].mean())
    return {
        "setup": name,
        "checkpoint": os.path.basename(ckpt),
        "boundary_aff": round(mean_b, 3),
        "interior_aff": round(mean_i, 3),
        "separation": round(mean_i - mean_b, 3),
        "ok": mean_i - mean_b > 0.2,
    }


def main():
    names = sys.argv[1:] or sorted(os.listdir(os.path.join(HERE, "pretrained")))
    for name in names:
        if not os.path.isdir(os.path.join(HERE, "pretrained", name)):
            continue
        try:
            res = validate(name)
        except Exception as e:
            res = {"setup": name, "ok": False, "error": repr(e)[-300:]}
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
