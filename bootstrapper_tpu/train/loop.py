"""pjit-able training loop: state, step function, checkpointing.

Replaces the reference's two trainers — ``gp.torch.Train`` inside the
gunpowder graph (reference ``bootstrapper/models/3d_affs/train.py:149-165``)
and the Lightning DDP loop of the synthetic setups
(``models/3d_affs_from_2d_mtlsd/train.py:333-344``) — with a single
functional JAX step:

- Adam via optax (same default lrs as the reference setups);
- loss = masked weighted MSE summed over output heads;
- the whole step (fwd + bwd + update) is one jitted function, shardable
  over a ``jax.sharding.Mesh``: batch over the ``data`` axis, spatial
  over the ``space`` axis (XLA inserts halo exchanges for the valid
  convolutions automatically under GSPMD);
- checkpoints are ``model_checkpoint_{iter}`` directories (orbax-style
  pytree dumps) for CLI compatibility with the reference naming
  (``models/3d_affs/train.py:163-164``), plus auto-resume from the
  latest one (``models/3d_affs_from_2d_mtlsd/train.py:343-344``).
"""

from __future__ import annotations

import os
import pickle
import re
from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.model import Model, multi_output_loss


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def create_train_state(model: Model, key, learning_rate: float = 1e-4):
    params = model.init(key)
    tx = optax.adam(learning_rate)
    return (
        TrainState(jnp.zeros((), jnp.int32), params, tx.init(params)),
        tx,
    )


def make_train_step(model: Model, tx) -> Callable:
    """Build the jittable step: (state, batch) -> (state, metrics).

    batch: {"input": (N, *spatial, C),
            "targets": {name: (N, *spatial, C)},
            "weights": {name: (N, *spatial, C)}}
    """

    def loss_fn(params, batch):
        preds = model.apply(params, batch["input"])
        # targets may carry more context than the net output: centre-crop
        targets = {
            k: _center_crop_like(batch["targets"][k], preds[k]) for k in preds
        }
        weights = {
            k: _center_crop_like(batch["weights"][k], preds[k]) for k in preds
        }
        return multi_output_loss(preds, targets, weights)

    def step(state: TrainState, batch):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(state.step + 1, params, opt_state),
            {"loss": loss},
        )

    return step


def _center_crop_like(x, ref):
    if x.shape == ref.shape:
        return x
    slices = [slice(None)]
    for s, t in zip(x.shape[1:-1], ref.shape[1:-1]):
        o = (s - t) // 2
        slices.append(slice(o, o + t))
    slices.append(slice(None))
    return x[tuple(slices)]


# ---------------------------------------------------------------------------
# sharding
# ---------------------------------------------------------------------------


def make_mesh(n_devices: Optional[int] = None, data: Optional[int] = None):
    """A 2D ('data', 'space') mesh over the available devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = np.asarray(devices[:n])
    if data is None:
        # favour data parallelism; give leftover factor-of-2 to space
        data = n
        space = 1
        while data % 2 == 0 and data > 2:
            data //= 2
            space *= 2
    else:
        space = n // data
    return jax.sharding.Mesh(
        devices.reshape(data, space), ("data", "space")
    )


def shard_train_step(step_fn, mesh) -> Callable:
    """jit the step with batch->data, spatial-y->space sharding."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    replicated = NamedSharding(mesh, P())

    def batch_spec(x):
        # (N, *spatial, C): shard batch over 'data', first spatial over 'space'
        spec = [None] * x.ndim
        spec[0] = "data"
        if x.ndim >= 3:
            spec[1] = "space"
        return NamedSharding(mesh, P(*spec))

    def place(state, batch):
        state = jax.device_put(state, replicated)
        batch = jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), batch_spec(jnp.asarray(x))),
            batch,
        )
        return state, batch

    jitted = jax.jit(step_fn, donate_argnums=(0,))
    return jitted, place


# ---------------------------------------------------------------------------
# checkpointing
# ---------------------------------------------------------------------------

_CKPT_RE = re.compile(r"model_checkpoint_(\d+)$")


def save_checkpoint(ckpt_dir: str, state: TrainState, step: int) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"model_checkpoint_{step}")
    host_state = jax.tree_util.tree_map(np.asarray, state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(
            {
                "step": int(host_state.step),
                "params": host_state.params,
                "opt_state": host_state.opt_state,
            },
            f,
        )
    os.replace(tmp, path)
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    best, best_it = None, -1
    for name in os.listdir(ckpt_dir):
        m = _CKPT_RE.match(name)
        if m and int(m.group(1)) > best_it:
            best_it = int(m.group(1))
            best = os.path.join(ckpt_dir, name)
    return best


def load_checkpoint(path: str, tx=None) -> TrainState:
    with open(path, "rb") as f:
        data = pickle.load(f)
    opt_state = data["opt_state"]
    return TrainState(
        jnp.asarray(data["step"], jnp.int32), data["params"], opt_state
    )


def load_params(path: str):
    """Load just the params from a checkpoint (for prediction)."""
    with open(path, "rb") as f:
        data = pickle.load(f)
    if isinstance(data, dict) and "params" in data:
        return data["params"]
    return data
