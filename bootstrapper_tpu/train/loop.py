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

import logging
import os
import pickle
import re
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.model import Model, multi_output_loss

logger = logging.getLogger(__name__)


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


def make_mesh(
    n_devices: Optional[int] = None,
    data: Optional[int] = None,
    batch_size: Optional[int] = None,
    spatial: Optional[int] = None,
):
    """A 2D ('data', 'space') mesh over the available devices.

    ``device_put`` rejects shardings that do not divide a dimension
    evenly, so the factorisation must respect the arrays it will carry:
    the 'data' axis must divide the global ``batch_size`` and the
    'space' axis must divide the leading spatial extent (pass
    ``spatial`` as the gcd of every sharded tensor's dim-1 — input and
    output z for 3D setups). Policy: use as many devices as the
    divisibility constraints allow, favouring data parallelism (no
    halo exchanges) over spatial sharding; devices that cannot be used
    evenly are left out of the mesh (with batch 1 and spatial 4 on 8
    devices, a (1, 4) mesh beats a crash).

    Without ``batch_size``/``spatial`` hints the legacy balanced split
    is kept (factors of two shared between the axes, at least 2 data)
    for callers that place compatible arrays themselves.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    if data is not None:
        space = n // data
    elif batch_size is None and spatial is None:
        data = n
        space = 1
        while data % 2 == 0 and data > 2:
            data //= 2
            space *= 2
    else:
        b = batch_size or 1
        best = (0, 0, 0)  # (devices used, data, space)
        for d in range(1, n + 1):
            if b % d:
                continue
            s = n // d
            while s > 1 and spatial is not None and spatial % s:
                s -= 1
            best = max(best, (d * s, d, s))
        _, data, space = best
        if data * space < n:
            logger.warning(
                "mesh uses %d of %d devices: batch %s / spatial %s "
                "constrain the factorisation to (%d data, %d space)",
                data * space, n, batch_size, spatial, data, space,
            )
    return jax.sharding.Mesh(
        np.asarray(devices[: data * space]).reshape(data, space),
        ("data", "space"),
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

    from ..utils.xla import bs_jit

    jitted = bs_jit(step_fn, donate_argnums=(0,))
    return jitted, place


# ---------------------------------------------------------------------------
# checkpointing
# ---------------------------------------------------------------------------

_CKPT_RE = re.compile(r"model_checkpoint_(\d+)$")


def _flatten_params(params, prefix="params"):
    """Nested dict/list pytree -> {slash/path: array} (self-describing,
    no pickled class paths — survives refactors and library upgrades)."""
    out = {}
    if isinstance(params, dict):
        for k, v in params.items():
            out.update(_flatten_params(v, f"{prefix}/{k}"))
    elif isinstance(params, (list, tuple)):
        for i, v in enumerate(params):
            out.update(_flatten_params(v, f"{prefix}/{i}"))
    else:
        out[prefix] = np.asarray(params)
    return out


def _unflatten_params(flat: dict):
    root: dict = {}
    for path, arr in flat.items():
        parts = path.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node)
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root.get("params", root))


def save_checkpoint(ckpt_dir: str, state: TrainState, step: int) -> str:
    """Write ``model_checkpoint_{step}``: an npz with path-keyed params
    plus flat-ordered optimiser leaves (restored against a fresh
    ``tx.init`` structure — no pickled optax classes)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"model_checkpoint_{step}")
    host = jax.tree_util.tree_map(np.asarray, state)
    arrays = _flatten_params(host.params)
    for i, leaf in enumerate(jax.tree_util.tree_leaves(host.opt_state)):
        arrays[f"opt/{i:04d}"] = np.asarray(leaf)
    arrays["step"] = np.asarray(int(host.step))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
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


def _is_npz(path: str) -> bool:
    with open(path, "rb") as f:
        return f.read(2) == b"PK"


def load_checkpoint(path: str, tx=None) -> TrainState:
    """Load a checkpoint.  With ``tx``, the optimiser state is restored
    into a fresh ``tx.init(params)`` structure; without it, opt leaves
    are dropped (prediction).  Legacy pickle checkpoints still load."""
    if not _is_npz(path):  # legacy pickle checkpoint
        with open(path, "rb") as f:
            data = pickle.load(f)
        return TrainState(
            jnp.asarray(data["step"], jnp.int32),
            data["params"],
            data["opt_state"],
        )
    data = np.load(path)
    params = _unflatten_params(
        {k: data[k] for k in data.files if k.startswith("params/")}
    )
    step = jnp.asarray(int(data["step"]), jnp.int32)
    opt_state = None
    if tx is not None:
        template = tx.init(params)
        leaves, treedef = jax.tree_util.tree_flatten(template)
        saved = sorted(k for k in data.files if k.startswith("opt/"))
        if len(saved) == len(leaves):
            opt_state = jax.tree_util.tree_unflatten(
                treedef, [data[k] for k in saved]
            )
        else:  # optimiser changed shape: fresh init
            opt_state = template
    return TrainState(step, params, opt_state)


def load_params(path: str):
    """Load just the params from a checkpoint (for prediction)."""
    if not _is_npz(path):
        with open(path, "rb") as f:
            data = pickle.load(f)
        if isinstance(data, dict) and "params" in data:
            return data["params"]
        return data
    data = np.load(path)
    return _unflatten_params(
        {k: data[k] for k in data.files if k.startswith("params/")}
    )
