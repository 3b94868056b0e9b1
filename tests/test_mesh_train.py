"""Mesh-sharded training step: DP/SP parity with the single-device step.

Covers the reference's DDP training capability
(``/root/reference/bootstrapper/models/3d_affs_from_2d_mtlsd/train.py:333-344``)
on the rebuild's GSPMD path: ``shard_train_step`` over a virtual 8-device
('data','space') mesh must produce the same params as the plain
single-device step on the same batch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bootstrapper_tpu.models import Model
from bootstrapper_tpu.train import (
    create_train_state,
    make_mesh,
    make_train_step,
    shard_train_step,
)


def _tiny_model():
    nc = dict(Model.from_setup("3d_affs").net_config)
    nc.update(
        num_fmaps=2,
        fmap_inc_factor=2,
        input_shape=[32, 100, 100],
        output_shape=[4, 8, 8],
        shape_increase=[0, 0, 0],
    )
    model = Model(nc)
    model.validate_shapes()
    return model


def _batch(n, rng):
    return {
        "input": jnp.asarray(
            rng.standard_normal((n, 32, 100, 100, 1)), jnp.float32
        ),
        "targets": {
            "3d_affs": jnp.asarray(
                rng.random((n, 4, 8, 8, 9)), jnp.float32
            )
        },
        "weights": {"3d_affs": jnp.ones((n, 4, 8, 8, 9), jnp.float32)},
    }


# function-scoped: shard_train_step donates the (placed) state, and
# device_put can alias replicated scalars, so state must not be shared
# across tests.
@pytest.fixture()
def setup():
    model = _tiny_model()
    state, tx = create_train_state(model, jax.random.PRNGKey(0))
    step = make_train_step(model, tx)
    batch = _batch(4, np.random.default_rng(7))
    return model, state, tx, step, batch


def test_mesh_train_step_finite_and_matches_single_device(setup):
    model, state, tx, step, batch = setup
    assert len(jax.devices()) >= 8, "conftest must force 8 virtual devices"

    # single-device reference step
    ref_state, ref_metrics = jax.jit(step)(state, batch)
    ref_loss = float(ref_metrics["loss"])
    assert np.isfinite(ref_loss)

    mesh = make_mesh(8, data=4)  # 4-way data, 2-way spatial
    jitted, place = shard_train_step(step, mesh)
    with mesh:
        sh_state, sh_batch = place(state, batch)
        sh_state, sh_metrics = jitted(sh_state, sh_batch)
        sh_loss = float(sh_metrics["loss"])

    assert np.isfinite(sh_loss)
    assert abs(sh_loss - ref_loss) < 1e-5, (sh_loss, ref_loss)

    ref_flat, _ = jax.tree_util.tree_flatten(ref_state.params)
    sh_flat, _ = jax.tree_util.tree_flatten(
        jax.tree_util.tree_map(np.asarray, sh_state.params)
    )
    # Adam scales every update to ~lr (1e-4); cross-device reduction-order
    # noise in near-zero gradients perturbs params by at most a few lr,
    # so parity is an *absolute* bound, not a relative one.
    for r, s in zip(ref_flat, sh_flat):
        np.testing.assert_allclose(
            np.asarray(r, np.float32), np.asarray(s, np.float32),
            rtol=0, atol=5e-4,
        )


def test_mesh_train_step_multiple_steps_decrease_loss(setup):
    model, state, tx, step, batch = setup
    mesh = make_mesh(8)
    jitted, place = shard_train_step(step, mesh)
    losses = []
    with mesh:
        st, b = place(state, batch)
        for _ in range(5):
            st, metrics = jitted(st, b)
            losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_make_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data", "space")
    mesh = make_mesh(8, data=2)
    assert mesh.devices.shape == (2, 4)


def test_make_mesh_respects_batch_and_spatial():
    # batch 1: no data parallelism possible; spatial 4 caps space at 4
    # even on 8 devices (a (1,4) mesh beats a device_put crash)
    mesh = make_mesh(8, batch_size=1, spatial=4)
    assert mesh.devices.shape == (1, 4)
    # divisible batch: favour full data parallelism
    mesh = make_mesh(8, batch_size=8, spatial=4)
    assert mesh.devices.shape == (8, 1)
    # batch 4 on 8 devices: 4-way data, leftover to space
    mesh = make_mesh(8, batch_size=4, spatial=4)
    assert mesh.devices.shape == (4, 2)
    # spatial hint alone (batch defaults to 1)
    mesh = make_mesh(8, spatial=32)
    assert mesh.devices.shape == (1, 8)


def test_mesh_train_step_batch_one_default(setup):
    """The production default (batch_size=1) must not crash: the mesh
    factorisation falls back to pure spatial sharding."""
    model, state, tx, step, _ = setup
    batch = _batch(1, np.random.default_rng(3))
    # gcd(input z 32, output z 4) = 4
    mesh = make_mesh(8, batch_size=1, spatial=4)
    jitted, place = shard_train_step(step, mesh)
    with mesh:
        st, b = place(state, batch)
        st, metrics = jitted(st, b)
        assert np.isfinite(float(metrics["loss"]))
