import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bootstrapper_tpu.models import (
    Model,
    SETUPS,
    UNetConfig,
    compute_output_shape,
    multi_output_loss,
    weighted_mse_loss,
)
from bootstrapper_tpu.models.zoo import model_chains


@pytest.mark.parametrize("name", list(SETUPS))
def test_config_shape_algebra(name):
    """Every zoo setup's declared input->output shapes must be consistent."""
    Model.from_setup(name).validate_shapes()


def test_3d_unet_forward_shapes():
    m = Model.from_setup("3d_affs")
    nc = dict(m.net_config)
    nc.update(num_fmaps=2, fmap_inc_factor=2, input_shape=[32, 100, 100],
              output_shape=[4, 8, 8])
    m = Model(nc)
    m.validate_shapes()
    params = m.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 32, 100, 100, 1), jnp.float32)
    out = jax.jit(m.apply)(params, x)
    assert out["3d_affs"].shape == (1, 4, 8, 8, 9)
    assert out["3d_affs"].dtype == jnp.float32
    v = np.asarray(out["3d_affs"])
    assert (v >= 0).all() and (v <= 1).all()  # sigmoid head


def test_2d_mtlsd_forward_shapes_and_stack_infer():
    nc = dict(Model.from_setup("2d_mtlsd").net_config)
    nc.update(num_fmaps=2, fmap_inc_factor=2, input_shape=[100, 100],
              output_shape=[8, 8])
    m = Model(nc, stack_infer=True)
    m.validate_shapes()
    params = m.init(jax.random.PRNGKey(1))
    # 3 adjacent slices enter as a z-dim and get folded into channels
    x = jnp.zeros((2, 3, 100, 100, 1), jnp.float32)
    out = jax.jit(m.apply)(params, x)
    assert out["2d_lsds"].shape == (2, 1, 8, 8, 6)
    assert out["2d_affs"].shape == (2, 1, 8, 8, 6)


def test_from_model_shapes():
    nc = dict(Model.from_setup("3d_affs_from_2d_mtlsd").net_config)
    nc.update(num_fmaps=2, fmap_inc_factor=2, input_shape=[24, 100, 100],
              output_shape=[4, 8, 8])
    m = Model(nc)
    m.validate_shapes()
    params = m.init(jax.random.PRNGKey(2))
    x = jnp.zeros((1, 24, 100, 100, 12), jnp.float32)  # 6 lsds + 6 affs
    out = jax.jit(m.apply)(params, x)
    assert out["3d_affs"].shape == (1, 4, 8, 8, 9)


def test_unet_translation_equivariance_shape_rule():
    cfg = UNetConfig(
        in_channels=1,
        num_fmaps=2,
        fmap_inc_factor=2,
        downsample_factors=[[2, 2]] * 2,
        kernel_size_down=[[[3, 3], [3, 3]]] * 3,
        kernel_size_up=[[[3, 3], [3, 3]]] * 2,
    )
    # shape algebra should accept the declared shapes for nested factors
    out = compute_output_shape(cfg, (60, 60))
    assert all(o > 0 for o in out)


def test_weighted_mse_masked_mean():
    pred = jnp.array([1.0, 0.0, 0.5, 0.5])
    target = jnp.array([0.0, 0.0, 0.5, 1.0])
    weights = jnp.array([1.0, 0.0, 1.0, 2.0])
    # only elements with weight>0 count: (1*1 + 1*0 + 2*0.25)/3
    expected = (1.0 + 0.0 + 0.5) / 3
    assert weighted_mse_loss(pred, target, weights) == pytest.approx(expected)


def test_weighted_mse_all_zero_weights():
    pred = jnp.ones((4,))
    target = jnp.zeros((4,))
    weights = jnp.zeros((4,))
    assert weighted_mse_loss(pred, target, weights) == 0.0


def test_multi_output_loss_sums():
    p = {"a": jnp.ones((2,)), "b": jnp.zeros((2,))}
    t = {"a": jnp.zeros((2,)), "b": jnp.zeros((2,))}
    w = {"a": jnp.ones((2,)), "b": jnp.ones((2,))}
    assert multi_output_loss(p, t, w) == pytest.approx(1.0)


def test_model_chains():
    chains = model_chains()
    assert ["2d_mtlsd", "3d_affs_from_2d_mtlsd"] in chains
    assert ["2d_mtlsd", "3d_affs_from_2d_lsd"] in chains  # subset inputs ok
    assert ["2d_lsd", "3d_affs_from_2d_affs"] not in chains
    assert ["3d_lsd", "3d_affs_from_3d_lsd"] in chains
    # chains ending in a model with no 3d_affs output cannot be
    # segmented and are not offered (the reference wizard force-extends
    # such chains to a refiner, configs.py:198-217)
    assert ["2d_lsd"] not in chains
    assert ["2d_mtlsd"] not in chains
    assert ["3d_affs"] in chains
    assert ["3d_mtlsd"] in chains
    # enumeration without the segmentability filter still offers them
    assert ["2d_lsd"] in model_chains(require_affs=False)


def test_gradients_flow():
    m = Model.from_setup("2d_affs")
    # tiny variant for speed
    nc = dict(m.net_config)
    nc.update(
        input_shape=[68, 68],
        output_shape=[28, 28],
        num_fmaps=2,
        fmap_inc_factor=2,
        downsample_factors=[[2, 2]] * 2,
        kernel_size_down=[[[3, 3], [3, 3]]] * 3,
        kernel_size_up=[[[3, 3], [3, 3]]] * 2,
    )
    m = Model(nc)
    m.validate_shapes()
    params = m.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 68, 68, 1))

    def loss_fn(p):
        out = m.apply(p, x)["2d_affs"]
        return weighted_mse_loss(out, jnp.zeros_like(out), jnp.ones_like(out))

    g = jax.jit(jax.grad(loss_fn))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)


def test_apply_rejects_too_small_input():
    """Invalid tile shapes fail with a geometry message, not an opaque
    empty-tensor slice error from deep inside the fold graph."""
    import jax
    import jax.numpy as jnp
    import pytest

    from bootstrapper_tpu.models import Model

    m = Model.from_setup("3d_affs")
    params = m.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 36, 76, 76, 1), jnp.float32)
    with pytest.raises(ValueError, match="invalid for this setup"):
        m.apply(params, x)
