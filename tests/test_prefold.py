"""Prefolded weight transforms (fold.prefold_conv_pass / Model.prefold)
are bit-identical to the in-graph transforms across every decode path.

The folded inference graph rebuilds each folded kernel and composite
upsample kernel from the original weights inside every jitted call;
prefolding stores them in the params pytree once at checkpoint load.
Same ops over the same weights -> exact equality is asserted, not
allclose."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bootstrapper_tpu.models import Model
from bootstrapper_tpu.models import fold as F
from bootstrapper_tpu.models.unet import (
    UNetConfig,
    prefold_unet_params,
    unet_apply,
    unet_init,
)


def small_cfg(**over):
    kw = dict(
        in_channels=1,
        num_fmaps=3,
        fmap_inc_factor=2,
        downsample_factors=[[1, 2, 2]] * 2,
        kernel_size_down=[[[3, 3, 3], [3, 3, 3]]] * 3,
        kernel_size_up=[[[3, 3, 3], [3, 3, 3]]] * 2,
    )
    kw.update(over)
    return UNetConfig(**kw)


def _outputs(cfg, params, shape):
    x = jax.random.normal(jax.random.PRNGKey(7), (1, *shape, cfg.in_channels))
    return unet_apply(params, x, cfg, compute_dtype=jnp.float32)


def test_prefold_adds_entries_and_keeps_originals():
    cfg = small_cfg()
    params = unet_init(jax.random.PRNGKey(0), cfg)
    pf = prefold_unet_params(params, cfg)
    l0 = pf["l_conv"][0]["layers"][0]
    assert any(k.startswith("_pf:") for k in l0)
    r0 = pf["r_conv"][0][0]["layers"][0]
    assert any(k.startswith("_pfu:") for k in r0)
    # originals untouched (training/checkpoints see the same tree)
    np.testing.assert_array_equal(
        l0["w"], params["l_conv"][0]["layers"][0]["w"]
    )
    assert not any(
        k.startswith("_pf") for k in params["l_conv"][0]["layers"][0]
    )


@pytest.mark.parametrize(
    "env",
    [
        {},  # folded/materialised decode
        {"BS_LAZY_UP_BYTES": "0"},  # forced lazy decode
        {"BS_DECODE_Z_SLABS": "2", "BS_LAZY_UP_BYTES": "0"},  # slab decode
    ],
)
def test_prefold_bit_identical(monkeypatch, env):
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    cfg = small_cfg()
    params = unet_init(jax.random.PRNGKey(0), cfg)
    base = _outputs(cfg, params, (24, 52, 56))
    pf = prefold_unet_params(params, cfg)
    got = _outputs(cfg, pf, (24, 52, 56))
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(base[0]))


def test_prefold_bit_identical_flat_kernels():
    # the 'from'-net shape: (1,3,3) kernels in the first level
    cfg = small_cfg(
        kernel_size_down=[
            [[1, 3, 3], [1, 3, 3]],
            [[3, 3, 3], [3, 3, 3]],
            [[3, 3, 3], [3, 3, 3]],
        ],
        in_channels=6,
    )
    params = unet_init(jax.random.PRNGKey(1), cfg)
    base = _outputs(cfg, params, (16, 52, 56))
    got = _outputs(cfg, prefold_unet_params(params, cfg), (16, 52, 56))
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(base[0]))


def test_model_prefold_full_setup():
    model = Model.from_setup("3d_affs", compute_dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    shape = tuple(model.input_shape)
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, *shape, 1))
    base = model.apply(params, x)
    pf = jax.jit(model.prefold)(params)
    got = model.apply(pf, x)
    for name in base:
        np.testing.assert_array_equal(
            np.asarray(got[name]), np.asarray(base[name])
        )


def test_model_prefold_2d_setup():
    # 2D nets run their folded levels via the lifted unit-z 3D
    # machinery; prefold merges lifted _pf entries back into the 2D tree
    model = Model.from_setup("2d_mtlsd", compute_dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    pf = model.prefold(params)
    l0 = pf["unet"]["l_conv"][0]["layers"][0]
    assert any(k.startswith("_pf:") for k in l0)
    shape = tuple(model.input_shape)
    adj = model.net_config.get("adj_slices", 1)
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, adj, *shape, 1))
    base = model.apply(params, x)
    got = model.apply(pf, x)
    for name in base:
        np.testing.assert_array_equal(
            np.asarray(got[name]), np.asarray(base[name])
        )


def test_composite_up_kernels_cache_matches_fallback():
    # cached kernels are keyed by crop-offset PARITY; slice bases must
    # still reflect the full offsets
    w = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 3, 4, 5))
    layer = {"w": w, "b": jnp.zeros((5,))}
    pf = F.prefold_conv_pass(
        {"layers": [layer], "residual": {"w": w[:1, :1, :1], "b": layer["b"]}},
        split=0,
    )
    # manually add up-kernels for the full slice via a split at 0
    pf2 = F.prefold_conv_pass(
        {
            "layers": [{"w": jnp.concatenate([w, w], axis=3), "b": layer["b"]}],
            "residual": {"w": w[:1, :1, :1], "b": layer["b"]},
        },
        split=4,
        up_phases=True,
    )
    cached_layer = pf2["layers"][0]
    for c0y, c0x in [(0, 0), (1, 0), (2, 1), (3, 3)]:
        ref = F.composite_up_kernels(w, c0y, c0x)
        got = F.composite_up_kernels(
            w, c0y, c0x, layer=cached_layer, off=4
        )
        for (pr, kr, br), (pg, kg, bg) in zip(ref, got):
            assert pr == pg and br == bg
            np.testing.assert_array_equal(np.asarray(kg), np.asarray(kr))
