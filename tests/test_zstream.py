"""Overlap-save z-streaming (models/zstream.py): bit-exactness against
the static graph, across the fold / lazy / slab decode variants, and
through Model.apply_stream.

Why near-exactness is the right contract: valid convolutions are exact
under concatenation in real arithmetic, so a streaming run over caches
must reproduce the static forward on the concatenated input to within
float reassociation (the per-step graphs are different XLA programs, so
bitwise equality is not guaranteed — observed: 1 f32 ULP in the sigmoid
head). Any window or FIFO off-by-one shows up as a hard O(1) mismatch,
far above the 2e-6 tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bootstrapper_tpu.models import Model
from bootstrapper_tpu.models.unet import UNetConfig, unet_apply, unet_init
from bootstrapper_tpu.models.zstream import (
    stream_eligible,
    unet_stream_step,
    z_context,
)


def _cfg(num_heads=1, fold_xy=True, levels=3, z_kernels=True):
    ks = [3, 3, 3] if z_kernels else [1, 3, 3]
    return UNetConfig(
        in_channels=1,
        num_fmaps=2,
        fmap_inc_factor=2,
        downsample_factors=[[1, 2, 2]] * (levels - 1),
        kernel_size_down=[[ks, ks]] * levels,
        kernel_size_up=[[ks, ks]] * (levels - 1),
        num_heads=num_heads,
        constant_upsample=True,
        padding="valid",
        fold_xy=fold_xy,
    )


def _stream_vs_static(cfg, z_total, s, xy=60, seed=0):
    """Run the static graph on the full input and the streaming path in
    (warmup + steady) steps; return (static outs, concatenated stream
    outs) as f32 numpy per head."""
    params = unet_init(jax.random.PRNGKey(seed), cfg)
    x = jax.random.uniform(
        jax.random.PRNGKey(seed + 1), (1, z_total, xy, xy, cfg.in_channels),
        jnp.float32,
    )
    static = unet_apply(params, x, cfg, compute_dtype=jnp.float32)

    ctx = z_context(cfg)
    warm_z = s + ctx
    outs, state = unet_stream_step(
        params, x[:, :warm_z], None, cfg, compute_dtype=jnp.float32
    )
    chunks = [[np.asarray(o)] for o in outs]
    pos = warm_z
    while pos + s <= z_total:
        outs, state = unet_stream_step(
            params, x[:, pos : pos + s], state, cfg,
            compute_dtype=jnp.float32,
        )
        for h, o in enumerate(outs):
            chunks[h].append(np.asarray(o))
        pos += s
    assert pos == z_total, "test shapes must consume the input exactly"
    stream = [np.concatenate(c, axis=1) for c in chunks]
    return [np.asarray(o) for o in static], stream


def test_stream_eligibility():
    assert stream_eligible(_cfg())
    assert not stream_eligible(
        UNetConfig(
            in_channels=1, num_fmaps=2, fmap_inc_factor=2,
            downsample_factors=[[2, 2, 2]],
            kernel_size_down=[[[3, 3, 3]], [[3, 3, 3]]],
            kernel_size_up=[[[3, 3, 3]]],
        )
    )


def test_stream_matches_static_unfolded():
    cfg = _cfg(fold_xy=False)
    static, stream = _stream_vs_static(cfg, z_total=30, s=5)
    assert stream[0].shape == static[0].shape
    np.testing.assert_allclose(static[0], stream[0], atol=2e-6)


def test_stream_matches_static_folded():
    cfg = _cfg(fold_xy=True)
    static, stream = _stream_vs_static(cfg, z_total=30, s=5)
    np.testing.assert_allclose(static[0], stream[0], atol=2e-6)


def test_stream_matches_static_multi_head():
    cfg = _cfg(num_heads=2)
    static, stream = _stream_vs_static(cfg, z_total=26, s=3)
    for h in range(2):
        np.testing.assert_allclose(static[h], stream[h], atol=2e-6)


def test_stream_matches_static_forced_slabs(monkeypatch):
    """The slab decoder must stay exact when driven by stream windows."""
    monkeypatch.setenv("BS_DECODE_Z_SLABS", "2")
    cfg = _cfg(fold_xy=True)
    static, stream = _stream_vs_static(cfg, z_total=36, s=8)
    np.testing.assert_allclose(static[0], stream[0], atol=2e-6)


def test_stream_single_slice_steps():
    cfg = _cfg(fold_xy=True, z_kernels=True)
    static, stream = _stream_vs_static(cfg, z_total=23, s=1)
    np.testing.assert_allclose(static[0], stream[0], atol=2e-6)


def test_model_apply_stream_matches_apply():
    """Model-level: warmup+steady steps reproduce Model.apply on the
    concatenated tile, through the sigmoid heads and prefolded params."""
    nc = dict(Model.from_setup("3d_affs").net_config)
    nc.update(
        num_fmaps=2, fmap_inc_factor=2,
        input_shape=[16, 48, 48], output_shape=[4, 8, 8],
        downsample_factors=[[1, 2, 2]] * 2,
        kernel_size_down=[[[3, 3, 3], [3, 3, 3]]] * 3,
        kernel_size_up=[[[3, 3, 3], [3, 3, 3]]] * 2,
    )
    model = Model(nc, compute_dtype=jnp.float32)
    params = model.prefold(model.init(jax.random.PRNGKey(0)))
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (1, 28, 48, 48, 1), jnp.float32
    )
    full = model.apply(params, x)

    outs0, st = model.apply_stream(params, x[:, :24], None)
    outs1, st = model.apply_stream(params, x[:, 24:26], st)
    outs2, _ = model.apply_stream(params, x[:, 26:28], st)
    for name in full:
        got = np.concatenate(
            [np.asarray(outs0[name]), np.asarray(outs1[name]),
             np.asarray(outs2[name])], axis=1,
        )
        np.testing.assert_allclose(np.asarray(full[name]), got, atol=2e-6)


def test_stream_state_is_jit_friendly():
    """The steady step jits with the state as a pytree argument."""
    cfg = _cfg()
    params = unet_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (1, 21, 60, 60, 1), jnp.float32
    )
    outs, state = unet_stream_step(
        params, x, None, cfg, compute_dtype=jnp.float32
    )

    @jax.jit
    def step(params, x_new, state):
        return unet_stream_step(
            params, x_new, state, cfg, compute_dtype=jnp.float32
        )

    x2 = jax.random.uniform(jax.random.PRNGKey(2), (1, 5, 60, 60, 1))
    o1, s1 = step(params, x2, state)
    o2, _ = step(params, x2, s1)
    assert o1[0].shape == o2[0].shape == (1, 5, 20, 20, 2)
