"""The 2x2-xy space-to-depth fold of U-Net level 0 is an exact rewrite:
same parameters, same outputs (fp32), same gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bootstrapper_tpu.models import fold as F
from bootstrapper_tpu.models.unet import (
    UNetConfig,
    conv_pass_apply,
    conv_pass_init,
    unet_apply,
    unet_init,
)
from bootstrapper_tpu.models import Model


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


def test_fold_unfold_roundtrip():
    x = jnp.arange(2 * 3 * 4 * 6 * 5, dtype=jnp.float32).reshape(2, 3, 4, 6, 5)
    assert np.array_equal(F.unfold(F.fold(x)), x)


def test_folded_conv_matches_unfolded():
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (3, 3, 3, 2, 4), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), (4,), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 10, 12, 2), jnp.float32)

    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ) + b
    got = F.unfold(F.folded_conv(F.fold(x), w, b, compute_dtype=jnp.float32))
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5)


@pytest.mark.parametrize("oy,ox", [(0, 0), (1, 0), (0, 1), (1, 1), (3, 2)])
def test_folded_crop_parity(oy, ox):
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 5, 12, 14, 3), jnp.float32)
    xf = F.fold(x)
    target = (3, 6, 8)
    ref = x[:, 1 : 1 + 3, oy : oy + 6, ox : ox + 8, :]
    got = F.unfold(F.folded_crop(xf, target, (1, oy, ox)))
    np.testing.assert_array_equal(got, ref)


def test_folded_phase_max_is_122_pool():
    from bootstrapper_tpu.models.unet import max_pool

    x = jax.random.normal(jax.random.PRNGKey(4), (2, 4, 8, 10, 3), jnp.float32)
    ref = max_pool(x, (1, 2, 2))
    got = F.folded_phase_max(F.fold(x))
    np.testing.assert_array_equal(got, ref)


def test_folded_conv_pass_matches():
    key = jax.random.PRNGKey(5)
    params = conv_pass_init(key, 2, 4, [(3, 3, 3), (3, 3, 3)])
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 9, 12, 14, 2), jnp.float32)
    ref = conv_pass_apply(params, x, [(3, 3, 3), (3, 3, 3)],
                          compute_dtype=jnp.float32)
    got = F.unfold(
        F.folded_conv_pass(params, F.fold(x), [(3, 3, 3), (3, 3, 3)],
                           compute_dtype=jnp.float32)
    )
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5)


def _unet_pair(cfg, shape):
    params = unet_init(jax.random.PRNGKey(7), cfg)
    x = jax.random.normal(jax.random.PRNGKey(8), (1, *shape, cfg.in_channels),
                          jnp.float32)
    base = unet_apply(
        params, x,
        UNetConfig(**{**dataclass_dict(cfg), "fold_xy": False}),
        compute_dtype=jnp.float32,
    )
    folded = unet_apply(params, x, cfg, compute_dtype=jnp.float32)
    # guard against vacuous comparisons: a too-small z once collapsed
    # the output to zero size and every assert_allclose passed trivially
    assert all(np.asarray(o).size > 0 for o in base)
    return base, folded


def dataclass_dict(cfg):
    import dataclasses

    return {f.name: getattr(cfg, f.name) for f in dataclasses.fields(cfg)}


def test_unet_fold_exact():
    cfg = small_cfg()
    base, folded = _unet_pair(cfg, (24, 52, 56))
    assert len(base) == len(folded) == 1
    np.testing.assert_allclose(np.asarray(folded[0]), np.asarray(base[0]),
                               rtol=0, atol=2e-5)


def test_unet_fold_exact_forced_lazy_deep(monkeypatch):
    # force the upsample-fused lazy path at every decoder level (big-tile
    # memory mode) and check exactness against the unfolded graph
    monkeypatch.setenv("BS_LAZY_UP_BYTES", "0")
    cfg = small_cfg()
    base, folded = _unet_pair(cfg, (24, 52, 56))
    np.testing.assert_allclose(np.asarray(folded[0]), np.asarray(base[0]),
                               rtol=0, atol=2e-5)


def test_unet_fold_exact_flat_kernels():
    # the 'from'-net shape: (1,3,3) kernels in the first levels
    cfg = small_cfg(
        kernel_size_down=[[[1, 3, 3], [1, 3, 3]], [[3, 3, 3], [3, 3, 3]],
                          [[3, 3, 3], [3, 3, 3]]],
        in_channels=6,
    )
    base, folded = _unet_pair(cfg, (20, 52, 56))
    np.testing.assert_allclose(np.asarray(folded[0]), np.asarray(base[0]),
                               rtol=0, atol=2e-5)


def test_unet_fold_multihead():
    cfg = small_cfg(num_heads=2)
    base, folded = _unet_pair(cfg, (24, 52, 56))
    for b, f in zip(base, folded):
        np.testing.assert_allclose(np.asarray(f), np.asarray(b), rtol=0,
                                   atol=2e-5)


def test_folded_upsample_matches_resize():
    from bootstrapper_tpu.models.unet import upsample_resize

    x = jax.random.normal(jax.random.PRNGKey(13), (2, 3, 5, 7, 4),
                          jnp.float32)
    ref = upsample_resize(x, (1, 2, 2))
    got = F.unfold(F.folded_upsample_linear(x))
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)


@pytest.mark.parametrize("c0y,c0x", [(0, 0), (1, 0), (2, 3), (1, 1)])
@pytest.mark.parametrize("k", [1, 3])
def test_lazy_upsample_conv_matches_materialised(c0y, c0x, k):
    """Composite stride-2 kernels == upsample + crop + conv, including
    crop offsets 0/1 where the resize's edge clamp is consumed."""
    from bootstrapper_tpu.models.unet import upsample_resize

    rng = jax.random.PRNGKey(20)
    g = jax.random.normal(rng, (1, 6, 9, 11, 5), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(21), (min(k, 3), k, k, 5, 4),
                          jnp.float32)
    kz = w.shape[0]
    target = (6 - 0, 14, 16)  # z kept, xy even, within 2*h - offsets
    g_up = upsample_resize(g, (1, 2, 2))
    crop = g_up[:, 0:6, c0y : c0y + 14, c0x : c0x + 16, :]
    ref = jax.lax.conv_general_dilated(
        crop, w, (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    got = F.unfold(
        F.lazy_upsample_conv(g, w, (0, c0y, c0x), target,
                             compute_dtype=jnp.float32)
    )
    # fp32 accumulation order differs between the two formulations
    np.testing.assert_allclose(got, ref, rtol=0, atol=5e-5)


def test_fold_eligibility_guards():
    from bootstrapper_tpu.models.unet import _fold_eligible

    cfg = small_cfg()
    x = jnp.zeros((1, 20, 52, 56, 1))
    assert _fold_eligible(cfg, x)
    # odd xy input
    assert not _fold_eligible(cfg, jnp.zeros((1, 20, 53, 56, 1)))
    # z-downsampling first level
    assert not _fold_eligible(
        small_cfg(downsample_factors=[[2, 2, 2], [1, 2, 2]]), x
    )
    # disabled by flag
    assert not _fold_eligible(small_cfg(fold_xy=False), x)


def test_model_fold_exact_and_grads():
    nc = dict(Model.from_setup("3d_affs").net_config)
    nc.update(num_fmaps=2, fmap_inc_factor=2,
              input_shape=[32, 100, 100], output_shape=[4, 8, 8],
              shape_increase=[0, 0, 0])
    m_fold = Model(nc, compute_dtype=jnp.float32)
    params = m_fold.init(jax.random.PRNGKey(11))
    x = jax.random.normal(jax.random.PRNGKey(12), (1, 32, 100, 100, 1),
                          jnp.float32)

    y_fold = m_fold.apply(params, x)["3d_affs"]

    from bootstrapper_tpu.models import unet as U

    orig = U._fold_eligible
    try:
        U._fold_eligible = lambda *a: False
        y_base = m_fold.apply(params, x)["3d_affs"]
    finally:
        U._fold_eligible = orig
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_base),
                               rtol=0, atol=2e-5)

    def loss_fold(p):
        return jnp.sum(m_fold.apply(p, x)["3d_affs"] ** 2)

    g_fold = jax.grad(loss_fold)(params)
    try:
        U._fold_eligible = lambda *a: False
        g_base = jax.grad(loss_fold)(params)
    finally:
        U._fold_eligible = orig
    from jax.flatten_util import ravel_pytree

    flat_f, _ = ravel_pytree(g_fold)
    flat_b, _ = ravel_pytree(g_base)
    np.testing.assert_allclose(np.asarray(flat_f), np.asarray(flat_b),
                               rtol=0, atol=5e-4)


def test_2d_net_lifted_fold_exact():
    """2D nets run as unit-z 3D with the fold; outputs match unfolded."""
    cfg2d = UNetConfig(
        in_channels=3,
        num_fmaps=4,
        fmap_inc_factor=2,
        downsample_factors=[[2, 2]] * 2,
        kernel_size_down=[[[3, 3], [3, 3]]] * 3,
        kernel_size_up=[[[3, 3], [3, 3]]] * 2,
    )
    params = unet_init(jax.random.PRNGKey(30), cfg2d)
    x = jax.random.normal(jax.random.PRNGKey(31), (1, 60, 68, 3),
                          jnp.float32)
    folded = unet_apply(params, x, cfg2d, compute_dtype=jnp.float32)
    base = unet_apply(
        params, x,
        UNetConfig(**{**dataclass_dict(cfg2d), "fold_xy": False}),
        compute_dtype=jnp.float32,
    )
    assert folded[0].ndim == 4  # (n, h, w, c)
    np.testing.assert_allclose(np.asarray(folded[0]), np.asarray(base[0]),
                               rtol=0, atol=2e-5)


def test_2d_model_fold_exact():
    nc = dict(Model.from_setup("2d_mtlsd").net_config)
    nc.update(num_fmaps=2, fmap_inc_factor=2,
              input_shape=[100, 100], output_shape=[8, 8],
              shape_increase=[0, 0])
    m = Model(nc, compute_dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(32))
    x = jax.random.normal(jax.random.PRNGKey(33), (1, 100, 100, 3),
                          jnp.float32)
    y_fold = m.apply(params, x)
    nc2 = dict(nc, fold_xy=False)
    y_base = Model(nc2, compute_dtype=jnp.float32).apply(params, x)
    for k in y_fold:
        np.testing.assert_allclose(np.asarray(y_fold[k]),
                                   np.asarray(y_base[k]), rtol=0, atol=2e-5)


def test_fold_depth_multi_level():
    """The fold extends through the leading run of lane-starved (1,2,2)
    levels; wide levels and non-(1,2,2) factors stop it."""
    from bootstrapper_tpu.models.unet import _fold_depth

    x = jnp.zeros((1, 20, 52, 56, 1))
    cfg = small_cfg()
    # 3-channel base: both (1,2,2) levels fold
    assert _fold_depth(cfg, x) == 2
    # flagship-like channel growth: folding stops past BS_FOLD_MAX_CH
    import os

    wide = small_cfg(num_fmaps=60, fmap_inc_factor=5)
    assert _fold_depth(wide, x) == 1  # level 1 would be 300 channels
    # z-downsampling level stops the fold run
    zf = small_cfg(downsample_factors=[[1, 2, 2], [2, 2, 2]])
    assert _fold_depth(zf, x) == 1
    # fold disabled entirely
    off = small_cfg(fold_xy=False)
    assert _fold_depth(off, x) == 0


def test_folded_pool_122_matches_plain_pool():
    from bootstrapper_tpu.models.unet import max_pool

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 12, 5))
    ref = max_pool(x, (1, 2, 2))
    got = F.unfold(F.folded_pool_122(F.fold(x)))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_unet_fold_exact_deep_vs_shallow_fold():
    """m=2 folded levels produce the same outputs as m=1 (and as the
    plain graph, covered above)."""
    import os

    cfg = small_cfg()
    params = unet_init(jax.random.PRNGKey(7), cfg)
    x = jax.random.normal(jax.random.PRNGKey(8), (1, 24, 52, 56, 1),
                          jnp.float32)
    deep = unet_apply(params, x, cfg, compute_dtype=jnp.float32)
    assert np.asarray(deep[0]).size > 0
    os.environ["BS_FOLD_MAX_CH"] = "3"  # only level 0 folds (3 fmaps)
    try:
        shallow = unet_apply(params, x, cfg, compute_dtype=jnp.float32)
    finally:
        del os.environ["BS_FOLD_MAX_CH"]
    np.testing.assert_allclose(
        np.asarray(deep[0]), np.asarray(shallow[0]), rtol=0, atol=2e-5
    )


@pytest.mark.parametrize("slabs", [2, 3, 5])
def test_unet_z_slab_decode_exact(slabs):
    """BS_DECODE_Z_SLABS decodes each folded level in halo'd z slabs;
    valid convs make the concatenated result equal to the single-shot
    decode (unet._z_slab_decode)."""
    import os

    cfg = small_cfg()
    params = unet_init(jax.random.PRNGKey(7), cfg)
    x = jax.random.normal(jax.random.PRNGKey(8), (1, 24, 52, 56, 1),
                          jnp.float32)
    ref = unet_apply(params, x, cfg, compute_dtype=jnp.float32)
    os.environ["BS_DECODE_Z_SLABS"] = str(slabs)
    try:
        chunked = unet_apply(params, x, cfg, compute_dtype=jnp.float32)
        # the lazy in-slab form must agree too
        os.environ["BS_LAZY_UP_BYTES"] = "0"
        chunked_lazy = unet_apply(params, x, cfg, compute_dtype=jnp.float32)
    finally:
        del os.environ["BS_DECODE_Z_SLABS"]
        os.environ.pop("BS_LAZY_UP_BYTES", None)
    np.testing.assert_allclose(
        np.asarray(chunked[0]), np.asarray(ref[0]), rtol=0, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(chunked_lazy[0]), np.asarray(ref[0]), rtol=0, atol=2e-5
    )


def test_unet_z_slab_barrier_exact(monkeypatch):
    """BS_SLAB_BARRIER pins per-slab relayouts below the z slices (an
    HBM-peak fix for huge tiles, see _z_slab_decode); the
    optimization_barrier must not change values."""
    cfg = small_cfg()
    params = unet_init(jax.random.PRNGKey(7), cfg)
    x = jax.random.normal(jax.random.PRNGKey(8), (1, 24, 52, 56, 1),
                          jnp.float32)
    ref = unet_apply(params, x, cfg, compute_dtype=jnp.float32)
    monkeypatch.setenv("BS_DECODE_Z_SLABS", "3")
    monkeypatch.setenv("BS_SLAB_BARRIER", "1")
    got = unet_apply(params, x, cfg, compute_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(ref[0]), rtol=0, atol=2e-5
    )


def test_unet_z_slab_auto_engages(monkeypatch):
    """Default 'auto' slab mode replaces the lazy decode past the
    threshold: force the thresholds down so the small net engages
    adaptive slabs, and check exactness against the untouched graph."""
    cfg = small_cfg()
    params = unet_init(jax.random.PRNGKey(7), cfg)
    x = jax.random.normal(jax.random.PRNGKey(8), (1, 24, 52, 56, 1),
                          jnp.float32)
    ref = unet_apply(params, x, cfg, compute_dtype=jnp.float32)
    monkeypatch.setenv("BS_LAZY_UP_BYTES", "1000")      # everything "big"
    monkeypatch.setenv("BS_Z_SLAB_TARGET_BYTES", "20000")  # several slabs
    auto = unet_apply(params, x, cfg, compute_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(auto[0]), np.asarray(ref[0]), rtol=0, atol=2e-5
    )


@pytest.mark.parametrize("seed", range(4))
def test_unet_z_slab_fuzz_shapes(monkeypatch, seed):
    """Randomised z-slab geometry fuzz: random eligible input shapes and
    forced slab counts must stay exact vs the single-shot graph (bounds
    bugs in the halo arithmetic show up as shape errors or mismatches)."""
    rng = np.random.default_rng(seed)
    z = int(rng.integers(24, 41))
    y = 4 * int(rng.integers(12, 17))
    x = 4 * int(rng.integers(12, 17))
    slabs = int(rng.integers(2, 7))
    cfg = small_cfg()
    params = unet_init(jax.random.PRNGKey(seed), cfg)
    xin = jax.random.normal(
        jax.random.PRNGKey(seed + 100), (1, z, y, x, 1), jnp.float32
    )
    ref = unet_apply(params, xin, cfg, compute_dtype=jnp.float32)[0]
    assert np.asarray(ref).size > 0
    monkeypatch.setenv("BS_DECODE_Z_SLABS", str(slabs))
    got = unet_apply(params, xin, cfg, compute_dtype=jnp.float32)[0]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=0, atol=2e-5
    )
    # barrier mode: same values
    monkeypatch.setenv("BS_SLAB_BARRIER", "1")
    got_b = unet_apply(params, xin, cfg, compute_dtype=jnp.float32)[0]
    np.testing.assert_allclose(
        np.asarray(got_b), np.asarray(ref), rtol=0, atol=2e-5
    )
