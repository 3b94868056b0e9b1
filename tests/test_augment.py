import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bootstrapper_tpu.pipeline.augment import (
    create_mask,
    defect_augment,
    elastic_deform,
    expand_labels,
    gamma_augment,
    impulse_noise_augment,
    intensity_augment,
    noise_augment,
    random_grow_boundary,
    shift_augment,
    simple_augment,
    smooth_augment,
)

KEY = jax.random.PRNGKey(0)


def _raw3d(shape=(4, 16, 16), seed=0):
    return jax.random.uniform(jax.random.PRNGKey(seed), shape)


def test_simple_augment_consistent_across_arrays():
    raw = _raw3d()
    labels = (raw > 0.5).astype(jnp.int32)
    out = simple_augment(KEY, {"raw": raw, "labels": labels})
    # the same geometric transform must be applied to both arrays
    np.testing.assert_array_equal(
        np.asarray(out["labels"]), np.asarray(out["raw"]) > 0.5
    )


def test_simple_augment_is_mirror_or_transpose():
    raw = _raw3d()
    out = simple_augment(KEY, {"raw": raw})["raw"]
    # content preserved as a multiset
    np.testing.assert_allclose(
        np.sort(np.asarray(out).ravel()), np.sort(np.asarray(raw).ravel()),
        rtol=1e-6,
    )


def test_elastic_deform_identity_when_zero():
    raw = _raw3d()
    labels = jnp.zeros(raw.shape, jnp.int32).at[:, 4:10, 4:10].set(3)
    out = elastic_deform(
        KEY,
        {"raw": raw, "labels": labels},
        {"raw": 1, "labels": 0},
        jitter_sigma=(0, 0, 0),
        rotation_max=0.0,
        scale_range=(1.0, 1.0),
    )
    np.testing.assert_allclose(np.asarray(out["raw"]), np.asarray(raw), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out["labels"]), np.asarray(labels))


def test_elastic_deform_labels_stay_integral():
    labels = jnp.zeros((4, 16, 16), jnp.int32).at[:, 2:12, 3:13].set(5)
    out = elastic_deform(
        KEY, {"labels": labels}, {"labels": 0}, jitter_sigma=(0, 2, 2)
    )
    vals = np.unique(np.asarray(out["labels"]))
    assert set(vals).issubset({0, 5})


def test_elastic_deform_rotation_moves_content():
    raw = jnp.zeros((1, 17, 17)).at[0, 8, 12].set(1.0)
    out = elastic_deform(
        jax.random.PRNGKey(3),
        {"raw": raw},
        {"raw": 1},
        jitter_sigma=(0, 0, 0),
        rotation_max=np.pi,
        scale_range=(1.0, 1.0),
    )["raw"]
    assert float(jnp.abs(out - raw).max()) > 0.01  # moved somewhere


def test_shift_augment_shapes():
    raw = _raw3d()
    out = shift_augment(KEY, {"raw": raw}, {"raw": 1}, prob=1.0)["raw"]
    assert out.shape == raw.shape


def test_intensity_augment_range():
    raw = _raw3d()
    out = intensity_augment(KEY, raw)
    assert out.shape == raw.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_noise_augment_changes_values():
    raw = jnp.full((2, 8, 8), 0.5)
    out = noise_augment(jax.random.PRNGKey(5), raw, sigma_max=0.1)
    assert float(jnp.abs(out - raw).mean()) > 0.0


def test_gamma_augment_preserves_bounds():
    raw = _raw3d()
    out = gamma_augment(KEY, raw)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_impulse_noise_fraction():
    raw = jnp.zeros((64, 64))
    out = impulse_noise_augment(KEY, raw, prob=0.1)
    frac = float((out != 0).mean())
    assert 0.03 < frac < 0.2


def test_smooth_augment_reduces_variance():
    raw = _raw3d((2, 32, 32), seed=7)
    out = smooth_augment(
        jax.random.PRNGKey(8), raw, sigma_range=(1.5, 1.5), slab_axis=0
    )
    assert float(jnp.var(out)) < float(jnp.var(raw))


def test_defect_augment_missing_sections():
    raw = jnp.full((8, 8, 8), 0.7)
    out = defect_augment(jax.random.PRNGKey(1), raw, prob_missing=1.0)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_defect_augment_low_contrast():
    raw = _raw3d((4, 8, 8))
    out = defect_augment(
        jax.random.PRNGKey(2), raw, prob_missing=0.0, prob_low_contrast=1.0
    )
    assert float(jnp.var(out)) < float(jnp.var(raw)) * 0.1


def test_create_mask():
    labels = jnp.array([[0, 3], [1, 0]])
    np.testing.assert_array_equal(
        np.asarray(create_mask(labels)), [[0, 1], [1, 0]]
    )


def test_random_grow_boundary_bounded():
    seg = jnp.zeros((1, 20), jnp.int32).at[0, :10].set(1).at[0, 10:].set(2)
    out = np.asarray(
        random_grow_boundary(jax.random.PRNGKey(0), seg, max_steps=2,
                             only_xy=False)
    )
    # boundary can grow 0..2 voxels per label; labels never change identity
    assert set(np.unique(out)).issubset({0, 1, 2})
    zeros = (out == 0).sum()
    assert 0 <= zeros <= 4


def test_random_grow_boundary_distinct_steps_beyond_64_labels():
    """Per-label erosion steps are independent for any id (the old
    fixed-size step table made every id >= its size share one entry —
    reference draws per-label steps unboundedly,
    ``gp/custom_grow_boundary.py:60-75``)."""
    # 64 stripes of width 8, labelled 64..127 (all past the old clip)
    n, w = 64, 8
    ids = np.arange(64, 64 + n, dtype=np.int32)
    seg = jnp.asarray(np.repeat(ids, w)[None, :])  # (1, n*w)
    out = np.asarray(
        random_grow_boundary(jax.random.PRNGKey(3), seg, max_steps=3,
                             only_xy=False)
    )
    # per-label surviving voxels -> implied erosion steps
    survivors = [(out == i).sum() for i in ids]
    # old behaviour: identical steps for every label -> all equal
    assert len(set(survivors[1:-1])) > 1
    # determinism: same key -> same result
    out2 = np.asarray(
        random_grow_boundary(jax.random.PRNGKey(3), seg, max_steps=3,
                             only_xy=False)
    )
    np.testing.assert_array_equal(out, out2)


def test_defect_augment_artifact_alpha_mask_blend():
    """Artifact sections blend per voxel with the artifact's own alpha
    mask (reference artifacts/artifacts_mask path)."""
    raw = jnp.zeros((4, 8, 8), jnp.float32)
    artifact = jnp.ones((4, 8, 8), jnp.float32)
    mask = jnp.zeros((4, 8, 8), jnp.float32).at[:, :4].set(1.0)
    out = np.asarray(
        defect_augment(
            jax.random.PRNGKey(0), raw,
            prob_missing=0.0, prob_low_contrast=0.0, prob_artifact=1.0,
            artifact=artifact, artifact_mask=mask,
        )
    )
    np.testing.assert_allclose(out[:, :4], 1.0)
    np.testing.assert_allclose(out[:, 4:], 0.0)


def test_expand_labels_fills_background():
    seg = jnp.zeros((1, 7), jnp.int32).at[0, 3].set(9)
    out = np.asarray(expand_labels(seg, expansion_voxels=2))
    np.testing.assert_array_equal(out[0], [0, 9, 9, 9, 9, 9, 0])


def test_augment_chain_jits():
    """The full intensity chain compiles as one jitted program."""

    @jax.jit
    def chain(key, raw):
        k = jax.random.split(key, 5)
        raw = intensity_augment(k[0], raw)
        raw = noise_augment(k[1], raw, 0.02)
        raw = gamma_augment(k[2], raw)
        raw = smooth_augment(k[3], raw)
        raw = defect_augment(k[4], raw, 0.1, 0.1)
        return raw

    out = chain(KEY, _raw3d())
    assert out.shape == (4, 16, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_fold_augment_moves_pixels():
    from bootstrapper_tpu.pipeline.augment import fold_augment

    raw = jax.random.uniform(jax.random.PRNGKey(0), (4, 32, 32))
    out = fold_augment(jax.random.PRNGKey(1), raw, prob=1.0)
    assert out.shape == raw.shape
    assert float(jnp.abs(out - raw).max()) > 0.01
    # prob=0 -> identity
    out0 = fold_augment(jax.random.PRNGKey(1), raw, prob=0.0)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(raw), atol=1e-6)


def test_clahe_augment_spreads_histogram():
    from bootstrapper_tpu.pipeline.augment import clahe_augment

    rng = np.random.default_rng(0)
    raw = jnp.asarray(
        np.clip(rng.normal(0.5, 0.02, (2, 64, 64)), 0, 1), jnp.float32
    )
    out = clahe_augment(jax.random.PRNGKey(0), raw)
    assert float(jnp.std(out)) > float(jnp.std(raw))
    # empty sections untouched
    empty = jnp.zeros((1, 16, 16))
    out2 = clahe_augment(jax.random.PRNGKey(0), empty, signal_min=0.05)
    np.testing.assert_allclose(np.asarray(out2), 0.0)
