"""pallas_conv3d vs lax.conv_general_dilated (interpret mode on CPU).

The kernel targets the decoder conv fusions XLA runs at low MXU
efficiency (BASELINE.md xprof tables); its contract is exact math
parity with models/unet.py ``_conv`` up to fp32 accumulation order.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bootstrapper_tpu.ops.pallas_conv import (
    conv3d_supported,
    pallas_conv3d,
)


def _lax_conv(x, w, b):
    return (
        jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        + b
    )


@pytest.mark.parametrize(
    "shape,kernel",
    [
        ((6, 12, 10, 128), (3, 3, 3, 128, 64)),
        ((4, 9, 8, 130), (3, 3, 3, 130, 48)),  # ragged H_out -> block 1
        ((3, 6, 7, 128), (1, 3, 3, 128, 128)),  # 2D-style z kernel
        ((5, 8, 6, 256), (3, 1, 1, 256, 32)),
    ],
)
def test_pallas_conv3d_matches_lax(shape, kernel):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, *shape)), jnp.float32)
    w = jnp.asarray(rng.standard_normal(kernel) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(kernel[-1]), jnp.float32)
    ref = _lax_conv(x, w, b)
    got = pallas_conv3d(x, w, b, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_pallas_conv3d_relu_fused():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 5, 8, 8, 128)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 128, 32)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(32), jnp.float32)
    ref = jnp.maximum(_lax_conv(x, w, b), 0)
    got = pallas_conv3d(x, w, b, relu=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_pallas_conv3d_bf16_close():
    """bf16 inputs, fp32 accumulation: parity within bf16 output ulp."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 5, 8, 10, 128)), jnp.bfloat16)
    w = jnp.asarray(
        rng.standard_normal((3, 3, 3, 128, 64)) * 0.05, jnp.bfloat16
    )
    b = jnp.asarray(rng.standard_normal(64), jnp.bfloat16)
    ref = np.asarray(_lax_conv(x, w, b), np.float32)
    got = np.asarray(
        pallas_conv3d(x, w, b, interpret=True), np.float32
    )
    np.testing.assert_allclose(got, ref, atol=0.15, rtol=0.05)


def test_supported_predicate():
    assert conv3d_supported((1, 6, 12, 10, 128), (3, 3, 3, 128, 64))
    # narrow contraction: leave to XLA
    assert not conv3d_supported((1, 6, 12, 10, 48), (3, 3, 3, 48, 48))
    # batch > 1 unsupported
    assert not conv3d_supported((2, 6, 12, 10, 128), (3, 3, 3, 128, 64))
    # weights past the VMEM budget (1500-channel bottom conv)
    assert not conv3d_supported(
        (1, 6, 12, 10, 1500), (3, 3, 3, 1500, 1500)
    )
