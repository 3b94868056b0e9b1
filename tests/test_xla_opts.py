"""BS_XLA_OPTS plumbing: env-var parsing + bs_jit pass-through.

The option channel itself (ExecutableBuildOptions.env_option_overrides
reaching a server-side TPU compiler) is exercised on hardware by
tools/xla_s2b_probe.py --copt; here we pin the parse contract and that
bs_jit compiles and honors a public DebugOptions override on CPU.
"""

import jax.numpy as jnp
import pytest

from bootstrapper_tpu.utils.xla import bs_jit, compiler_options


def test_parse_empty(monkeypatch):
    monkeypatch.delenv("BS_XLA_OPTS", raising=False)
    assert compiler_options() is None
    assert compiler_options({}) is None


def test_parse_pairs(monkeypatch):
    monkeypatch.setenv(
        "BS_XLA_OPTS",
        " xla_tpu_scoped_vmem_limit_kib=32768 , a=b=c ,",
    )
    opts = compiler_options()
    assert opts == {
        "xla_tpu_scoped_vmem_limit_kib": "32768",
        "a": "b=c",  # only the first '=' splits
    }


def test_env_overrides_explicit(monkeypatch):
    monkeypatch.setenv("BS_XLA_OPTS", "k=env")
    assert compiler_options({"k": "code", "j": "1"}) == {
        "k": "env",
        "j": "1",
    }


def test_parse_comma_valued_flag(monkeypatch):
    # a comma inside a value (multi-pass disable list) must parse as a
    # continuation of the previous entry, not a malformed pair
    monkeypatch.setenv(
        "BS_XLA_OPTS",
        "xla_disable_hlo_passes=space-to-batch-converter,fusion,k=v",
    )
    assert compiler_options() == {
        "xla_disable_hlo_passes": "space-to-batch-converter,fusion",
        "k": "v",
    }


def test_parse_rejects_bare_token(monkeypatch):
    monkeypatch.setenv("BS_XLA_OPTS", "not_a_pair")
    with pytest.raises(ValueError):
        compiler_options()


def test_bs_jit_bare_and_parameterised(monkeypatch):
    monkeypatch.delenv("BS_XLA_OPTS", raising=False)

    @bs_jit
    def f(x):
        return x * 2

    assert float(f(jnp.float32(3))) == 6.0

    g = bs_jit(lambda x: x + 1, static_argnums=())
    assert float(g(jnp.float32(3))) == 4.0


def test_bs_jit_forwards_compiler_options(monkeypatch):
    # a public DebugOptions flag every backend parses: disabling a
    # pass by name must not change semantics
    monkeypatch.setenv("BS_XLA_OPTS", "xla_disable_hlo_passes=fusion")
    out = bs_jit(lambda x: x * x + x)(jnp.float32(2))
    assert float(out) == 6.0


def test_bs_jit_bad_option_fails_at_compile(monkeypatch):
    monkeypatch.setenv("BS_XLA_OPTS", "xla_definitely_not_a_flag=1")
    with pytest.raises(Exception):
        bs_jit(lambda x: x + 1)(jnp.float32(1))
