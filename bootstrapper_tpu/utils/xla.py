"""Per-executable XLA compiler tuning that actually reaches the TPU.

Under a remote-compile TPU relay (and in general with PJRT plugins),
``XLA_FLAGS`` is parsed by the *client*, which fatally rejects
TPU-private flag names (``parse_flags_from_env.cc`` F-check) — so none
of the TPU backend's tuning knobs are reachable through the
environment. ``jax.jit(..., compiler_options=...)`` instead ships the
options inside ``ExecutableBuildOptions.env_option_overrides``, which
the server-side compiler parses itself. Round-3 measurements with this
channel (BASELINE.md):

- ``xla_disable_hlo_passes=space-to-batch-converter`` compiles the
  folded train-step gradient that otherwise CHECK-crashes (and proved
  folded training slower — the pass is load-bearing).
- ``xla_tpu_scoped_vmem_limit_kib=32768`` is ~+0.4% on the headline
  inference tile; 65536 is −4%; 98304 OOM-kills the compile helper.

``BS_XLA_OPTS`` exposes the channel operationally:

    BS_XLA_OPTS="xla_tpu_scoped_vmem_limit_kib=32768" bs predict ...

Unknown flag names abort the remote compile (HTTP 500), so typos fail
loudly at compile time rather than silently measuring nothing.
"""

from __future__ import annotations

import os
from typing import Optional


#: options validated on the headline inference graphs (BASELINE.md):
#: 32 MiB scoped vmem is +0.45% at both bench tiles vs the 16 MiB
#: default; 64 MiB is -4%; 96 MiB OOM-kills the compile helper.
#: Applied by the inference predictors on non-CPU backends only (the
#: CPU compiler rejects TPU flag names); BS_XLA_OPTS overrides.
VALIDATED_TPU_OPTS = {"xla_tpu_scoped_vmem_limit_kib": "32768"}


def tpu_default_options() -> Optional[dict]:
    """``VALIDATED_TPU_OPTS`` when an accelerator backend is active,
    else None. Import-light: only consults jax when already imported."""
    import sys

    jax = sys.modules.get("jax")
    if jax is None:
        return None
    try:
        if jax.default_backend() == "cpu":
            return None
    except Exception:
        return None
    return dict(VALIDATED_TPU_OPTS)


def compiler_options(extra: Optional[dict] = None) -> Optional[dict]:
    """Merge ``BS_XLA_OPTS`` (comma-separated ``k=v`` pairs) with
    ``extra``; returns None when there is nothing to forward so call
    sites can pass it straight to ``jax.jit(compiler_options=...)``.

    A comma-separated *value* (e.g. a two-pass
    ``xla_disable_hlo_passes=a,b`` list) stays expressible: a token
    without ``=`` is treated as a continuation of the previous entry's
    value, not as a malformed pair."""
    opts = dict(extra) if extra else {}
    env = os.environ.get("BS_XLA_OPTS", "").strip()
    if env:
        last_key = None
        for token in env.split(","):
            token = token.strip()
            if not token:
                continue
            if "=" in token:
                k, v = token.split("=", 1)
                last_key = k.strip()
                opts[last_key] = v.strip()
            elif last_key is not None:
                opts[last_key] += "," + token
            else:
                raise ValueError(
                    f"BS_XLA_OPTS entry {token!r} is not k=v"
                )
    return opts or None


def bs_jit(fn=None, /, **jit_kwargs):
    """``jax.jit`` with ``BS_XLA_OPTS`` compiler options applied.

    Usable bare (``bs_jit(fn)``) or parameterised
    (``bs_jit(fn, donate_argnums=(0,))``). Options given explicitly via
    ``jit_kwargs['compiler_options']`` are kept, with BS_XLA_OPTS
    entries layered on top (env wins — it is the operator's override).
    """
    import jax

    opts = compiler_options(jit_kwargs.pop("compiler_options", None))
    if opts:
        jit_kwargs["compiler_options"] = opts
    if fn is None:
        return lambda f: jax.jit(f, **jit_kwargs)
    return jax.jit(fn, **jit_kwargs)
