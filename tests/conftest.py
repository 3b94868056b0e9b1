import os
import sys

# The axon sitecustomize imports jax at interpreter start, so env-var
# overrides are too late; use jax.config instead. Tests run on the CPU
# backend with 8 virtual devices so multi-chip sharding is exercised
# deterministically without TPU hardware.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
