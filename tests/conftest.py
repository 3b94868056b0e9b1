import os
import sys

# Force the CPU backend with 8 virtual devices so multi-chip sharding paths
# are testable without TPU hardware. The axon sitecustomize pre-sets
# JAX_PLATFORMS=axon, so override (not setdefault) before jax is imported.
assert "jax" not in sys.modules, "conftest must run before jax import"
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
