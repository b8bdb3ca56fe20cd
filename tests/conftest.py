"""Test configuration: tests always run on CPU with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware."""

import os

# Hard override: the ambient environment pins JAX_PLATFORMS=axon (TPU tunnel).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
