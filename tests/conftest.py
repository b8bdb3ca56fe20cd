"""Test configuration: tests always run on CPU with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware.

Note: the ambient environment registers an 'axon' TPU backend via
sitecustomize and pins jax_platforms through jax.config, so an env var is not
enough -- we must override the config itself before any computation runs.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
