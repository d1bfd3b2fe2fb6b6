"""Test config: run on CPU with 8 virtual devices so mesh/sharding logic is
exercised without TPU hardware (SURVEY.md section 4, test strategy #4).

The environment's sitecustomize imports jax and registers a TPU backend at
interpreter startup, so env vars alone are too late -- switch the platform
via jax.config before any test touches a backend.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8
