"""Test configuration: force the CPU backend with 8 virtual devices so tests
are deterministic fp32 and sharding tests run without TPU hardware (the
JAX-native replacement for the reference's nonexistent distributed testing;
SURVEY.md §4).

Note: this environment pins JAX_PLATFORMS=axon (TPU) via sitecustomize, so the
env var alone is not enough — we must override the config after importing jax,
before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"
