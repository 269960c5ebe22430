"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding paths are exercised without TPU hardware.

Note: this image's sitecustomize registers a remote TPU ("axon") backend and
pins ``jax_platforms`` programmatically, so the env var alone is not enough --
we must override the jax config before any backend is initialised.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
