"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths can be exercised without TPU hardware
(SURVEY.md §4 — the reference has no fake-backend distributed tests; we
close that gap here).

The environment pre-sets JAX_PLATFORMS=axon and its sitecustomize pins the
platform, so the env var alone is not enough — `jax.config.update` after
import is authoritative."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
