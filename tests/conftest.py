"""Test config: force CPU jax with 8 virtual devices for sharding tests.

The environment presets JAX_PLATFORMS=axon (tunneled real TPU) and a
sitecustomize hook registers that backend in every interpreter, overriding
the env var. Tests must run on local CPU — per-op round trips through the
tunnel make unit tests minutes-slow and the TPU is reserved for benchmarks —
so we override through jax.config after import, which wins over the hook.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
