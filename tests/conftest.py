"""Test harness: CPU backend with 8 virtual devices.

The JAX-native "multi-node without a cluster" fake backend (SURVEY.md §4):
multi-chip sharding tests run on a virtual 8-device CPU mesh. The axon
sitecustomize force-registers the TPU platform, so we must override via
jax.config, not just env vars.
"""
import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
