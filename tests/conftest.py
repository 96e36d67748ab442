"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

This emulates a multi-chip TPU topology on the host (the JAX-idiomatic "fake
cluster"), letting sharding/collective tests run without TPU hardware.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment's axon sitecustomize force-registers the TPU backend via
# jax.config (which beats env vars); override it back to CPU before any
# backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from stablemtl_tpu.utils.compilation_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
