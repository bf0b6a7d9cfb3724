"""Test config: run everything on CPU with 8 virtual devices (SURVEY.md §5.3).

The container's sitecustomize imports jax and registers the axon TPU backend
at interpreter startup, so env vars alone don't stick — we flip the platform
via jax.config before any backend is initialized. XLA_FLAGS is read lazily at
CPU-client creation, so setting it here is early enough.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

if not os.environ.get("CPC_TPU_TESTS"):
    # CPC_TPU_TESTS=1 keeps the real backend for the on-TPU golden pin
    # (tests/test_golden_tpu.py); everything else runs on the virtual mesh
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_prng_impl", "threefry2x32")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
