"""Test config: force a virtual 8-device CPU platform before jax backends init.

The container's sitecustomize registers an `axon` TPU plugin and overrides
`jax_platforms` via jax.config, so env vars alone don't stick — we re-force
cpu through jax.config here, before any backend is touched. Multi-chip
sharding tests run against this virtual mesh; real-TPU benchmarks live in
bench.py, not the test suite.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu"
