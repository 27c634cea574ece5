"""Test config: run everything on a virtual 8-device CPU mesh.

This is the JAX-idiomatic "fake backend" (SURVEY.md §4): sharding and
multi-chip behavior are exercised without TPU hardware by forcing the host
platform to expose 8 devices. jax may already be imported at interpreter
startup in this environment, so the platform is forced via jax.config (which
works any time before first backend use), while XLA_FLAGS still must be set
before backend initialization.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax  # noqa: E402

# BAYEFORMERS_TEST_TPU=1 keeps the real TPU backend so tests/test_ops_tpu.py
# can exercise the Pallas kernels; everything else runs on the CPU mesh.
if os.environ.get("BAYEFORMERS_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the default gate's wall time is almost all
# XLA compiles (ROUND4.md: 16:42, flat 25-35 s compile-bound tail), so repeat
# runs hit the disk cache instead. Keyed on HLO + flags + jaxlib version —
# code changes that alter a traced program re-compile automatically. Separate
# directory from bench.py's TPU cache. Opt out: BAYEFORMERS_NO_COMPILE_CACHE.
if not os.environ.get("BAYEFORMERS_NO_COMPILE_CACHE"):
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache_cpu"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
