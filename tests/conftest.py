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
#
# tests/cache_seed/ is a COMMITTED snapshot of that cache (`make test-seed`),
# hardlinked in before the run: a fresh-from-git checkout starts part-warm
# (the round-5 cold gate measured 28:47 on a 1-core box, nearly all XLA CPU
# compiles; stale seed entries are keyed away and simply never requested).
if not os.environ.get("BAYEFORMERS_NO_COMPILE_CACHE"):
    _repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    _cache = os.path.join(_repo, ".jax_cache_cpu")
    _seed = os.path.join(_repo, "tests", "cache_seed")
    if os.path.isdir(_seed):
        os.makedirs(_cache, exist_ok=True)
        import shutil

        for _n in os.listdir(_seed):
            _dst = os.path.join(_cache, _n)
            if not os.path.exists(_dst):
                try:
                    os.link(os.path.join(_seed, _n), _dst)
                except OSError:
                    shutil.copy(os.path.join(_seed, _n), _dst)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
