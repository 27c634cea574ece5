"""Trace-time configuration for the ops tier (env-controlled).

``BAYEFORMERS_DOT_DTYPE=bf16`` runs the sampled matmuls (forward kernel dot
and backward einsums) in bfloat16 with float32 accumulation — ~4x MXU
throughput on v5e. Variational numerics (eps generation, sigma, both
log-prob reductions and their gradients) always stay float32, so the
rtol=1e-5 log-prob parity gate is unaffected; only activations/activation
grads feel the reduced precision, as in standard bf16 transformer training.

``BAYEFORMERS_FORCE_NAIVE=1`` disables the Pallas kernels entirely (used by
the benchmark baseline and non-TPU backends).
"""
from __future__ import annotations

import os

import jax.numpy as jnp


def dot_dtype():
    if os.environ.get("BAYEFORMERS_DOT_DTYPE", "").lower() in ("bf16", "bfloat16"):
        return jnp.bfloat16
    return jnp.float32


def kernel_dot_precision(dt):
    """Precision for dots INSIDE Pallas kernels.

    bf16 operands must use DEFAULT: under a global
    ``jax_default_matmul_precision=highest`` (the test suite sets it) Mosaic
    rejects HIGHEST-precision bf16 dots with "Bad lhs type" — bf16 inputs
    with f32 accumulation are already the exact computation intended. f32
    operands inherit the global setting (None).
    """
    import jax

    return jax.lax.Precision.DEFAULT if dt == jnp.bfloat16 else None
