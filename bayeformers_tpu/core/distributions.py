"""Gaussian / scale-mixture log-density numerics for Bayes-by-Backprop.

TPU-native re-implementation of the variational-parameter math in the
reference (`bayeformers/nn/parameters/gaussian.py:22-177`):

- the posterior is a mean-field Gaussian parametrized by ``(mu, rho)`` with
  ``sigma = softplus(rho)`` (reference `gaussian.py:88`),
- samples use the reparametrization trick ``w = mu + sigma * eps`` with
  ``eps ~ N(0, 1)`` (reference `gaussian.py:90-101`),
- the default prior is a two-component zero-mean scale mixture of Gaussians
  (reference `gaussian.py:119-171`).

Everything here is a pure ``jnp`` function over arrays — no modules, no
stateful singletons (the reference shares one mutable prior instance across
all layers, SURVEY.md Q2; here priors are plain config, see
:mod:`bayeformers_tpu.core.prior`).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


def sigma_from_rho(rho: jax.Array) -> jax.Array:
    """``sigma = softplus(rho) = log(1 + exp(rho))`` (reference `gaussian.py:88`)."""
    return jax.nn.softplus(rho)


def inv_softplus(y: jax.Array) -> jax.Array:
    """Inverse of softplus: ``rho = log(expm1(y))``.

    ``expm1`` keeps precision for small ``y`` where the reference's
    ``log(exp(y) - 1)`` (`layers/linear.py:141-143`) loses bits; the values
    agree to well under rtol=1e-5 in float32.
    """
    return jnp.log(jnp.expm1(y))


def gaussian_log_prob(w: jax.Array, mu: jax.Array, sigma: jax.Array) -> jax.Array:
    """Summed elementwise Gaussian log-density (reference `gaussian.py:103-116`).

    ``sum(-log(sqrt(2*pi)) - log(sigma) - (w - mu)**2 / (2 * sigma**2))``
    """
    z = (w - mu) / sigma
    return jnp.sum(-LOG_SQRT_2PI - jnp.log(sigma) - 0.5 * z * z)


def gaussian_log_prob_from_eps(eps: jax.Array, sigma: jax.Array) -> jax.Array:
    """Posterior log-density of its own sample, written in terms of ``eps``.

    For ``w = mu + sigma * eps`` we have ``(w - mu)**2 / (2 sigma**2) =
    eps**2 / 2``, so the posterior term never needs the materialized weight.
    This identity is what lets the fused Pallas path recompute ``log_q``
    without ever writing ``w`` to HBM.
    """
    return jnp.sum(-LOG_SQRT_2PI - jnp.log(sigma) - 0.5 * eps * eps)


def scale_mixture_log_prob(
    w: jax.Array, pi: float, sigma1: float, sigma2: float
) -> jax.Array:
    """Summed log-density of a two-component zero-mean Gaussian scale mixture.

    Matches ``log(pi * N(0, sigma1).pdf(w) + (1-pi) * N(0, sigma2).pdf(w)).sum()``
    (reference `gaussian.py:160-171`) but computed via ``logaddexp`` so it
    stays finite where the naive pdf underflows in float32. In the
    non-underflow regime the two forms agree to rtol 1e-5 (tested against the
    torch-evaluated reference formula in tests/test_distributions.py).
    """
    lp1 = -LOG_SQRT_2PI - math.log(sigma1) - 0.5 * (w / sigma1) ** 2
    lp2 = -LOG_SQRT_2PI - math.log(sigma2) - 0.5 * (w / sigma2) ** 2
    return jnp.sum(jnp.logaddexp(math.log(pi) + lp1, math.log1p(-pi) + lp2))


def gaussian_kl(
    mu_q: jax.Array, sigma_q: jax.Array, mu_p: jax.Array, sigma_p
) -> jax.Array:
    """Closed-form KL(q || p) between diagonal Gaussians, summed.

    Used by the flipout estimator (weights are never sampled as a single
    draw there, so the MC log-prob difference is replaced by the analytic
    KL — the algorithmically exact value the reference's detached
    ``log_q - log_p`` approximates in expectation).
    """
    var_ratio = (sigma_q / sigma_p) ** 2
    delta = (mu_q - mu_p) / sigma_p
    return 0.5 * jnp.sum(var_ratio + delta * delta - 1.0 - jnp.log(var_ratio))


def sample_gaussian(
    key: jax.Array, mu: jax.Array, rho: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Reparametrized sample ``w = mu + softplus(rho) * eps`` with explicit key.

    Returns ``(w, eps)`` so callers can reuse the same draw for both the
    forward matmul and the log-prob terms — the invariant the reference keeps
    by materializing ``w`` (`layers/linear.py:97-102`) and that the fused
    kernels keep by deterministic per-tile regeneration.
    """
    eps = jax.random.normal(key, mu.shape, dtype=mu.dtype)
    return mu + sigma_from_rho(rho) * eps, eps
