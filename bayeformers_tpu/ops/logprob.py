"""Fused KL/log-prob reduction kernels.

Computes, per MC sample s, the two scalars the reference maintains per layer
(`bayeformers/nn/layers/linear.py:99-102`):

- ``log_q[s]``  = log-density of the sampled weight under its own posterior
  ``N(mu, softplus(rho)^2)``. Written in terms of eps (``(w-mu)^2/2sigma^2 =
  eps^2/2``), so the weight itself is never needed for this term.
- ``log_p[s]``  = prior log-density at the sampled weight — either the
  scale-mixture prior (`gaussian.py:160-171`) or the MOPED per-layer Gaussian
  prior centered on the pretrained weight (`linear.py:147-150`).

The Pallas kernel regenerates the *same* deterministic eps stream as the
fused matmul (ops/common.py), accumulates masked per-tile partial sums into
SMEM scalars over the sequential TPU grid, and never materializes the sampled
weights in HBM. Gradients (custom VJP) use the closed forms

    d log_q / d rho = -sigmoid(rho) / sigma            (d/d mu = 0)
    d log_p / d mu  = score(w)
    d log_p / d rho = score(w) * eps * sigmoid(rho)

with ``score`` the prior's score function; the backward pass regenerates W
once and evaluates these elementwise in XLA.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bayeformers_tpu.core.distributions import LOG_SQRT_2PI
from bayeformers_tpu.core.prior import MOPED_PRIOR_SIGMA
from bayeformers_tpu.ops import common
from bayeformers_tpu.ops.sampled_linear import (
    naive_weights,
    regenerate_weights,
    scratch_fits,
    use_pallas,
)


def _mixture_log_pdf(w, pi: float, s1: float, s2: float):
    lp1 = -LOG_SQRT_2PI - math.log(s1) - 0.5 * (w / s1) ** 2
    lp2 = -LOG_SQRT_2PI - math.log(s2) - 0.5 * (w / s2) ** 2
    return jnp.logaddexp(math.log(pi) + lp1, math.log1p(-pi) + lp2)


def _mixture_score(w, pi: float, s1: float, s2: float):
    """d/dw log(pi N1 + (1-pi) N2), computed with normalized responsibilities."""
    a1 = math.log(pi) + (-LOG_SQRT_2PI - math.log(s1) - 0.5 * (w / s1) ** 2)
    a2 = math.log1p(-pi) + (-LOG_SQRT_2PI - math.log(s2) - 0.5 * (w / s2) ** 2)
    r1 = jnp.exp(a1 - jnp.logaddexp(a1, a2))
    return -w * (r1 / s1**2 + (1.0 - r1) / s2**2)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _logprob_kernel(
    bk: int, k_act: int, n_act: int, prior: tuple,
    seed_ref, mu_ref, rho_ref, *rest,
):
    if prior[0] == "gaussian":
        pmu_ref, logq_ref, logp_ref = rest
    else:
        (logq_ref, logp_ref) = rest
    s = pl.program_id(0)
    j = pl.program_id(1)
    kk = pl.program_id(2)
    nk = pl.num_programs(2)
    bn = mu_ref.shape[1]

    eps = common.tile_eps(seed_ref[s], j, kk, nk, (bk, bn))
    sigma = jax.nn.softplus(rho_ref[:])
    w = mu_ref[:] + sigma * eps

    # Aligned layers need no masking: when the padded dims equal the actual
    # ones the mask is a compile-time True, so the iota/compare/select work
    # is skipped entirely (same fast path as fused_linear._kernel; this is
    # the path embeddings and big-K layers take every step).
    aligned = (pl.num_programs(2) * bk == k_act) and (
        pl.num_programs(1) * bn == n_act
    )
    if aligned:
        mask = None
    else:
        rows = jax.lax.broadcasted_iota(jnp.int32, (bk, bn), 0) + kk * bk
        cols = jax.lax.broadcasted_iota(jnp.int32, (bk, bn), 1) + j * bn
        mask = (rows < k_act) & (cols < n_act)

    logq_terms = -LOG_SQRT_2PI - jnp.log(sigma) - 0.5 * eps * eps
    if prior[0] == "gaussian":
        psig = MOPED_PRIOR_SIGMA
        z = (w - pmu_ref[:]) / psig
        logp_terms = -LOG_SQRT_2PI - math.log(psig) - 0.5 * z * z
    else:
        _, pi, s1, s2 = prior
        logp_terms = _mixture_log_pdf(w, pi, s1, s2)

    if mask is None:
        t_q = jnp.sum(logq_terms)
        t_p = jnp.sum(logp_terms)
    else:
        zero = jnp.zeros_like(logq_terms)
        t_q = jnp.sum(jnp.where(mask, logq_terms, zero))
        t_p = jnp.sum(jnp.where(mask, logp_terms, zero))

    # The (S, 1) accumulators live whole in SMEM (index by s); the TPU grid is
    # sequential so read-modify-write accumulation is race-free.
    @pl.when((j == 0) & (kk == 0))
    def _init():
        logq_ref[s, 0] = t_q
        logp_ref[s, 0] = t_p

    @pl.when((j > 0) | (kk > 0))
    def _acc():
        logq_ref[s, 0] += t_q
        logp_ref[s, 0] += t_p


def _pallas_logprobs(mu, rho, seeds, prior: tuple, prior_mu=None):
    K, N = mu.shape
    S = seeds.shape[0]
    Kp, Np = common.pad_amounts(K, N)
    bk, bn = common.pick_tiles(Kp, Np)

    def pad(a):
        return jnp.pad(a, ((0, Kp - K), (0, Np - N)))

    inputs = [seeds.astype(jnp.int32), pad(mu), pad(rho)]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((bk, bn), lambda s, j, kk: (kk, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((bk, bn), lambda s, j, kk: (kk, j), memory_space=pltpu.VMEM),
    ]
    if prior[0] == "gaussian":
        inputs.append(pad(prior_mu))
        in_specs.append(
            pl.BlockSpec((bk, bn), lambda s, j, kk: (kk, j), memory_space=pltpu.VMEM)
        )

    logq, logp = pl.pallas_call(
        functools.partial(_logprob_kernel, bk, K, N, prior),
        grid=(S, Np // bn, Kp // bk),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((S, 1), lambda s, j, kk: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((S, 1), lambda s, j, kk: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((S, 1), jnp.float32),
            jax.ShapeDtypeStruct((S, 1), jnp.float32),
        ),
    )(*inputs)
    return logq[:, 0], logp[:, 0]


# ---------------------------------------------------------------------------
# Naive path (shares the jax.random eps stream with naive_sampled_dense)
# ---------------------------------------------------------------------------

def _naive_logprobs(mu, rho, seeds, prior: tuple, prior_mu=None):
    w = naive_weights(mu, rho, seeds)
    sigma = jax.nn.softplus(rho)
    eps = (w - mu[None]) / sigma[None]
    logq = jnp.sum(
        -LOG_SQRT_2PI - jnp.log(sigma)[None] - 0.5 * eps * eps, axis=(1, 2)
    )
    if prior[0] == "gaussian":
        psig = MOPED_PRIOR_SIGMA
        z = (w - prior_mu[None]) / psig
        logp = jnp.sum(-LOG_SQRT_2PI - math.log(psig) - 0.5 * z * z, axis=(1, 2))
    else:
        _, pi, s1, s2 = prior
        logp = jnp.sum(_mixture_log_pdf(w, pi, s1, s2), axis=(1, 2))
    return logq, logp


# ---------------------------------------------------------------------------
# Public ops with custom VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _logprobs_mixture(mu, rho, seeds, mixture: tuple[float, float, float]):
    prior = ("mixture",) + mixture
    if use_pallas() and scratch_fits(*mu.shape):
        return _pallas_logprobs(mu, rho, seeds, prior)
    return _naive_logprobs(mu, rho, seeds, prior)


def _mixture_fwd(mu, rho, seeds, mixture):
    return _logprobs_mixture(mu, rho, seeds, mixture), (mu, rho, seeds)


def _mixture_bwd(mixture, res, g):
    mu, rho, seeds = res
    g_q, g_p = g
    pi, s1, s2 = mixture
    w = regenerate_weights(mu, rho, seeds)
    sigma = jax.nn.softplus(rho)
    eps = (w - mu[None]) / sigma[None]
    score = _mixture_score(w, pi, s1, s2)
    gp = g_p[:, None, None]
    dmu = jnp.sum(gp * score, axis=0)
    drho = (
        jnp.sum(gp * score * eps, axis=0) - jnp.sum(g_q) / sigma
    ) * jax.nn.sigmoid(rho)
    dseeds = np.zeros(seeds.shape, dtype=jax.dtypes.float0)
    return dmu, drho, dseeds


_logprobs_mixture.defvjp(_mixture_fwd, _mixture_bwd)


@jax.custom_vjp
def _logprobs_gaussian(mu, rho, seeds, prior_mu):
    prior = ("gaussian",)
    if use_pallas() and scratch_fits(*mu.shape):
        return _pallas_logprobs(mu, rho, seeds, prior, prior_mu)
    return _naive_logprobs(mu, rho, seeds, prior, prior_mu)


def _gaussian_fwd(mu, rho, seeds, prior_mu):
    return _logprobs_gaussian(mu, rho, seeds, prior_mu), (mu, rho, seeds, prior_mu)


def _gaussian_bwd(res, g):
    mu, rho, seeds, prior_mu = res
    g_q, g_p = g
    w = regenerate_weights(mu, rho, seeds)
    sigma = jax.nn.softplus(rho)
    eps = (w - mu[None]) / sigma[None]
    score = -(w - prior_mu[None]) / MOPED_PRIOR_SIGMA**2
    gp = g_p[:, None, None]
    dmu = jnp.sum(gp * score, axis=0)
    drho = (
        jnp.sum(gp * score * eps, axis=0) - jnp.sum(g_q) / sigma
    ) * jax.nn.sigmoid(rho)
    dprior_mu = -jnp.sum(gp * score, axis=0)
    dseeds = np.zeros(seeds.shape, dtype=jax.dtypes.float0)
    return dmu, drho, dseeds, dprior_mu


_logprobs_gaussian.defvjp(_gaussian_fwd, _gaussian_bwd)


def sampled_logprobs(mu, rho, seeds, *, mixture=None, prior_mu=None):
    """Per-sample ``(log_q, log_p)`` for a sampled (K, N) weight.

    Exactly one of ``mixture=(pi, sigma1, sigma2)`` (static floats) or
    ``prior_mu`` (MOPED Gaussian prior center, array) must be given. Uses the
    same eps stream as :func:`sampled_dense` for the same ``seeds``.
    """
    if (mixture is None) == (prior_mu is None):
        raise ValueError("pass exactly one of `mixture` or `prior_mu`")
    if mixture is not None:
        return _logprobs_mixture(mu, rho, seeds, tuple(float(v) for v in mixture))
    return _logprobs_gaussian(mu, rho, seeds, prior_mu)
