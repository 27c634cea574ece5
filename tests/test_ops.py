"""Backend-agnostic tests of the sampled-weight ops (naive dispatch on CPU).

The Pallas kernels themselves are covered by tests/test_ops_tpu.py (run with
BAYEFORMERS_TEST_TPU=1 on a TPU host); here we pin down the op *semantics*
that both dispatch paths share: eps-stream consistency across ops, custom-VJP
math vs autodiff, and value parity with the core distribution functions.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayeformers_tpu.core import distributions as dist
from bayeformers_tpu.core import prior as prior_lib
from bayeformers_tpu.ops import logprob as lp
from bayeformers_tpu.ops import sampled_linear as sl

MIX = (0.5, 1.0, float(np.exp(-6.0)))


@pytest.fixture
def problem():
    rng = np.random.default_rng(3)
    S, M, K, N = 3, 16, 48, 24
    x = jnp.asarray(rng.normal(size=(S, M, K)).astype(np.float32))
    mu = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05)
    rho = jnp.asarray(rng.uniform(-5, -4, (K, N)).astype(np.float32))
    pm = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05)
    seeds = jnp.arange(5, 5 + S, dtype=jnp.int32)
    return x, mu, rho, pm, seeds


def test_sampled_dense_matches_regenerated_weights(problem):
    x, mu, rho, _, seeds = problem
    y = sl.sampled_dense(x, mu, rho, seeds)
    w = sl.regenerate_weights(mu, rho, seeds)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(jnp.einsum("smk,skn->smn", x, w)), rtol=1e-5
    )
    # per-sample weights differ
    assert not np.allclose(np.asarray(w[0]), np.asarray(w[1]))


def test_logprobs_match_distribution_functions(problem):
    _, mu, rho, pm, seeds = problem
    w = sl.regenerate_weights(mu, rho, seeds)
    sigma = dist.sigma_from_rho(rho)
    logq, logp = lp.sampled_logprobs(mu, rho, seeds, mixture=MIX)
    logq2, logp2 = lp.sampled_logprobs(mu, rho, seeds, prior_mu=pm)
    for s in range(w.shape[0]):
        np.testing.assert_allclose(
            float(logq[s]), float(dist.gaussian_log_prob(w[s], mu, sigma)), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(logp[s]), float(dist.scale_mixture_log_prob(w[s], *MIX)), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(logp2[s]), float(prior_lib.moped_prior_log_prob(w[s], pm)), rtol=1e-5
        )
    np.testing.assert_allclose(np.asarray(logq), np.asarray(logq2), rtol=1e-6)


def test_sampled_dense_vjp_vs_autodiff(problem):
    """Custom backward must equal autodiff through w = mu + sigma*stop_grad(eps)."""
    x, mu, rho, _, seeds = problem
    w = sl.regenerate_weights(mu, rho, seeds)
    eps = jax.lax.stop_gradient((w - mu[None]) / dist.sigma_from_rho(rho)[None])
    g = jnp.asarray(
        np.random.default_rng(7).normal(size=(x.shape[0], x.shape[1], mu.shape[1]))
    ).astype(jnp.float32)

    def ref(x, mu, rho):
        ww = mu[None] + dist.sigma_from_rho(rho)[None] * eps
        return jnp.sum(jnp.einsum("smk,skn->smn", x, ww) * g)

    def ours(x, mu, rho):
        return jnp.sum(sl.sampled_dense(x, mu, rho, seeds) * g)

    gref = jax.grad(ref, argnums=(0, 1, 2))(x, mu, rho)
    gour = jax.grad(ours, argnums=(0, 1, 2))(x, mu, rho)
    for a, b in zip(gref, gour):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("prior_kind", ["mixture", "gaussian"])
def test_logprobs_vjp_vs_float64_closed_form(problem, prior_kind):
    """Custom backward vs float64 closed forms.

    (Reverse-mode autodiff of the reparametrized log_q suffers catastrophic
    cancellation of the +-z/sigma cotangents in f32, so f64 analytics — not
    f32 autodiff — is the ground truth here.)
    """
    _, mu, rho, pm, seeds = problem
    w64 = np.asarray(sl.regenerate_weights(mu, rho, seeds), np.float64)
    mu64 = np.asarray(mu, np.float64)
    rho64 = np.asarray(rho, np.float64)
    pm64 = np.asarray(pm, np.float64)
    sig64 = np.logaddexp(0.0, rho64)
    sigmoid64 = 1.0 / (1.0 + np.exp(-rho64))
    eps64 = (w64 - mu64) / sig64
    gq, gp = 1.3, 0.7

    if prior_kind == "mixture":
        pi, s1, s2 = MIX
        a1 = np.log(pi) - np.log(s1) - 0.5 * (w64 / s1) ** 2
        a2 = np.log1p(-pi) - np.log(s2) - 0.5 * (w64 / s2) ** 2
        r1 = np.exp(a1 - np.logaddexp(a1, a2))
        score = -w64 * (r1 / s1**2 + (1 - r1) / s2**2)
        dpm = np.zeros_like(pm64)
    else:
        score = -(w64 - pm64) / prior_lib.MOPED_PRIOR_SIGMA**2
        dpm = -gp * score.sum(0)
    S = w64.shape[0]
    dmu = gp * score.sum(0)
    drho = (gp * (score * eps64).sum(0) - gq * S / sig64) * sigmoid64

    def ours(mu, rho, pm):
        if prior_kind == "mixture":
            lq, lpv = lp.sampled_logprobs(mu, rho, seeds, mixture=MIX)
        else:
            lq, lpv = lp.sampled_logprobs(mu, rho, seeds, prior_mu=pm)
        return gq * jnp.sum(lq) + gp * jnp.sum(lpv)

    gour = jax.grad(ours, argnums=(0, 1, 2))(mu, rho, pm)
    for name, ref64, b in zip(("mu", "rho", "pm"), (dmu, drho, dpm), gour):
        atol = 1e-5 * float(np.max(np.abs(ref64))) + 1e-7
        np.testing.assert_allclose(
            ref64, np.asarray(b, np.float64), rtol=1e-5, atol=atol, err_msg=name
        )


def test_logprob_arg_validation(problem):
    _, mu, rho, pm, seeds = problem
    with pytest.raises(ValueError):
        lp.sampled_logprobs(mu, rho, seeds)
    with pytest.raises(ValueError):
        lp.sampled_logprobs(mu, rho, seeds, mixture=MIX, prior_mu=pm)


def test_determinism_across_ops(problem):
    """Same seeds => identical weights from every op, distinct across seeds."""
    _, mu, rho, _, seeds = problem
    w1 = sl.regenerate_weights(mu, rho, seeds)
    w2 = sl.regenerate_weights(mu, rho, seeds)
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    w3 = sl.regenerate_weights(mu, rho, seeds + 100)
    assert not np.allclose(np.asarray(w1), np.asarray(w3))
