"""L0 numerics parity: our jnp math vs the reference's torch formulas.

The torch expressions below re-state the documented reference math
(`bayeformers/nn/parameters/gaussian.py:88,103-116,160-171` and
`bayeformers/nn/layers/linear.py:140-150`) verbatim so golden values come
from an independent implementation, at the parity gate rtol=1e-5
(BASELINE.md).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from bayeformers_tpu.core import distributions as dist
from bayeformers_tpu.core import init as init_lib
from bayeformers_tpu.core import prior as prior_lib

RTOL = 1e-5


def torch_gaussian_log_prob(w, mu, rho):
    sigma = torch.nn.functional.softplus(rho)
    return (
        -np.log(np.sqrt(2 * np.pi))
        - torch.log(sigma)
        - ((w - mu) ** 2) / (2 * sigma**2)
    ).sum()


def torch_mixture_log_prob(w, pi, s1, s2):
    n1 = torch.distributions.Normal(torch.tensor(0.0), torch.tensor(s1))
    n2 = torch.distributions.Normal(torch.tensor(0.0), torch.tensor(s2))
    p1, p2 = torch.exp(n1.log_prob(w)), torch.exp(n2.log_prob(w))
    return torch.log(pi * p1 + (1.0 - pi) * p2).sum()


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_sigma_from_rho(rng):
    rho = rng.uniform(-5, 2, (64,)).astype(np.float32)
    ours = dist.sigma_from_rho(jnp.asarray(rho))
    theirs = torch.nn.functional.softplus(torch.from_numpy(rho)).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=RTOL)


def test_gaussian_log_prob_parity(rng):
    mu = rng.uniform(-0.2, 0.2, (32, 48)).astype(np.float32)
    rho = rng.uniform(-5, -4, (32, 48)).astype(np.float32)
    w = (mu + rng.normal(size=mu.shape) * 0.01).astype(np.float32)
    sigma = dist.sigma_from_rho(jnp.asarray(rho))
    ours = dist.gaussian_log_prob(jnp.asarray(w), jnp.asarray(mu), sigma)
    theirs = torch_gaussian_log_prob(
        torch.from_numpy(w), torch.from_numpy(mu), torch.from_numpy(rho)
    )
    np.testing.assert_allclose(float(ours), float(theirs), rtol=RTOL)


def test_gaussian_log_prob_from_eps_identity(rng):
    mu = rng.uniform(-0.2, 0.2, (16, 16)).astype(np.float32)
    rho = rng.uniform(-5, -4, (16, 16)).astype(np.float32)
    eps = rng.normal(size=mu.shape).astype(np.float32)
    sigma = dist.sigma_from_rho(jnp.asarray(rho))
    w = jnp.asarray(mu) + sigma * jnp.asarray(eps)
    a = dist.gaussian_log_prob(w, jnp.asarray(mu), sigma)
    b = dist.gaussian_log_prob_from_eps(jnp.asarray(eps), sigma)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-4)


def test_scale_mixture_parity_default_prior(rng):
    # Default prior values: pi=0.5, sigma1=e^0, sigma2=e^-6 (gaussian.py:175-177)
    w = rng.uniform(-0.5, 0.5, (64, 64)).astype(np.float32)
    p = prior_lib.DEFAULT_SCALE_MIXTURE
    ours = p.log_prob(jnp.asarray(w))
    theirs = torch_mixture_log_prob(torch.from_numpy(w), p.pi, p.sigma1, p.sigma2)
    np.testing.assert_allclose(float(ours), float(theirs), rtol=RTOL)


def test_scale_mixture_stable_where_naive_underflows():
    # naive pdf underflow region: logaddexp form must stay finite & correct
    w = jnp.array([40.0, -40.0], jnp.float32)
    val = dist.scale_mixture_log_prob(w, 0.5, 1.0, math.exp(-6.0))
    expected = 2 * (math.log(0.5) - 0.5 * math.log(2 * math.pi) - 0.5 * 40.0**2)
    np.testing.assert_allclose(float(val), expected, rtol=1e-6)


def test_moped_rho_parity(rng):
    w = rng.normal(size=(64, 64)).astype(np.float32) * 0.05
    w[0, 0] = 0.0  # triggers the -inf -> 0 patch (linear.py:144)
    delta = 0.05
    ours = np.asarray(init_lib.moped_rho(jnp.asarray(w), delta))
    # Ground truth: the reference formula log(exp(delta*|w|) - 1) evaluated in
    # float64 (the reference's own float32 exp(x)-1 loses ~3 digits for tiny x;
    # our expm1 matches the true value, which is the parity that matters).
    tw = torch.from_numpy(w).double()
    theirs = torch.log(torch.exp(delta * torch.abs(tw)) - 1.0)
    theirs[theirs == float("-inf")] = 0.0
    np.testing.assert_allclose(ours, theirs.numpy(), rtol=1e-5)
    assert ours[0, 0] == 0.0
    assert np.all(np.isfinite(ours))


def test_moped_prior_sigma_is_softplus_one():
    # Q3: prior.rho = 1.0 => sigma = softplus(1) ~= 1.3133, not 1.0
    expected = float(torch.nn.functional.softplus(torch.tensor(1.0)))
    np.testing.assert_allclose(prior_lib.MOPED_PRIOR_SIGMA, expected, rtol=1e-7)


def test_moped_prior_log_prob_parity(rng):
    w = rng.normal(size=(32,)).astype(np.float32) * 0.1
    mu = rng.normal(size=(32,)).astype(np.float32) * 0.1
    ours = prior_lib.moped_prior_log_prob(jnp.asarray(w), jnp.asarray(mu))
    theirs = torch_gaussian_log_prob(
        torch.from_numpy(w), torch.from_numpy(mu), torch.ones(32)
    )
    np.testing.assert_allclose(float(ours), float(theirs), rtol=RTOL)


def test_sample_gaussian_reparam(rng):
    mu = jnp.asarray(rng.uniform(-0.2, 0.2, (8, 8)).astype(np.float32))
    rho = jnp.asarray(rng.uniform(-5, -4, (8, 8)).astype(np.float32))
    key = jax.random.key(0)
    w, eps = dist.sample_gaussian(key, mu, rho)
    np.testing.assert_allclose(
        np.asarray(w), np.asarray(mu + dist.sigma_from_rho(rho) * eps), rtol=1e-6
    )
    # determinism: same key -> same draw
    w2, _ = dist.sample_gaussian(key, mu, rho)
    np.testing.assert_array_equal(np.asarray(w), np.asarray(w2))


def test_inv_softplus_roundtrip(rng):
    y = rng.uniform(1e-4, 5.0, (128,)).astype(np.float32)
    rho = dist.inv_softplus(jnp.asarray(y))
    back = dist.sigma_from_rho(rho)
    np.testing.assert_allclose(np.asarray(back), y, rtol=1e-5)


def test_uniform_init_ranges():
    init = init_lib.DEFAULT_UNIFORM
    mu, rho = init(jax.random.key(1), (1000,))
    assert float(mu.min()) >= -0.2 and float(mu.max()) <= 0.2
    assert float(rho.min()) >= -5.0 and float(rho.max()) <= -4.0
    # initial sigma ~ softplus(-4.5) ~= 0.011 (SURVEY.md C5)
    s = dist.sigma_from_rho(rho)
    assert 0.005 < float(s.mean()) < 0.02
