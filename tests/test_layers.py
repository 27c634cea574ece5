"""Tests for the hand-built BayesLinear / bayes_apply tier (reference
README usage parity: compose Bayesian layers directly, read summed KL)."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayeformers_tpu.core import distributions as dist
from bayeformers_tpu.nn.layers import BayesLinear, bayes_apply, collect_kl


class HandBuilt(nn.Module):
    """The README's two-layer Bayesian MLP sketch (`README.md:34-56`)."""

    sample_axis: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.relu(BayesLinear(32, name="fc1", sample_axis=self.sample_axis)(x))
        return BayesLinear(5, name="fc2", sample_axis=self.sample_axis)(x)


def test_init_and_forward():
    net = HandBuilt()
    x = jnp.ones((4, 16))
    variables = net.init(
        {"params": jax.random.key(0), "bayes": jax.random.key(1)}, x
    )
    p = variables["params"]["fc1"]
    assert p["mu"].shape == (16, 32) and p["rho"].shape == (16, 32)
    # default uniform init ranges (reference initializations.py:60)
    assert float(jnp.abs(p["mu"]).max()) <= 0.2
    assert -5 <= float(p["rho"].min()) and float(p["rho"].max()) <= -4
    out, aux = bayes_apply(net, {"params": variables["params"]}, jax.random.key(2), x)
    assert out.shape == (4, 5)
    assert aux["log_prior"].shape == (1,)
    assert np.isfinite(float(aux["log_prior"][0]))


def test_stochastic_forward_and_mc_loop():
    net = HandBuilt()
    x = jnp.ones((4, 16))
    variables = net.init({"params": jax.random.key(0), "bayes": jax.random.key(1)}, x)
    params = {"params": variables["params"]}
    out1, _ = bayes_apply(net, params, jax.random.key(10), x)
    out2, _ = bayes_apply(net, params, jax.random.key(10), x)
    out3, _ = bayes_apply(net, params, jax.random.key(11), x)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert not np.allclose(np.asarray(out1), np.asarray(out3))


def test_sample_axis_mode():
    net = HandBuilt(sample_axis=True)
    S, B = 3, 4
    x = jnp.broadcast_to(jnp.ones((B, 16)), (S, B, 16))
    variables = net.init({"params": jax.random.key(0), "bayes": jax.random.key(1)}, x)
    out, aux = bayes_apply(net, {"params": variables["params"]}, jax.random.key(2), x)
    assert out.shape == (S, B, 5)
    assert aux["log_prior"].shape == (S,)
    # per-sample weights: outputs must differ across the S axis
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))


def test_kl_matches_manual_computation():
    """Sown log_q must equal the analytic value at the drawn weights.

    Feeding the identity matrix recovers the sampled W exactly (no bias), so
    the log-probs can be recomputed analytically from the layer's output.
    """
    net = BayesLinear(8, use_bias=False, name="solo")
    x = jnp.eye(6)
    variables = net.init({"params": jax.random.key(0), "bayes": jax.random.key(1)}, x)
    params = variables["params"]
    key = jax.random.key(5)
    w, aux = bayes_apply(net, {"params": params}, key, x)  # w == sampled W
    sigma = dist.sigma_from_rho(params["rho"])
    expected_q = float(dist.gaussian_log_prob(w, params["mu"], sigma))
    np.testing.assert_allclose(
        float(aux["log_variational_posterior"][0]), expected_q, rtol=1e-4
    )
    from bayeformers_tpu.core.prior import DEFAULT_SCALE_MIXTURE

    expected_p = float(DEFAULT_SCALE_MIXTURE.log_prob(w))
    np.testing.assert_allclose(float(aux["log_prior"][0]), expected_p, rtol=1e-4)


def test_collect_kl_raises_without_bayes_layers():
    with pytest.raises(ValueError):
        collect_kl({})
