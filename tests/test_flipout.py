"""Tests for the flipout estimator (extension over the reference)."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import bayeformers_tpu as bf
from bayeformers_tpu.core import distributions as dist
from bayeformers_tpu.core import prior as prior_lib
from bayeformers_tpu.utils.optim import masked_optimizer


class Net(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(32, name="fc1")(x))
        return nn.Dense(5, name="fc2")(x)


@pytest.fixture(scope="module")
def setup():
    net = Net()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(16, 12)), jnp.float32)
    params = net.init(jax.random.key(0), x)["params"]
    apply_fn = lambda p, x: net.apply({"params": p}, x)
    bmodel, bp = bf.to_bayesian(apply_fn, params, delta=0.05)
    return net, apply_fn, bmodel, bp, x


def test_gaussian_kl_closed_form():
    """KL vs MC estimate over many draws, and the zero case."""
    rng = np.random.default_rng(0)
    mu_q = jnp.asarray(rng.normal(size=(6,)), jnp.float32)
    sig_q = jnp.asarray(rng.uniform(0.5, 1.5, (6,)), jnp.float32)
    mu_p = jnp.asarray(rng.normal(size=(6,)), jnp.float32)
    sig_p = 1.3
    kl = float(dist.gaussian_kl(mu_q, sig_q, mu_p, sig_p))
    assert float(dist.gaussian_kl(mu_q, sig_q, mu_q, sig_q)) == pytest.approx(0, abs=1e-5)
    # MC estimate of E_q[log q - log p]
    eps = jax.random.normal(jax.random.key(1), (20000, 6))
    w = mu_q[None] + sig_q[None] * eps
    lq = jnp.sum(-dist.LOG_SQRT_2PI - jnp.log(sig_q)[None] - 0.5 * eps**2, -1)
    z = (w - mu_p[None]) / sig_p
    lp = jnp.sum(-dist.LOG_SQRT_2PI - np.log(sig_p) - 0.5 * z * z, -1)
    mc = float(jnp.mean(lq - lp))
    assert kl == pytest.approx(mc, rel=0.05)


def test_flipout_forward_statistics(setup):
    """Flipout output must match the BBB predictive distribution: same mean
    and per-example output variance as sampled weights (law of the
    perturbation is identical)."""
    _, apply_fn, bmodel, bp, x = setup
    S = 300
    out_f, aux = bmodel.mc_apply_flipout(bp, jax.random.key(1), S, x)
    out_s, _ = bmodel.mc_apply(bp, jax.random.key(2), S, x)
    mean_f = np.asarray(jnp.mean(out_f, 0))
    mean_s = np.asarray(jnp.mean(out_s, 0))
    std_f = np.asarray(jnp.std(out_f, 0))
    std_s = np.asarray(jnp.std(out_s, 0))
    np.testing.assert_allclose(mean_f, mean_s, atol=4 * std_s.max() / np.sqrt(S))
    # stds agree within MC error (ratio test, loose)
    ratio = std_f / np.maximum(std_s, 1e-3)
    assert 0.7 < float(np.median(ratio)) < 1.3
    assert np.isfinite(float(aux["kl"]))
    assert aux["kl"] > 0


def test_flipout_decorrelates_examples(setup):
    """With S=1, BBB gives all examples the SAME weight draw (outputs of
    identical inputs identical); flipout decorrelates them."""
    _, apply_fn, bmodel, bp, _ = setup
    x_same = jnp.ones((8, 12))
    out_bbb, _ = bmodel.mc_apply(bp, jax.random.key(3), 1, x_same)
    out_flip, _ = bmodel.mc_apply_flipout(bp, jax.random.key(3), 1, x_same)
    assert np.allclose(np.asarray(out_bbb[0, 0]), np.asarray(out_bbb[0, 1]))
    assert not np.allclose(np.asarray(out_flip[0, 0]), np.asarray(out_flip[0, 1]))


@pytest.mark.slow
def test_flipout_gradient_variance_reduction(setup):
    """Flipout kills the CROSS-EXAMPLE covariance of the perturbation
    gradient. With B identical examples (maximal correlation — the regime
    where a shared draw is worst) the B-example gradient variance drops by
    ~1/B; with uncorrelated examples the estimators match, which is why the
    test uses a duplicated batch."""
    _, apply_fn, bmodel, bp, _ = setup
    B = 16
    x_same = jnp.ones((B, 12))
    labels = jnp.zeros((B,), jnp.int32)

    def grad_sample(mode, seed):
        def loss_fn(bp):
            mc = bmodel.mc_apply_flipout if mode == "flip" else bmodel.mc_apply
            out, aux = mc(bp, jax.random.key(seed), 1, x_same)
            return bf.elbo.cross_entropy_sum(bf.elbo.mc_logits_mean(out), labels)
        g = jax.grad(loss_fn)(bp)
        return np.asarray(g.rho["fc1/kernel"]).ravel()

    n = 16
    g_bbb = np.stack([grad_sample("bbb", i) for i in range(n)])
    g_flip = np.stack([grad_sample("flip", 100 + i) for i in range(n)])
    var_bbb = g_bbb.var(axis=0).mean()
    var_flip = g_flip.var(axis=0).mean()
    assert var_flip < 0.5 * var_bbb


def test_flipout_trains(setup):
    _, apply_fn, bmodel, bp, x = setup
    labels = jnp.asarray(np.random.default_rng(2).integers(0, 5, 16))
    tx = masked_optimizer(optax.adam(1e-2), bmodel.trainable_mask(bp))
    opt_state = tx.init(bp)

    @jax.jit
    def step(bp, opt_state, key):
        def loss_fn(bp):
            out, aux = bmodel.mc_apply_flipout(bp, key, 1, x)
            nll = bf.elbo.cross_entropy_sum(bf.elbo.mc_logits_mean(out), labels)
            return bf.elbo.elbo_loss(
                nll, aux["log_prior"], aux["log_variational_posterior"], 10
            )
        loss, grads = jax.value_and_grad(loss_fn)(bp)
        updates, opt_state = tx.update(grads, opt_state, bp)
        return optax.apply_updates(bp, updates), opt_state, loss

    losses = []
    for i in range(40):
        bp, opt_state, loss = step(bp, opt_state, jax.random.key(i))
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


@pytest.mark.slow
def test_flipout_gpt2_conv1d():
    """Flipout over the decoder family: FlaxConv1D routes through the
    transposed dense path — sigma->0 reproduces the frequentist logits and
    the analytic-KL aux surface stays well-formed."""
    import bayeformers_tpu as bf
    from bayeformers_tpu.models import gpt2 as gpt2_lib

    bundle = gpt2_lib.build_gpt2(size="tiny", seed=0)
    params = jax.tree.map(
        lambda a: jnp.where(a == 0, jnp.full_like(a, 0.01), a), bundle.params
    )
    bmodel, bp = bf.to_bayesian(bundle.apply_fn, params, delta=1e-4,
                                freeze=True)
    ids = gpt2_lib.synthetic_lm_batch(
        np.random.default_rng(0), 2, 16, bundle.config.vocab_size
    )["input_ids"]
    freq = bundle.apply_fn(params, ids)
    out, aux = bmodel.mc_apply_flipout(bp, jax.random.key(0), 2, ids)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(freq),
                               rtol=2e-3, atol=2e-3)
    assert np.isfinite(float(aux["kl"]))
