"""Tests for the local reparameterization estimator (extension over the
reference; Kingma et al. 2015, arXiv:1506.02557 — see nn/lrt.py)."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import bayeformers_tpu as bf
from bayeformers_tpu.core import distributions as dist
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


def test_lrt_single_layer_exact_marginal():
    """One linear layer: the LRT output must be distributed EXACTLY as
    N(x@mu + b_mu, (x^2)@sigma^2 + b_sigma^2) — checked against the
    closed-form mean/std (eq. 6 of the paper), not just against sampling."""
    lin = nn.Dense(7)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(5, 9)), jnp.float32)
    params = lin.init(jax.random.key(0), x)["params"]
    apply_fn = lambda p, x: lin.apply({"params": p}, x)
    bmodel, bp = bf.to_bayesian(apply_fn, params, delta=0.1)
    S = 4000
    out, _ = bmodel.mc_apply_lrt(bp, jax.random.key(2), S, x)
    mu, b = bp.params["kernel"], bp.params["bias"]
    sig_w = dist.sigma_from_rho(bp.rho["kernel"])
    sig_b = dist.sigma_from_rho(bp.rho["bias"])
    mean_true = x @ mu + b[None]
    std_true = jnp.sqrt((x * x) @ (sig_w * sig_w) + (sig_b * sig_b)[None])
    mean_emp = np.asarray(jnp.mean(out, 0))
    std_emp = np.asarray(jnp.std(out, 0))
    np.testing.assert_allclose(
        mean_emp, np.asarray(mean_true),
        atol=4 * float(std_true.max()) / np.sqrt(S),
    )
    np.testing.assert_allclose(std_emp, np.asarray(std_true), rtol=0.1)


def test_lrt_forward_statistics(setup):
    """Through a nonlinearity the LRT predictive must match the BBB
    predictive distribution's per-example mean and spread (marginals are
    exact layer-by-layer)."""
    _, apply_fn, bmodel, bp, x = setup
    S = 300
    out_l, aux = bmodel.mc_apply_lrt(bp, jax.random.key(1), S, x)
    out_s, _ = bmodel.mc_apply(bp, jax.random.key(2), S, x)
    mean_l = np.asarray(jnp.mean(out_l, 0))
    mean_s = np.asarray(jnp.mean(out_s, 0))
    std_l = np.asarray(jnp.std(out_l, 0))
    std_s = np.asarray(jnp.std(out_s, 0))
    np.testing.assert_allclose(mean_l, mean_s, atol=4 * std_s.max() / np.sqrt(S))
    ratio = std_l / np.maximum(std_s, 1e-3)
    assert 0.7 < float(np.median(ratio)) < 1.3
    assert np.isfinite(float(aux["kl"]))
    assert aux["kl"] > 0


def test_lrt_decorrelates_examples(setup):
    """With S=1, BBB gives identical inputs identical outputs (one shared
    weight draw); LRT noise is per-activation, so they differ."""
    _, apply_fn, bmodel, bp, _ = setup
    x_same = jnp.ones((8, 12))
    out_bbb, _ = bmodel.mc_apply(bp, jax.random.key(3), 1, x_same)
    out_lrt, _ = bmodel.mc_apply_lrt(bp, jax.random.key(3), 1, x_same)
    assert np.allclose(np.asarray(out_bbb[0, 0]), np.asarray(out_bbb[0, 1]))
    assert not np.allclose(np.asarray(out_lrt[0, 0]), np.asarray(out_lrt[0, 1]))


def test_lrt_gradient_variance_reduction(setup):
    """Zero cross-example perturbation covariance: with B identical examples
    (worst case for a shared draw) the LRT gradient variance must be well
    below BBB's — the paper's Var_LRT <= Var_BBB result."""
    _, apply_fn, bmodel, bp, _ = setup
    B = 16
    x_same = jnp.ones((B, 12))
    labels = jnp.zeros((B,), jnp.int32)

    def grad_sample(mode, seed):
        def loss_fn(bp):
            mc = bmodel.mc_apply_lrt if mode == "lrt" else bmodel.mc_apply
            out, aux = mc(bp, jax.random.key(seed), 1, x_same)
            return bf.elbo.cross_entropy_sum(bf.elbo.mc_logits_mean(out), labels)
        g = jax.grad(loss_fn)(bp)
        return np.asarray(g.rho["fc1/kernel"]).ravel()

    n = 16
    g_bbb = np.stack([grad_sample("bbb", i) for i in range(n)])
    g_lrt = np.stack([grad_sample("lrt", 100 + i) for i in range(n)])
    assert g_lrt.var(axis=0).mean() < 0.5 * g_bbb.var(axis=0).mean()


def test_lrt_trains(setup):
    _, apply_fn, bmodel, bp, x = setup
    labels = jnp.asarray(np.random.default_rng(2).integers(0, 5, 16))
    tx = masked_optimizer(optax.adam(1e-2), bmodel.trainable_mask(bp))
    opt_state = tx.init(bp)

    @jax.jit
    def step(bp, opt_state, key):
        def loss_fn(bp):
            out, aux = bmodel.mc_apply_lrt(bp, key, 1, x)
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


def test_lrt_gpt2_conv1d():
    """Decoder family: FlaxConv1D routes through the transposed dense path —
    sigma->0 reproduces the frequentist logits, KL aux well-formed."""
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
    out, aux = bmodel.mc_apply_lrt(bp, jax.random.key(0), 2, ids)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(freq),
                               rtol=2e-3, atol=2e-3)
    assert np.isfinite(float(aux["kl"]))


def test_lrt_embedding():
    """Converted nn.Embed tables ride the per-occurrence activation-noise
    path: sigma->0 parity with the deterministic lookup, KL counted once."""
    from bayeformers_tpu.nn.surgery import DEFAULT_RULES, EMBEDDING_RULE

    class EmbNet(nn.Module):
        @nn.compact
        def __call__(self, ids):
            h = nn.Embed(11, 8, name="emb")(ids)
            return nn.Dense(4, name="head")(h.mean(axis=1))

    net = EmbNet()
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 11, (6, 5)))
    params = net.init(jax.random.key(0), ids)["params"]
    # MOPED's -inf patch gives exactly-zero weights sigma=softplus(0): keep
    # the sigma->0 limit honest by nudging flax's zero-init biases
    params = jax.tree.map(
        lambda a: jnp.where(a == 0, jnp.full_like(a, 0.01), a), params
    )
    apply_fn = lambda p, ids: net.apply({"params": p}, ids)
    bmodel, bp = bf.to_bayesian(
        apply_fn, params, delta=1e-5, freeze=True,
        rules=tuple(DEFAULT_RULES) + (EMBEDDING_RULE,),
    )
    assert "emb/embedding" in bmodel.spec.paths
    freq = apply_fn(params, ids)
    out, aux = bmodel.mc_apply_lrt(bp, jax.random.key(1), 3, ids)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(freq),
                               rtol=1e-3, atol=1e-4)
    assert np.isfinite(float(aux["kl"]))


def test_pick_mc_local(setup):
    """training.pick_mc resolves 'local' (and the 'lrt' alias) and the jitted
    ELBO step factory runs it end to end."""
    import bayeformers_tpu.training as training

    _, apply_fn, bmodel, bp, x = setup
    assert training.pick_mc(bmodel, True, "local") == bmodel.mc_apply_lrt
    assert training.pick_mc(bmodel, True, "lrt") == bmodel.mc_apply_lrt
    tx = masked_optimizer(optax.adam(1e-3), bmodel.trainable_mask(bp))
    step = training.make_elbo_train_step(
        bmodel, tx, n_samples=2, n_batches=4, estimator="local",
        input_keys=("x",),
    )
    labels = jnp.asarray(np.random.default_rng(3).integers(0, 5, 16))
    bp2, _, metrics = step(bp, tx.init(bp), jax.random.key(0),
                           {"x": x, "labels": labels})
    assert np.isfinite(float(metrics["loss"]))
    assert not np.allclose(
        np.asarray(bp2.rho["fc1/kernel"]), np.asarray(bp.rho["fc1/kernel"])
    )
