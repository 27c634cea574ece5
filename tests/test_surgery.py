"""Property tests for the `to_bayesian` pytree transform (SURVEY.md §4).

Covers: registry scope (only dense kernels/biases convert, reference
`nn/__init__.py:25`), tree isomorphism, MOPED init values, freeze masking,
forward determinism, and differentiable KL (the deliberate fix of Q1).
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax.traverse_util import flatten_dict

import bayeformers_tpu as bf
from bayeformers_tpu.utils.optim import masked_optimizer


class SmallNet(nn.Module):
    """Dense + LayerNorm + Embed: only the Dense leaves should convert."""

    @nn.compact
    def __call__(self, x, tokens):
        emb = nn.Embed(num_embeddings=7, features=4, name="embed")(tokens)
        x = jnp.concatenate([x, emb.reshape(x.shape[0], -1)], axis=-1)
        x = nn.Dense(16, name="fc1")(x)
        x = nn.LayerNorm(name="ln")(x)
        x = nn.relu(x)
        return nn.Dense(3, name="fc2", use_bias=False)(x)


@pytest.fixture(scope="module")
def net_and_params():
    net = SmallNet()
    x = jnp.ones((2, 5))
    tokens = jnp.zeros((2, 3), jnp.int32)
    params = net.init(jax.random.key(0), x, tokens)["params"]
    apply_fn = lambda p, *a, **kw: net.apply({"params": p}, *a, **kw)
    return net, params, apply_fn, (x, tokens)


def test_convertible_paths_scope(net_and_params):
    _, params, _, _ = net_and_params
    paths = bf.find_convertible_paths(params)
    assert set(paths) == {"fc1/kernel", "fc1/bias", "fc2/kernel"}
    # embedding rule is opt-in (the north-star extension)
    with_emb = bf.find_convertible_paths(
        params, rules=bf.DEFAULT_RULES + (bf.EMBEDDING_RULE,)
    )
    assert set(with_emb) == {"fc1/kernel", "fc1/bias", "fc2/kernel", "embed/embedding"}


def test_random_init_conversion(net_and_params):
    _, params, apply_fn, args = net_and_params
    bmodel, bp = bf.to_bayesian(apply_fn, params, rng=jax.random.key(1))
    # tree isomorphism: same leaf paths as the original
    assert flatten_dict(bp.params).keys() == flatten_dict(params).keys()
    # non-registry leaves untouched (shared, not copied)
    np.testing.assert_array_equal(
        np.asarray(bp.params["ln"]["scale"]), np.asarray(params["ln"]["scale"])
    )
    # converted mu re-initialized in (-0.2, 0.2); rho in (-5, -4)
    mu = bp.params["fc1"]["kernel"]
    assert float(jnp.abs(mu).max()) <= 0.2
    assert all(float(r.min()) >= -5 and float(r.max()) <= -4 for r in bp.rho.values())
    assert bp.prior_mu == {}
    out, aux = bmodel.apply(bp, jax.random.key(2), *args)
    assert out.shape == (2, 3)
    assert np.isfinite(float(aux["log_prior"]))
    assert np.isfinite(float(aux["log_variational_posterior"]))


def test_moped_conversion_values(net_and_params):
    _, params, apply_fn, _ = net_and_params
    delta = 0.05
    bmodel, bp = bf.to_bayesian(apply_fn, params, delta=delta, freeze=True)
    w = params["fc1"]["kernel"]
    np.testing.assert_array_equal(  # mu <- pretrained weight
        np.asarray(bp.params["fc1"]["kernel"]), np.asarray(w)
    )
    np.testing.assert_allclose(  # rho <- softplus^-1(delta*|w|)
        np.asarray(bp.rho["fc1/kernel"]),
        np.asarray(bf.moped_rho(w, delta)),
    )
    np.testing.assert_array_equal(  # prior centered on pretrained weight
        np.asarray(bp.prior_mu["fc1/kernel"]), np.asarray(w)
    )
    assert bmodel.spec.moped and bmodel.spec.frozen


def test_trainable_mask_freeze(net_and_params):
    _, params, apply_fn, _ = net_and_params
    bmodel, bp = bf.to_bayesian(apply_fn, params, delta=0.05, freeze=True)
    mask = bmodel.trainable_mask(bp)
    assert mask.params["fc1"]["kernel"] is False  # frozen mu
    assert mask.params["ln"]["scale"] is True  # frequentist leaves still train
    assert all(mask.rho.values())  # rho always trains
    assert not any(mask.prior_mu.values())  # prior center never trains
    # unfrozen MOPED: mu trains
    bmodel2, bp2 = bf.to_bayesian(apply_fn, params, delta=0.05, freeze=False)
    assert bmodel2.trainable_mask(bp2).params["fc1"]["kernel"] is True


def test_forward_determinism_and_stochasticity(net_and_params):
    _, params, apply_fn, args = net_and_params
    bmodel, bp = bf.to_bayesian(apply_fn, params, delta=0.05)
    out1, _ = bmodel.apply(bp, jax.random.key(3), *args)
    out2, _ = bmodel.apply(bp, jax.random.key(3), *args)
    out3, _ = bmodel.apply(bp, jax.random.key(4), *args)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert not np.allclose(np.asarray(out1), np.asarray(out3))


def test_mc_apply_shapes(net_and_params):
    _, params, apply_fn, args = net_and_params
    bmodel, bp = bf.to_bayesian(apply_fn, params, delta=0.05)
    (out, aux) = bmodel.mc_apply(bp, jax.random.key(0), 4, *args)
    assert out.shape == (4, 2, 3)
    assert aux["log_prior"].shape == (4,)
    # samples differ across the S axis
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))


def test_kl_is_differentiable(net_and_params):
    """Q1 fix: (log_q - log_p) must carry gradient to BOTH mu and rho."""
    _, params, apply_fn, args = net_and_params
    bmodel, bp = bf.to_bayesian(apply_fn, params, delta=0.05)

    def kl(bp):
        _, aux = bmodel.apply(bp, jax.random.key(0), *args)
        return aux["log_variational_posterior"] - aux["log_prior"]

    g = jax.grad(kl)(bp)
    assert float(jnp.abs(g.rho["fc1/kernel"]).max()) > 0
    assert float(jnp.abs(g.params["fc1"]["kernel"]).max()) > 0
    # non-converted leaves get zero KL gradient
    assert float(jnp.abs(g.params["ln"]["scale"]).max()) == 0


def test_log_prob_parity_with_reference_math(net_and_params):
    """Per-layer log-prob parity at rtol=1e-5 given the same sampled W."""
    import torch

    _, params, apply_fn, _ = net_and_params
    bmodel, bp = bf.to_bayesian(apply_fn, params, delta=0.05)
    sampled, log_p, log_q = bmodel.sample(bp, jax.random.key(7))

    t_log_q = 0.0
    t_log_p = 0.0
    for path in bmodel.spec.paths:
        w = torch.from_numpy(np.asarray(flatten_dict(sampled, sep="/")[path]))
        mu = torch.from_numpy(np.asarray(flatten_dict(bp.params, sep="/")[path]))
        rho = torch.from_numpy(np.asarray(bp.rho[path]))
        sigma = torch.nn.functional.softplus(rho)
        t_log_q += (
            -np.log(np.sqrt(2 * np.pi)) - torch.log(sigma)
            - (w - mu) ** 2 / (2 * sigma**2)
        ).sum()
        pm = torch.from_numpy(np.asarray(bp.prior_mu[path]))
        psig = torch.nn.functional.softplus(torch.ones_like(pm))
        t_log_p += (
            -np.log(np.sqrt(2 * np.pi)) - torch.log(psig)
            - (w - pm) ** 2 / (2 * psig**2)
        ).sum()
    np.testing.assert_allclose(float(log_q), float(t_log_q), rtol=1e-5)
    np.testing.assert_allclose(float(log_p), float(t_log_p), rtol=1e-5)


def test_elbo_train_step_reduces_loss(net_and_params):
    """End-to-end: one jitted ELBO step with optax, loss decreases over steps."""
    _, params, apply_fn, args = net_and_params
    bmodel, bp = bf.to_bayesian(apply_fn, params, delta=0.05, freeze=True)
    labels = jnp.array([0, 2])
    tx = masked_optimizer(optax.adam(1e-2), bmodel.trainable_mask(bp))
    opt_state = tx.init(bp)

    @jax.jit
    def step(bp, opt_state, key):
        def loss_fn(bp):
            out, aux = bmodel.mc_apply(bp, key, 3, *args)
            nll = bf.elbo.cross_entropy_sum(bf.elbo.mc_logits_mean(out), labels)
            return bf.elbo.elbo_loss(
                nll, aux["log_prior"], aux["log_variational_posterior"], n_batches=10
            )

        loss, grads = jax.value_and_grad(loss_fn)(bp)
        updates, opt_state = tx.update(grads, opt_state, bp)
        return optax.apply_updates(bp, updates), opt_state, loss

    losses = []
    frozen_mu0 = np.asarray(bp.params["fc1"]["kernel"]).copy()
    for i in range(40):
        bp, opt_state, loss = step(bp, opt_state, jax.random.key(i))
        losses.append(float(loss))
    # MC loss is stochastic; compare window averages, not endpoints
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    # frozen mu never moved
    np.testing.assert_array_equal(np.asarray(bp.params["fc1"]["kernel"]), frozen_mu0)


def test_adamw_decay_groups_actually_mask(net_and_params):
    """Q6 fix: bias/LayerNorm leaves must not be weight-decayed."""
    import jax.numpy as jnp
    from bayeformers_tpu import training

    _, params, apply_fn, _ = net_and_params
    bmodel, bp = bf.to_bayesian(apply_fn, params, delta=0.05)
    tx = training.adamw_with_decay_groups(
        1e-3, weight_decay=0.5, mask_no_decay=training.default_no_decay,
        clip_norm=None,
    )
    state = tx.init(bp)
    zero_grads = jax.tree.map(jnp.zeros_like, bp)
    updates, _ = tx.update(zero_grads, state, bp)
    # with zero grads, adamw's update is pure decay: -lr*wd*param
    decayed = updates.params["fc1"]["kernel"]
    assert float(jnp.abs(decayed).max()) > 0  # kernel IS decayed
    not_decayed = updates.params["fc1"]["bias"]
    assert float(jnp.abs(not_decayed).max()) == 0  # bias is NOT
    assert float(jnp.abs(updates.params["ln"]["scale"]).max()) == 0  # LN is NOT
    assert float(jnp.abs(updates.rho["fc1/kernel"]).max()) == 0  # rho never decays


def test_predictive_api(net_and_params):
    _, params, apply_fn, args = net_and_params
    bmodel, bp = bf.to_bayesian(apply_fn, params, delta=0.2)
    pred = bf.elbo.predictive(bmodel, bp, jax.random.key(0), 8, *args)
    B, C = 2, 3
    assert pred["probs"].shape == (B, C)
    np.testing.assert_allclose(np.asarray(pred["probs"]).sum(-1), 1.0, rtol=1e-5)
    assert pred["epistemic_std"].shape == (B, C)
    assert float(pred["epistemic_std"].max()) > 0  # delta=0.2 => real spread
    assert pred["entropy"].shape == (B,)
    assert pred["logits"].shape == (8, B, C)


def test_analytic_kl_matches_mc_expectation(net_and_params):
    """elbo.analytic_kl == E[log_q - log_p] (extension; closed form for the
    MOPED Gaussian prior, draw-averaged cross-entropy for the mixture)."""
    net, params, apply_fn, args = net_and_params

    # MOPED prior: exact closed form, so a modest MC average converges to it
    bmodel, bp = bf.to_bayesian(apply_fn, params, delta=0.1, freeze=True)
    kl = float(bf.elbo.analytic_kl(bp, bmodel.spec))
    draws = []
    for i in range(400):
        _, log_p, log_q = bmodel.sample(bp, jax.random.key(i))
        draws.append(float(log_q - log_p))
    mc = np.mean(draws)
    sem = np.std(draws) / np.sqrt(len(draws))
    assert abs(kl - mc) < 5 * sem + 1e-3, (kl, mc, sem)
    assert kl >= 0.0

    # mixture prior: needs a key; estimator is unbiased so it should also
    # land within noise of the brute-force MC average
    bmodel2, bp2 = bf.to_bayesian(apply_fn, params, rng=jax.random.key(1))
    kl2 = float(
        bf.elbo.analytic_kl(bp2, bmodel2.spec, key=jax.random.key(7),
                            mixture_draws=64)
    )
    draws2 = []
    for i in range(400):
        _, log_p, log_q = bmodel2.sample(bp2, jax.random.key(1000 + i))
        draws2.append(float(log_q - log_p))
    mc2 = np.mean(draws2)
    sem2 = np.std(draws2) / np.sqrt(len(draws2))
    assert abs(kl2 - mc2) < 6 * sem2 + 1e-2, (kl2, mc2, sem2)

    # missing key for the mixture prior is a clear error
    with pytest.raises(ValueError):
        bf.elbo.analytic_kl(bp2, bmodel2.spec)


def test_blundell_weight_schedule():
    """Blundell et al. 2015 eq. 9: weights are positive, strictly
    decreasing, sum to 1 over an epoch, and match the closed form exactly
    at small M; at dataset-scale M the log-space form stays finite where
    the naive 2^M expression overflows."""
    import numpy as np
    from bayeformers_tpu import elbo

    M = 10
    w = np.array([float(elbo.blundell_weight(i, M)) for i in range(M)])
    exact = np.array([2.0 ** (M - (i + 1)) for i in range(M)])
    exact = exact / (2.0 ** M - 1)
    np.testing.assert_allclose(w, exact, rtol=1e-6)
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-6)
    assert (np.diff(w) < 0).all()

    M = 50000  # 2^50000 overflows every float; the log form must not
    w0 = float(elbo.blundell_weight(0, M))
    w1 = float(elbo.blundell_weight(1, M))
    assert np.isfinite(w0) and 0 < w0 <= 0.5 + 1e-6
    np.testing.assert_allclose(w1 / w0, 0.5, rtol=1e-5)
