"""Tests for the fused (interception) MC path, on the CPU naive dispatch.

The strongest check reconstructs, outside the interceptor, exactly the
weights the fused path must have used (same seed derivation + eps stream via
the ops layer) and verifies the fused super-batched forward equals S plain
forwards with those substituted weights.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax.traverse_util import flatten_dict, unflatten_dict

import bayeformers_tpu as bf
from bayeformers_tpu.core import distributions as dist
from bayeformers_tpu.nn import fused as fused_lib
from bayeformers_tpu.ops import common as ops_common
from bayeformers_tpu.ops import fused_linear as ops_flinear
from bayeformers_tpu.ops import sampled_linear as ops_linear
from bayeformers_tpu.utils.optim import masked_optimizer


class Net(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(32, name="fc1")(x))
        x = nn.LayerNorm(name="ln")(x)
        return nn.Dense(5, name="fc2")(x)


@pytest.fixture(scope="module")
def setup():
    net = Net()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(6, 16)), jnp.float32)
    params = net.init(jax.random.key(0), x)["params"]
    apply_fn = lambda p, x: net.apply({"params": p}, x)
    bmodel, bp = bf.to_bayesian(apply_fn, params, delta=0.05)
    return net, apply_fn, bmodel, bp, x


def _expected_outputs(bmodel, bp, key, S, x, apply_fn):
    """Manually substitute the exact weights the fused path samples."""
    outs = []
    for s in range(S):
        flat = dict(flatten_dict(bp.params, sep="/"))
        for i, path in enumerate(bmodel.spec.paths):
            layer_key = jax.random.fold_in(key, i)
            seeds = ops_common.seed_from_key(jax.random.split(layer_key, S))
            mu = flat[path]
            rho = bp.rho[path]
            if path.endswith("bias"):
                beps = fused_lib._unit_bias_eps(
                    jax.random.fold_in(key, i), S, mu.shape[0], None
                ).astype(mu.dtype)
                w_s = mu + dist.sigma_from_rho(rho) * beps[s]
            else:
                w_all = ops_flinear.regenerate_weights(mu, rho, seeds)
                w_s = w_all[s]
            flat[path] = w_s
        outs.append(apply_fn(unflatten_dict(flat, sep="/"), x))
    return jnp.stack(outs)


def test_fused_matches_manual_substitution(setup):
    _, apply_fn, bmodel, bp, x = setup
    key = jax.random.key(42)
    S = 3
    out, aux = bmodel.mc_apply_fused(bp, key, S, x)
    expected = _expected_outputs(bmodel, bp, key, S, x, apply_fn)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=2e-5,
                               atol=1e-6)
    assert aux["log_prior"].shape == (S,)
    assert aux["log_variational_posterior"].shape == (S,)


def test_fused_deterministic_and_stochastic(setup):
    _, _, bmodel, bp, x = setup
    out1, _ = bmodel.mc_apply_fused(bp, jax.random.key(1), 2, x)
    out2, _ = bmodel.mc_apply_fused(bp, jax.random.key(1), 2, x)
    out3, _ = bmodel.mc_apply_fused(bp, jax.random.key(2), 2, x)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert not np.allclose(np.asarray(out1), np.asarray(out3))
    assert not np.allclose(np.asarray(out1[0]), np.asarray(out1[1]))


def test_fused_logprobs_consistent_with_weights(setup):
    """log_q from the fused path must equal the analytic value at the
    reconstructed sampled weights (kernel + bias)."""
    _, _, bmodel, bp, x = setup
    key = jax.random.key(7)
    S = 2
    _, aux = bmodel.mc_apply_fused(bp, key, S, x)
    flat = flatten_dict(bp.params, sep="/")
    for s in range(S):
        lq = 0.0
        for i, path in enumerate(bmodel.spec.paths):
            mu, rho = flat[path], bp.rho[path]
            sigma = dist.sigma_from_rho(rho)
            if path.endswith("bias"):
                beps = fused_lib._unit_bias_eps(
                    jax.random.fold_in(key, i), S, mu.shape[0], None
                ).astype(mu.dtype)
                w_s = mu + sigma * beps[s]
            else:
                seeds = ops_common.seed_from_key(
                    jax.random.split(jax.random.fold_in(key, i), S)
                )
                w_s = ops_flinear.regenerate_weights(mu, rho, seeds)[s]
            lq += float(dist.gaussian_log_prob(w_s, mu, sigma))
        np.testing.assert_allclose(
            float(aux["log_variational_posterior"][s]), lq, rtol=1e-5
        )


def test_fused_trains(setup):
    _, _, bmodel, bp, x = setup
    labels = jnp.asarray(np.random.default_rng(1).integers(0, 5, size=(6,)))
    tx = masked_optimizer(optax.adam(1e-2), bmodel.trainable_mask(bp))
    opt_state = tx.init(bp)

    @jax.jit
    def step(bp, opt_state, key):
        def loss_fn(bp):
            out, aux = bmodel.mc_apply_fused(bp, key, 3, x)
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
    # rho actually received gradient through the fused custom VJPs
    assert not np.allclose(
        np.asarray(bp.rho["fc1/kernel"]),
        np.asarray(setup[3].rho["fc1/kernel"]),
    )


def test_fused_embedding_rule():
    class EmbNet(nn.Module):
        @nn.compact
        def __call__(self, ids):
            x = nn.Embed(num_embeddings=11, features=8, name="emb")(ids)
            return nn.Dense(4, name="out")(x.mean(axis=1))

    net = EmbNet()
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 11, (5, 7)))
    params = net.init(jax.random.key(0), ids)["params"]
    apply_fn = lambda p, ids: net.apply({"params": p}, ids)
    bmodel, bp = bf.to_bayesian(
        apply_fn, params, delta=0.05,
        rules=bf.DEFAULT_RULES + (bf.EMBEDDING_RULE,),
    )
    assert "emb/embedding" in bp.rho
    out, aux = bmodel.mc_apply_fused(bp, jax.random.key(3), 2, ids)
    assert out.shape == (2, 5, 4)
    assert np.isfinite(np.asarray(aux["log_prior"])).all()


def test_fused_embedding_grads_flow():
    """Converted embeddings must be differentiable end-to-end (the sampled
    tables flow into the loss through sampled_weights' custom VJP)."""
    class EmbNet(nn.Module):
        @nn.compact
        def __call__(self, ids):
            x = nn.Embed(num_embeddings=11, features=8, name="emb")(ids)
            return nn.Dense(4, name="out")(x.mean(axis=1))

    net = EmbNet()
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 11, (5, 7)))
    params = net.init(jax.random.key(0), ids)["params"]
    apply_fn = lambda p, ids: net.apply({"params": p}, ids)
    bmodel, bp = bf.to_bayesian(
        apply_fn, params, delta=0.05,
        rules=bf.DEFAULT_RULES + (bf.EMBEDDING_RULE,),
    )

    def loss(bp):
        out, aux = bmodel.mc_apply_fused(bp, jax.random.key(1), 2, ids)
        return jnp.sum(out**2) + 1e-4 * (
            jnp.sum(aux["log_variational_posterior"]) - jnp.sum(aux["log_prior"])
        )

    g = jax.grad(loss)(bp)
    assert float(jnp.abs(g.rho["emb/embedding"]).max()) > 0
    assert float(jnp.abs(g.params["emb"]["embedding"]).max()) > 0
    assert np.isfinite(np.asarray(g.rho["emb/embedding"])).all()


def test_fused_no_double_count_for_shared_modules():
    """A module called twice per forward contributes its KL exactly once."""
    class Shared(nn.Module):
        @nn.compact
        def __call__(self, x):
            dense = nn.Dense(16, name="tied")
            return dense(jax.nn.relu(dense(x)))

    net = Shared()
    x = jnp.ones((4, 16))
    params = net.init(jax.random.key(0), x)["params"]
    apply_fn = lambda p, x: net.apply({"params": p}, x)
    bmodel, bp = bf.to_bayesian(apply_fn, params, delta=0.05)
    _, aux_shared = bmodel.mc_apply_fused(bp, jax.random.key(1), 2, x)

    class Single(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(16, name="tied")(x)

    net1 = Single()
    apply1 = lambda p, x: net1.apply({"params": p}, x)
    bmodel1, bp1 = bf.to_bayesian(apply1, params, delta=0.05)
    _, aux_single = bmodel1.mc_apply_fused(bp1, jax.random.key(1), 2, x)
    # same converted leaf, same key/seed derivation -> identical (not 2x) KL
    np.testing.assert_allclose(
        np.asarray(aux_shared["log_variational_posterior"]),
        np.asarray(aux_single["log_variational_posterior"]), rtol=1e-6,
    )


def test_antithetic_pairs_mirror_and_match_op_level(setup):
    """Antithetic estimator (extension): op-level pair identity
    w[2t+1] = 2*mu - w[2t], shared even log_q, and the fused forward's pair
    structure on the CPU naive dispatch."""
    rng = np.random.default_rng(1)
    S, M, K, N = 4, 6, 16, 8
    x = jnp.asarray(rng.normal(size=(S, M, K)), jnp.float32)
    mu = jnp.asarray(rng.normal(size=(K, N)) * 0.1, jnp.float32)
    rho = jnp.asarray(rng.uniform(-5, -4, (K, N)), jnp.float32)
    seeds = jnp.arange(S // 2, dtype=jnp.int32)

    y, lq, lp = ops_flinear.bayes_linear(
        x, mu, rho, seeds, prior_on_mu=True, antithetic=True
    )
    # reconstruct weights from the regen path the backward uses
    w = ops_flinear.interleave_antithetic(
        ops_linear.naive_weights(mu, rho, seeds), mu
    )
    np.testing.assert_allclose(
        np.asarray(w[1]), np.asarray(2 * mu - w[0]), rtol=1e-6)
    for s in range(S):
        np.testing.assert_allclose(
            np.asarray(y[s]), np.asarray(x[s] @ w[s]), rtol=2e-5, atol=2e-5)
    # log_q and the frozen-MOPED log_p are even in eps: pairs share values
    np.testing.assert_allclose(np.asarray(lq[0::2]), np.asarray(lq[1::2]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(lp[0::2]), np.asarray(lp[1::2]),
                               rtol=1e-6)

    # general-MOPED prior: pair members differ but match the dense math
    pmu = jnp.asarray(rng.normal(size=(K, N)) * 0.1, jnp.float32)
    _, lq2, lp2 = ops_flinear.bayes_linear(
        x, mu, rho, seeds, prior_mu=pmu, antithetic=True
    )
    from bayeformers_tpu.core.prior import MOPED_PRIOR_SIGMA
    z = (w - pmu[None]) / MOPED_PRIOR_SIGMA
    lp_ref = np.sum(
        -dist.LOG_SQRT_2PI - np.log(MOPED_PRIOR_SIGMA) - 0.5 * np.asarray(z) ** 2,
        axis=(1, 2),
    )
    np.testing.assert_allclose(np.asarray(lp2), lp_ref, rtol=1e-5)


def test_antithetic_gradients_match_dense_reference(setup):
    """Grads through the antithetic op == autodiff through the dense
    formula at the same (paired) weights."""
    rng = np.random.default_rng(2)
    S, M, K, N = 4, 5, 16, 8
    x = jnp.asarray(rng.normal(size=(S, M, K)), jnp.float32)
    mu = jnp.asarray(rng.normal(size=(K, N)) * 0.1, jnp.float32)
    rho = jnp.asarray(rng.uniform(-5, -4, (K, N)), jnp.float32)
    seeds = jnp.arange(S // 2, dtype=jnp.int32)

    def loss_op(mu, rho, x):
        y, lq, lp = ops_flinear.bayes_linear(
            x, mu, rho, seeds, prior_on_mu=True, antithetic=True
        )
        return jnp.sum(y**2) + jnp.sum(lq) - jnp.sum(lp)

    def loss_ref(mu, rho, x):
        w_half = ops_linear.naive_weights(mu, rho, seeds)
        w = ops_flinear.interleave_antithetic(w_half, mu)
        y = jnp.einsum("smk,skn->smn", x, w)
        sigma = jax.nn.softplus(rho)
        eps = (w - mu[None]) / sigma[None]
        lq = jnp.sum(-dist.LOG_SQRT_2PI - jnp.log(sigma)[None] - 0.5 * eps**2,
                     axis=(1, 2))
        from bayeformers_tpu.core.prior import MOPED_PRIOR_SIGMA
        z = (w - mu[None]) / MOPED_PRIOR_SIGMA
        lp = jnp.sum(
            -dist.LOG_SQRT_2PI - jnp.log(MOPED_PRIOR_SIGMA) - 0.5 * z**2,
            axis=(1, 2),
        )
        return jnp.sum(y**2) + jnp.sum(lq) - jnp.sum(lp)

    g_op = jax.grad(loss_op, argnums=(0, 1, 2))(mu, rho, x)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(mu, rho, x)
    for a, b, name in zip(g_op, g_ref, ("dmu", "drho", "dx")):
        # rtol covers f32 summation-order noise between the tile-fused
        # reduction and plain autodiff
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-5, err_msg=name)


def test_antithetic_fused_mc_apply_trains(setup):
    """End-to-end: antithetic estimator through the interception tier —
    pairs share log_q, ELBO trains, frozen mu intact."""
    net, apply_fn, _, _, x = setup
    params = net.init(jax.random.key(0), x)["params"]
    bmodel, bp = bf.to_bayesian(apply_fn, params, delta=0.05, freeze=True)

    out, aux = bmodel.mc_apply_fused(bp, jax.random.key(3), 4, x,
                                     antithetic=True)
    assert out.shape[0] == 4
    lq = np.asarray(aux["log_variational_posterior"])
    np.testing.assert_allclose(lq[0::2], lq[1::2], rtol=1e-6)
    # pair members see different weights -> different outputs
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))

    # odd n_samples rejected
    with pytest.raises(ValueError):
        bmodel.mc_apply_fused(bp, jax.random.key(3), 3, x, antithetic=True)

    y = jnp.asarray(np.random.default_rng(3).integers(0, 5, (x.shape[0],)))
    tx = masked_optimizer(optax.adam(5e-3), bmodel.trainable_mask(bp))
    opt = tx.init(bp)

    @jax.jit
    def step(bp, opt, key):
        def loss_fn(bp):
            out, aux = bmodel.mc_apply_fused(bp, key, 4, x, antithetic=True)
            nll = bf.elbo.cross_entropy_sum(bf.elbo.mc_logits_mean(out), y)
            return bf.elbo.elbo_loss(
                nll, aux["log_prior"], aux["log_variational_posterior"], 4
            )
        loss, g = jax.value_and_grad(loss_fn)(bp)
        up, opt = tx.update(g, opt, bp)
        return optax.apply_updates(bp, up), opt, loss

    losses = []
    key = jax.random.key(4)
    for _ in range(30):
        key, k = jax.random.split(key)
        bp, opt, loss = step(bp, opt, k)
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_antithetic_is_unbiased_estimator(setup):
    """Mean over many antithetic pairs == mean over independent draws
    (both estimate E[f(mu + sigma*eps)]) within MC error."""
    rng = np.random.default_rng(5)
    M, K, N = 4, 8, 4
    x0 = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    # both pair slots see the SAME input so the pair-mean isolates the
    # weight average (in real use activations diverge per sample)
    x = jnp.stack([x0, x0])
    mu = jnp.asarray(rng.normal(size=(K, N)) * 0.3, jnp.float32)
    rho = jnp.asarray(rng.uniform(-2, -1, (K, N)), jnp.float32)

    def mean_y(antithetic, n, seed0):
        total = np.zeros((M, N), np.float64)
        for t in range(n):
            seeds = jnp.asarray([seed0 + t], jnp.int32)
            if antithetic:
                y, _, _ = ops_flinear.bayes_linear(
                    x, mu, rho, seeds, prior_on_mu=True, antithetic=True,
                    save_weights=False,
                )
                total += np.asarray(jnp.mean(y, 0), np.float64)
            else:
                y, _, _ = ops_flinear.bayes_linear(
                    x[:1], mu, rho, seeds, prior_on_mu=True,
                    save_weights=False,
                )
                total += np.asarray(y[0], np.float64)
        return total / n

    # the exact expectation is x @ mu (linear in w)
    exact = np.asarray(x0 @ mu, np.float64)
    anti = mean_y(True, 400, 0)
    assert np.abs(anti - exact).max() < 0.05
    # antithetic pairs cancel the linear eps term exactly: each pair mean
    # is x @ mu up to float error, far tighter than independent sampling
    assert np.abs(anti - exact).max() < 1e-4


@pytest.mark.slow
def test_antithetic_reduces_gradient_variance(setup):
    """The antithetic estimator's advertised property: across repeated
    draws, gradient variance is at most the independent estimator's (it
    cancels the odd terms of the eps expansion exactly)."""
    net, apply_fn, _, _, x = setup
    params = net.init(jax.random.key(0), x)["params"]
    bmodel, bp = bf.to_bayesian(apply_fn, params, delta=0.2, freeze=True)
    y = jnp.asarray(np.random.default_rng(0).integers(0, 5, (x.shape[0],)))

    def grad_probe(antithetic, key):
        def loss_fn(bp):
            out, aux = bmodel.mc_apply_fused(bp, key, 4,
                                             antithetic=antithetic, x=x)
            nll = bf.elbo.cross_entropy_sum(bf.elbo.mc_logits_mean(out), y)
            return bf.elbo.elbo_loss(
                nll, aux["log_prior"], aux["log_variational_posterior"], 4
            )
        g = jax.grad(loss_fn)(bp)
        # scalar probe: sum of all rho-gradient entries
        return float(sum(jnp.sum(v) for v in g.rho.values()))

    draws = 40
    ind = np.array([grad_probe(False, jax.random.key(100 + i))
                    for i in range(draws)])
    anti = np.array([grad_probe(True, jax.random.key(100 + i))
                     for i in range(draws)])
    # unbiasedness: both estimate the same expectation
    sem = (ind.std() + anti.std()) / np.sqrt(draws)
    assert abs(ind.mean() - anti.mean()) < 5 * sem + 1e-6
    # variance reduction (allow slack for finite draws)
    assert anti.var() <= ind.var() * 1.1, (anti.var(), ind.var())
