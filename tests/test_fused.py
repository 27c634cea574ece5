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
                beps = jax.random.normal(
                    jax.random.fold_in(key, i), (S,) + mu.shape, mu.dtype
                )
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
                beps = jax.random.normal(
                    jax.random.fold_in(key, i), (S,) + mu.shape, mu.dtype
                )
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
