"""Tests for the combined bayes_linear op (ops/fused_linear.py), CPU dispatch.

TPU kernel parity for the same op lives in tests/test_ops_tpu.py.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayeformers_tpu.core import distributions as dist
from bayeformers_tpu.core import prior as prior_lib
from bayeformers_tpu.ops import fused_linear as fl

MIX = (0.5, 1.0, float(np.exp(-6.0)))


@pytest.fixture
def problem():
    rng = np.random.default_rng(5)
    S, M, K, N = 3, 16, 48, 24
    x = jnp.asarray(rng.normal(size=(S, M, K)).astype(np.float32))
    mu = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05)
    rho = jnp.asarray(rng.uniform(-5, -4, (K, N)).astype(np.float32))
    pm = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05)
    seeds = jnp.arange(7, 7 + S, dtype=jnp.int32)
    return x, mu, rho, pm, seeds


def test_values_match_distribution_functions(problem):
    x, mu, rho, pm, seeds = problem
    w = fl.regenerate_weights(mu, rho, seeds)
    sigma = dist.sigma_from_rho(rho)
    for kwargs, prior_fn in [
        (dict(mixture=MIX), lambda ws: dist.scale_mixture_log_prob(ws, *MIX)),
        (dict(prior_mu=pm), lambda ws: prior_lib.moped_prior_log_prob(ws, pm)),
        (dict(prior_on_mu=True), lambda ws: prior_lib.moped_prior_log_prob(ws, mu)),
    ]:
        y, lq, lp = fl.bayes_linear(x, mu, rho, seeds, **kwargs)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(jnp.einsum("smk,skn->smn", x, w)), rtol=1e-5
        )
        for s in range(w.shape[0]):
            np.testing.assert_allclose(
                float(lq[s]), float(dist.gaussian_log_prob(w[s], mu, sigma)),
                rtol=1e-5,
            )
            np.testing.assert_allclose(
                float(lp[s]), float(prior_fn(w[s])), rtol=1e-5
            )


def test_arg_validation(problem):
    x, mu, rho, pm, seeds = problem
    with pytest.raises(ValueError):
        fl.bayes_linear(x, mu, rho, seeds)
    with pytest.raises(ValueError):
        fl.bayes_linear(x, mu, rho, seeds, mixture=MIX, prior_mu=pm)
    with pytest.raises(ValueError):
        fl.bayes_linear(x, mu, rho, seeds, prior_mu=pm, prior_on_mu=True)


@pytest.mark.parametrize("prior_kind", ["mixture", "gaussian", "gaussian_on_mu"])
def test_vjp_vs_float64_closed_form(problem, prior_kind):
    x, mu, rho, pm, seeds = problem
    w64 = np.asarray(fl.regenerate_weights(mu, rho, seeds), np.float64)
    x64 = np.asarray(x, np.float64)
    mu64 = np.asarray(mu, np.float64)
    rho64 = np.asarray(rho, np.float64)
    pm64 = np.asarray(pm, np.float64)
    sig64 = np.logaddexp(0.0, rho64)
    sigmoid64 = 1.0 / (1.0 + np.exp(-rho64))
    eps64 = (w64 - mu64) / sig64
    S = w64.shape[0]
    g_y = np.asarray(
        np.random.default_rng(9).normal(size=(S, x.shape[1], mu.shape[1])),
        np.float32,
    )
    gq, gp = 1.3, 0.7

    def ours(x, mu, rho, pm):
        kwargs = {
            "mixture": dict(mixture=MIX),
            "gaussian": dict(prior_mu=pm),
            "gaussian_on_mu": dict(prior_on_mu=True),
        }[prior_kind]
        y, lq, lp = fl.bayes_linear(x, mu, rho, seeds, **kwargs)
        return jnp.sum(y * g_y) + gq * jnp.sum(lq) + gp * jnp.sum(lp)

    gour = jax.grad(ours, argnums=(0, 1, 2, 3))(x, mu, rho, pm)

    # float64 closed forms
    g64 = np.asarray(g_y, np.float64)
    dx = np.einsum("smn,skn->smk", g64, w64)
    dw = np.einsum("smk,smn->skn", x64, g64)
    if prior_kind == "mixture":
        pi, s1, s2 = MIX
        a1 = np.log(pi) - np.log(s1) - 0.5 * (w64 / s1) ** 2
        a2 = np.log1p(-pi) - np.log(s2) - 0.5 * (w64 / s2) ** 2
        r1 = np.exp(a1 - np.logaddexp(a1, a2))
        score = -w64 * (r1 / s1**2 + (1 - r1) / s2**2)
        dmu = dw.sum(0) + gp * score.sum(0)
        dpm = np.zeros_like(pm64)
    elif prior_kind == "gaussian":
        score = -(w64 - pm64) / prior_lib.MOPED_PRIOR_SIGMA**2
        dmu = dw.sum(0) + gp * score.sum(0)
        dpm = -gp * score.sum(0)
    else:  # gaussian_on_mu: sample and center paths cancel in d/dmu
        score = -(w64 - mu64) / prior_lib.MOPED_PRIOR_SIGMA**2
        dmu = dw.sum(0)
        dpm = np.zeros_like(pm64)
    drho = (
        (dw * eps64).sum(0) + gp * (score * eps64).sum(0) - gq * S / sig64
    ) * sigmoid64

    for name, ref, got in zip(
        ("x", "mu", "rho", "pm"), (dx, dmu, drho, dpm), gour
    ):
        atol = 2e-5 * (float(np.max(np.abs(ref))) + 1e-9) + 1e-7
        np.testing.assert_allclose(
            ref, np.asarray(got, np.float64), rtol=2e-5, atol=atol, err_msg=name
        )


def test_large_k_fallback_consistency(problem):
    """The split-path fallback (huge K) must still give self-consistent
    forward/backward (CPU dispatch exercises the decision logic only)."""
    rng = np.random.default_rng(1)
    S, M, K, N = 2, 8, 40, 16
    x = jnp.asarray(rng.normal(size=(S, M, K)).astype(np.float32))
    mu = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05)
    rho = jnp.asarray(rng.uniform(-5, -4, (K, N)).astype(np.float32))
    seeds = jnp.arange(2, dtype=jnp.int32)
    y, lq, lp = fl.bayes_linear(x, mu, rho, seeds, mixture=MIX)
    grads = jax.grad(
        lambda mu, rho: jnp.sum(
            fl.bayes_linear(x, mu, rho, seeds, mixture=MIX)[0]
        )
    )(mu, rho)
    assert np.isfinite(np.asarray(grads)).all()


def test_kernel_routing_covers_bert_large_shapes():
    """Route selection for BERT-large (H=1024, FFN 4096): every layer shape
    must land on a Pallas route (full-K or K-tall), not the split fallback,
    for both dtypes at the training batch."""
    import jax.numpy as jnp
    from bayeformers_tpu.ops import fused_linear as fl
    from bayeformers_tpu.ops import common

    M = 10 * 1024 // 10  # per-sample rows at S-major batch 8 x seq 128
    for K, N in ((1024, 1024), (1024, 4096), (4096, 1024)):
        for itemsize, w_item in ((4, 4), (2, 2)):
            kp, np_ = fl._pad_kn(K, N)
            assert kp <= fl.MAX_FULLK
            fullk = fl._pick_bn_bm(kp, np_, M, 2, x_bytes=itemsize,
                                   w_bytes=w_item)
            ktall = fl._ktall_bk(kp, np_, M, itemsize, w_item)
            assert fullk is not None or ktall is not None, (K, N, itemsize)
    # eps units divide the padded K for all these shapes (determinism
    # contract holds across kernels)
    for K in (1024, 4096):
        assert common.round_up(K, common.UNIT_K) % common.UNIT_K == 0


def test_anti_ktall_routing_and_fit_model():
    """The paired K-tall route must take the BERT-base FFN down-projection
    (3072->768) at the GLUE training batch for both dtypes, stay off for
    full-K shapes, and stay off when the resident output pair exceeds the
    VMEM model (SQuAD M=4992 falls back to the full-K pair kernel)."""
    M = 1024  # batch 8 x seq 128
    t = fl._ktall_anti_tiles(3072, 768, M, 2, x_bytes=2, w_bytes=2)
    assert t is not None
    bk, bn = t
    assert 3072 % bk == 0 and 768 % bn == 0 and bn % 128 == 0
    assert fl._ktall_anti_tiles(3072, 768, M, 2, x_bytes=4, w_bytes=4) is not None
    # full-K shapes (attention 768x768, FFN up 768->3072) are not K-tall
    assert fl._ktall_anti_tiles(768, 768, M, 2, 2, 2) is None
    assert fl._ktall_anti_tiles(768, 3072, M, 2, 2, 2) is None
    # SQuAD chunked shape: the x pair block alone exceeds the model -> off
    assert fl._ktall_anti_tiles(3072, 768, 13 * 384, 2, 2, 2) is None


def test_anti_half_residual_backward_all_priors():
    """The paired backward reconstructs the odd member as 2mu - w0 from
    even-only residuals: grads through the antithetic op must match dense
    autodiff at the same paired weights for every prior family (gaussian
    exercises want_u + dprior_mu, mixture the score recombination)."""
    from bayeformers_tpu.ops import sampled_linear as ops_linear

    rng = np.random.default_rng(11)
    S, M, K, N = 6, 8, 32, 16
    x = jnp.asarray(rng.normal(size=(S, M, K)).astype(np.float32))
    mu = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.1)
    rho = jnp.asarray(rng.uniform(-5, -4, (K, N)).astype(np.float32))
    pm = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.1)
    seeds = jnp.arange(3, 3 + S // 2, dtype=jnp.int32)

    w_half = ops_linear.naive_weights(mu, rho, seeds)
    w_pair = fl.interleave_antithetic(w_half, mu)

    for kwargs, prior_fn, has_pm in [
        (dict(prior_on_mu=True),
         lambda ws, m: prior_lib.moped_prior_log_prob(ws, m), False),
        (dict(prior_mu=pm),
         lambda ws, m: prior_lib.moped_prior_log_prob(ws, pm), True),
        (dict(mixture=MIX),
         lambda ws, m: dist.scale_mixture_log_prob(ws, *MIX), False),
    ]:
        def loss_op(mu, rho, x):
            y, lq, lp = fl.bayes_linear(
                x, mu, rho, seeds, antithetic=True, **kwargs
            )
            return jnp.sum(y**2) + 2.0 * jnp.sum(lq) - 3.0 * jnp.sum(lp)

        def loss_ref(mu, rho, x):
            sigma = dist.sigma_from_rho(rho)
            eps = jax.lax.stop_gradient((w_pair - mu[None]) / sigma[None])
            w = mu[None] + sigma[None] * eps
            y = jnp.einsum("smk,skn->smn", x, w)
            lq = jnp.stack(
                [dist.gaussian_log_prob(w[s], mu, sigma) for s in range(S)]
            )
            lp = jnp.stack([prior_fn(w[s], mu) for s in range(S)])
            return jnp.sum(y**2) + 2.0 * jnp.sum(lq) - 3.0 * jnp.sum(lp)

        g_op = jax.grad(loss_op, argnums=(0, 1, 2))(mu, rho, x)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(mu, rho, x)
        for a, b, name in zip(g_op, g_ref, ("dmu", "drho", "dx")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5,
                err_msg=(name, next(iter(kwargs))),
            )


def test_anti_saved_residual_pair_structure():
    """save_weights=True on the antithetic path stores the full interleaved
    pair with exact ± mirror structure (w_odd = 2mu - w_even) — the paired
    backward reduce reads only the even members of it."""
    from bayeformers_tpu.ops import sampled_linear as ops_linear

    rng = np.random.default_rng(12)
    S, M, K, N = 4, 8, 32, 16
    x = jnp.asarray(rng.normal(size=(S, M, K)).astype(np.float32))
    mu = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.1)
    rho = jnp.asarray(rng.uniform(-5, -4, (K, N)).astype(np.float32))
    seeds = jnp.arange(S // 2, dtype=jnp.int32)

    out = fl._impl_anti(x, mu, rho, seeds, mu, ("gaussian_on_mu",),
                        save_w=True)
    w = out[3]
    assert w.shape == (S, K, N)
    np.testing.assert_allclose(
        np.asarray(w[0::2]),
        np.asarray(ops_linear.naive_weights(mu, rho, seeds)), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(w[1::2]), np.asarray(2 * mu[None] - w[0::2]), rtol=1e-6,
        atol=1e-7,
    )
