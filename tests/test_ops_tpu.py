"""Pallas kernel parity tests — require a real TPU.

Run with ``BAYEFORMERS_TEST_TPU=1 python -m pytest tests/test_ops_tpu.py``;
under the default CPU test backend these are skipped (the Mosaic PRNG
primitives have no CPU/interpret lowering).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayeformers_tpu.core.prior import MOPED_PRIOR_SIGMA
from bayeformers_tpu.ops import logprob as lp
from bayeformers_tpu.ops import sampled_linear as sl

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs real TPU (Pallas/Mosaic)"
)

SHAPES = [(2, 8, 256, 256), (3, 64, 784, 512), (1, 13, 768, 3072)]


@pytest.mark.parametrize("S,M,K,N", SHAPES)
def test_fused_matmul_parity(S, M, K, N):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(S, M, K)).astype(np.float32))
    mu = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05)
    rho = jnp.asarray(rng.uniform(-5, -4, (K, N)).astype(np.float32))
    seeds = jnp.arange(1, S + 1, dtype=jnp.int32)
    y = sl.pallas_sampled_dense(x, mu, rho, seeds)
    w = sl.pallas_regenerate_weights(mu, rho, seeds)
    yref = jnp.einsum("smk,skn->smn", x, w)
    rel = float(jnp.max(jnp.abs(y - yref)) / (jnp.max(jnp.abs(yref)) + 1e-9))
    assert rel < 1e-6
    # deterministic + distinct per sample
    y2 = sl.pallas_sampled_dense(x, mu, rho, seeds)
    assert bool(jnp.all(y == y2))
    if S > 1:
        assert not np.allclose(np.asarray(w[0]), np.asarray(w[1]))


def test_eps_distribution():
    """On-chip Box-Muller eps must be standard normal."""
    K, N = 784, 512
    mu = jnp.zeros((K, N))
    rho = jnp.full((K, N), 10.0)  # sigma ~= 10 + softplus tail, eps = w/sigma
    seeds = jnp.arange(4, dtype=jnp.int32)
    w = sl.pallas_regenerate_weights(mu, rho, seeds)
    eps = np.asarray(w) / float(jax.nn.softplus(10.0))
    assert abs(eps.mean()) < 5e-3
    assert abs(eps.std() - 1.0) < 5e-3
    assert abs((eps < 0).mean() - 0.5) < 5e-3
    # 4th moment ~ 3 for a Gaussian
    assert abs((eps**4).mean() - 3.0) < 0.1


@pytest.mark.parametrize("S,M,K,N", SHAPES[:2])
def test_fused_logprobs_vs_float64(S, M, K, N):
    """Kernel reductions within 1e-5 of float64 ground truth."""
    rng = np.random.default_rng(1)
    mu = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05)
    rho = jnp.asarray(rng.uniform(-5, -4, (K, N)).astype(np.float32))
    pm = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05)
    seeds = jnp.arange(10, 10 + S, dtype=jnp.int32)
    w = np.asarray(sl.pallas_regenerate_weights(mu, rho, seeds), np.float64)
    mu64 = np.asarray(mu, np.float64)
    sig64 = np.logaddexp(0.0, np.asarray(rho, np.float64))
    pm64 = np.asarray(pm, np.float64)
    mix = (0.5, 1.0, float(np.exp(-6.0)))
    logq, logp_mix = lp.sampled_logprobs(mu, rho, seeds, mixture=mix)
    _, logp_g = lp.sampled_logprobs(mu, rho, seeds, prior_mu=pm)
    c = -0.5 * np.log(2 * np.pi)
    for s in range(S):
        zq = (w[s] - mu64) / sig64
        ref_q = np.sum(c - np.log(sig64) - 0.5 * zq * zq)
        lp1 = np.log(mix[0]) + c - np.log(mix[1]) - 0.5 * (w[s] / mix[1]) ** 2
        lp2 = np.log1p(-mix[0]) + c - np.log(mix[2]) - 0.5 * (w[s] / mix[2]) ** 2
        ref_mix = np.sum(np.logaddexp(lp1, lp2))
        zg = (w[s] - pm64) / MOPED_PRIOR_SIGMA
        ref_g = np.sum(c - math.log(MOPED_PRIOR_SIGMA) - 0.5 * zg * zg)
        assert abs(float(logq[s]) - ref_q) / abs(ref_q) < 1e-5
        assert abs(float(logp_mix[s]) - ref_mix) / abs(ref_mix) < 1e-5
        assert abs(float(logp_g[s]) - ref_g) / abs(ref_g) < 1e-5


# ---------------- combined bayes_linear op (ops/fused_linear.py) -----------

from bayeformers_tpu.ops import fused_linear as fl  # noqa: E402


@pytest.mark.parametrize("K,N", [(768, 3072), (3072, 768), (784, 512)])
def test_combined_op_parity(K, N):
    rng = np.random.default_rng(2)
    S, M = 4, 96
    x = jnp.asarray(rng.normal(size=(S, M, K)).astype(np.float32))
    mu = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.02)
    rho = jnp.asarray(rng.uniform(-5, -4, (K, N)).astype(np.float32))
    seeds = jnp.arange(3, 3 + S, dtype=jnp.int32)
    y, lq, lp = fl.bayes_linear(x, mu, rho, seeds, prior_on_mu=True)
    w = fl.regenerate_weights(mu, rho, seeds)
    yref = jnp.einsum("smk,skn->smn", x, w)
    rel = float(jnp.max(jnp.abs(y - yref)) / (jnp.max(jnp.abs(yref)) + 1e-9))
    assert rel < 1e-6
    # log-probs vs float64 at the regenerated weights
    w64 = np.asarray(w, np.float64)
    mu64 = np.asarray(mu, np.float64)
    sig64 = np.logaddexp(0.0, np.asarray(rho, np.float64))
    c = -0.5 * np.log(2 * np.pi)
    for s in range(S):
        zq = (w64[s] - mu64) / sig64
        ref_q = np.sum(c - np.log(sig64) - 0.5 * zq * zq)
        zp = (w64[s] - mu64) / MOPED_PRIOR_SIGMA
        ref_p = np.sum(c - math.log(MOPED_PRIOR_SIGMA) - 0.5 * zp * zp)
        assert abs(float(lq[s]) - ref_q) / abs(ref_q) < 1e-5
        assert abs(float(lp[s]) - ref_p) / abs(ref_p) < 1e-5


def test_combined_op_grad_finite_and_deterministic():
    rng = np.random.default_rng(3)
    S, M, K, N = 3, 64, 768, 768
    x = jnp.asarray(rng.normal(size=(S, M, K)).astype(np.float32))
    mu = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.02)
    rho = jnp.asarray(rng.uniform(-5, -4, (K, N)).astype(np.float32))
    seeds = jnp.arange(S, dtype=jnp.int32)

    def loss(mu, rho):
        y, lq, lp = fl.bayes_linear(x, mu, rho, seeds, prior_on_mu=True)
        return jnp.sum(y**2) + jnp.sum(lq) - jnp.sum(lp)

    g1 = jax.grad(loss, argnums=(0, 1))(mu, rho)
    g2 = jax.grad(loss, argnums=(0, 1))(mu, rho)
    for a, b in zip(g1, g2):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("K,N", [(768, 768), (768, 3072), (768, 770)])
@pytest.mark.parametrize("want_u", [True, False])
def test_fused_backward_reduce_parity(K, N, want_u):
    """The tile-fused (A, B, U, V) backward accumulators match the dense XLA
    reference to f32 summation-order noise (ops/fused_backward.py)."""
    from bayeformers_tpu.ops import fused_backward as bwd

    S, M = 4, 256
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(S, M, K)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(S, M, N)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(S, K, N)).astype(np.float32) * 0.05)
    mu = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.04)
    g_p = jnp.asarray(rng.normal(size=(S,)).astype(np.float32))
    for mixture in (None, (0.5, 1.0, math.exp(-6))):
        if mixture is not None and not want_u:
            continue  # mixture always wants U
        tiles = bwd.pick_tiles(
            -(-K // 128) * 128, -(-N // 128) * 128, M, S,
            n_acc=4 if want_u else 3,
        )
        assert tiles is not None
        got = bwd._pallas_reduce(x, g, w, mu, g_p, tiles, mixture, want_u)
        ref = bwd._xla_reduce(x, g, w, mu, g_p, mixture)
        for name, p, r in zip("ABUV", got, ref):
            if p is None:
                continue
            scale = float(jnp.max(jnp.abs(r))) + 1e-30
            err = float(jnp.max(jnp.abs(p - r))) / scale
            assert err < 1e-5, (name, mixture, err)


def test_fused_backward_gradients_match_naive_path():
    """End-to-end grads through bayes_linear (Pallas fwd + fused bwd kernel)
    match the all-XLA naive path evaluated at the SAME weights."""
    from bayeformers_tpu.ops import fused_linear as fl

    S, M, K, N = 3, 64, 256, 384
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(S, M, K)).astype(np.float32))
    mu = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05)
    rho = jnp.asarray(rng.uniform(-5, -4, (K, N)).astype(np.float32))
    gy = jnp.asarray(rng.normal(size=(S, M, N)).astype(np.float32))
    seeds = jnp.arange(1, S + 1, dtype=jnp.int32)

    def loss(mu, rho, x):
        y, lq, lp = fl.bayes_linear(x, mu, rho, seeds, prior_on_mu=True)
        return jnp.sum(y * gy) + 0.5 * jnp.sum(lq) - 0.25 * jnp.sum(lp)

    dmu, drho, dx = jax.grad(loss, argnums=(0, 1, 2))(mu, rho, x)

    # naive reference AT the kernel's weight draw
    w = fl.regenerate_weights(mu, rho, seeds)

    def loss_ref(mu, rho, x):
        sigma = jax.nn.softplus(rho)
        eps = jax.lax.stop_gradient((w - mu[None]) / sigma[None])
        ws = mu[None] + sigma[None] * eps
        y = jnp.einsum("smk,skn->smn", x, ws)
        lq = jnp.sum(
            -math.log(math.sqrt(2 * math.pi)) - jnp.log(sigma)[None]
            - 0.5 * eps * eps, axis=(1, 2),
        )
        z = sigma[None] * eps / MOPED_PRIOR_SIGMA
        lp = jnp.sum(
            -math.log(math.sqrt(2 * math.pi)) - math.log(MOPED_PRIOR_SIGMA)
            - 0.5 * z * z, axis=(1, 2),
        )
        return jnp.sum(y * gy) + 0.5 * jnp.sum(lq) - 0.25 * jnp.sum(lp)

    dmu_r, drho_r, dx_r = jax.grad(loss_ref, argnums=(0, 1, 2))(mu, rho, x)
    for a, b in ((dmu, dmu_r), (drho, drho_r), (dx, dx_r)):
        scale = float(jnp.max(jnp.abs(b))) + 1e-30
        assert float(jnp.max(jnp.abs(a - b))) / scale < 1e-4


def test_bf16_weight_residuals():
    """bf16 activations store the W residual in bf16: forward outputs and
    log-probs must be BIT-identical to f32 residuals (the matmul casts W to
    bf16 either way); backward drho may deviate only at the ~1% level (the
    eps reconstruction from bf16 W), far under MC sampling noise."""
    import os
    import importlib
    from bayeformers_tpu.ops import fused_linear as fl

    S, M, K, N = 4, 256, 256, 384
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(S, M, K)), dtype=jnp.bfloat16)
    mu = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05)
    rho = jnp.asarray(rng.uniform(-5, -4, (K, N)).astype(np.float32))
    gy = jnp.asarray(rng.normal(size=(S, M, N)), dtype=jnp.bfloat16)
    seeds = jnp.arange(1, S + 1, dtype=jnp.int32)

    def run():
        def loss(mu, rho, x):
            y, lq, lp = fl.bayes_linear(x, mu, rho, seeds, prior_on_mu=True)
            return (jnp.sum((y * gy).astype(jnp.float32)) + jnp.sum(lq)
                    + jnp.sum(lp)), (y, lq, lp)

        (v, aux), grads = jax.value_and_grad(
            loss, argnums=(0, 1, 2), has_aux=True)(mu, rho, x)
        return aux, grads

    assert fl._w_dtype(jnp.bfloat16) == jnp.bfloat16
    (y16, lq16, lp16), (dmu16, drho16, dx16) = run()
    os.environ["BAYEFORMERS_SAVE_W_F32"] = "1"
    try:
        assert fl._w_dtype(jnp.bfloat16) == jnp.float32
        (y32, lq32, lp32), (dmu32, drho32, dx32) = run()
    finally:
        del os.environ["BAYEFORMERS_SAVE_W_F32"]

    assert bool(jnp.all(y16 == y32))
    assert bool(jnp.all(lq16 == lq32)) and bool(jnp.all(lp16 == lp32))
    assert bool(jnp.all(dmu16 == dmu32)) and bool(jnp.all(dx16 == dx32))
    scale = float(jnp.max(jnp.abs(drho32))) + 1e-30
    rel = float(jnp.max(jnp.abs(drho16 - drho32))) / scale
    assert rel < 0.03, rel


def test_ktall_route_parity():
    """The K-tall kernel (K>=2048 down-projections) produces the same draw,
    values, and gradients as the regen-kernel reference — the absolute
    (k_chunk, col_strip) eps coordinates must line up across kernels."""
    from bayeformers_tpu.ops import fused_linear as fl
    from bayeformers_tpu.core.distributions import LOG_SQRT_2PI

    S, M, K, N = 3, 128, 2048, 384
    kp, np_ = fl._pad_kn(K, N)
    assert fl._ktall_bk(kp, np_, M, 4, 4) is not None  # route active
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(S, M, K)).astype(np.float32))
    mu = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05)
    rho = jnp.asarray(rng.uniform(-5, -4, (K, N)).astype(np.float32))
    gy = jnp.asarray(rng.normal(size=(S, M, N)).astype(np.float32))
    seeds = jnp.arange(1, S + 1, dtype=jnp.int32)

    def loss(mu, rho, x):
        y, lq, lp = fl.bayes_linear(x, mu, rho, seeds, prior_on_mu=True)
        return jnp.sum(y * gy) + 0.5 * jnp.sum(lq) - 0.25 * jnp.sum(lp)

    dmu, drho, dx = jax.grad(loss, argnums=(0, 1, 2))(mu, rho, x)

    w = fl.regenerate_weights(mu, rho, seeds)  # same stream, fullk regen

    def loss_ref(mu, rho, x):
        sigma = jax.nn.softplus(rho)
        eps = jax.lax.stop_gradient((w - mu[None]) / sigma[None])
        ws = mu[None] + sigma[None] * eps
        y = jnp.einsum("smk,skn->smn", x, ws)
        lq = jnp.sum(-LOG_SQRT_2PI - jnp.log(sigma)[None] - 0.5 * eps * eps,
                     axis=(1, 2))
        z = sigma[None] * eps / MOPED_PRIOR_SIGMA
        lp = jnp.sum(
            -LOG_SQRT_2PI - math.log(MOPED_PRIOR_SIGMA) - 0.5 * z * z,
            axis=(1, 2),
        )
        return jnp.sum(y * gy) + 0.5 * jnp.sum(lq) - 0.25 * jnp.sum(lp)

    dmu_r, drho_r, dx_r = jax.grad(loss_ref, argnums=(0, 1, 2))(mu, rho, x)
    for name, a, b in (("dmu", dmu, dmu_r), ("drho", drho, drho_r),
                       ("dx", dx, dx_r)):
        rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-30))
        assert rel < 3e-4, (name, rel)

    # non-divisible N pads correctly through the same route
    y2, lq2, lp2 = fl.bayes_linear(
        x, mu[:, :380], rho[:, :380], seeds, prior_on_mu=True,
        save_weights=False,
    )
    assert y2.shape == (S, M, 380)
    assert np.isfinite(float(jnp.sum(lq2)))


@pytest.mark.parametrize("K,N", [(256, 384), (768, 768), (3072, 768)])
def test_antithetic_kernel_parity(K, N):
    """Paired antithetic kernel: exact ± mirror weights, forward parity vs
    the regeneration stream, shared even log terms, and grads vs dense."""
    from bayeformers_tpu.ops import fused_linear as fl

    rng = np.random.default_rng(0)
    S, M = 4, 64
    x = jnp.asarray(rng.normal(size=(S, M, K)).astype(np.float32))
    mu = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05)
    rho = jnp.asarray(rng.uniform(-5, -4, (K, N)).astype(np.float32))
    seeds = jnp.arange(1, S // 2 + 1, dtype=jnp.int32)

    # the paired route must actually be taken for these shapes; K-tall
    # layers land on the paired K-tall kernel (resident-output, 2x x-reads)
    if K >= fl.KTALL_MIN_K:
        assert fl._ktall_anti_route(x, mu, ("gaussian_on_mu",)) is not None
    else:
        assert fl._anti_tiles(x, mu, ("gaussian_on_mu",)) is not None

    y, lq, lp = fl.bayes_linear(
        x, mu, rho, seeds, prior_on_mu=True, antithetic=True,
        save_weights=False,
    )
    w = fl._regen_anti(mu, rho, seeds)
    np.testing.assert_allclose(
        np.asarray(w[1]), np.asarray(2 * mu - w[0]), rtol=1e-6, atol=1e-7)
    yref = jnp.einsum("smk,skn->smn", x, w)
    rel = float(jnp.max(jnp.abs(y - yref)) / (jnp.max(jnp.abs(yref)) + 1e-9))
    assert rel < 1e-5
    np.testing.assert_allclose(np.asarray(lq[0::2]), np.asarray(lq[1::2]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(lp[0::2]), np.asarray(lp[1::2]),
                               rtol=1e-6)

    # f64 closed-form log-prob parity at the sampled weights
    w64 = np.asarray(w, np.float64)
    mu64 = np.asarray(mu, np.float64)
    sig64 = np.logaddexp(0.0, np.asarray(rho, np.float64))
    eps64 = (w64 - mu64) / sig64
    lq_ref = np.sum(
        -0.5 * math.log(2 * math.pi) - np.log(sig64) - 0.5 * eps64**2,
        axis=(1, 2),
    )
    np.testing.assert_allclose(np.asarray(lq, np.float64), lq_ref, rtol=1e-5)

    # saved-W variant returns identical values (and grads flow)
    def loss(mu, rho):
        y2, lq2, lp2 = fl.bayes_linear(
            x, mu, rho, seeds, prior_on_mu=True, antithetic=True,
            save_weights=True,
        )
        return jnp.sum(y2**2) * 1e-3 + jnp.sum(lq2) - jnp.sum(lp2)

    # dense reference AT the kernel's paired draw: fix eps, rebuild
    # ws = mu + sigma*eps so autodiff flows the reparametrization exactly
    w_const = fl._regen_anti(mu, rho, seeds)

    def loss_ref(mu, rho):
        sigma = jax.nn.softplus(rho)
        eps = jax.lax.stop_gradient((w_const - mu[None]) / sigma[None])
        wr = mu[None] + sigma[None] * eps
        yr = jnp.einsum("smk,skn->smn", x, wr)
        lqr = jnp.sum(
            -0.5 * math.log(2 * math.pi) - jnp.log(sigma)[None]
            - 0.5 * eps**2, axis=(1, 2),
        )
        z = sigma[None] * eps / MOPED_PRIOR_SIGMA
        lpr = jnp.sum(
            -0.5 * math.log(2 * math.pi) - math.log(MOPED_PRIOR_SIGMA)
            - 0.5 * z**2, axis=(1, 2),
        )
        return jnp.sum(yr**2) * 1e-3 + jnp.sum(lqr) - jnp.sum(lpr)

    g = jax.grad(loss, argnums=(0, 1))(mu, rho)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(mu, rho)
    for a, b, name in zip(g, g_ref, ("dmu", "drho")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-4, err_msg=name)


def test_antithetic_bf16_and_fused_apply():
    """bf16 activations through the paired kernel + the interception tier:
    pair mirror structure and finite training-grade gradients on TPU."""
    import bayeformers_tpu as bf
    import flax.linen as nn
    from bayeformers_tpu.ops import fused_linear as fl

    rng = np.random.default_rng(3)
    S, M, K, N = 4, 128, 768, 768
    x = jnp.asarray(rng.normal(size=(S, M, K)), jnp.bfloat16)
    mu = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05)
    rho = jnp.asarray(rng.uniform(-5, -4, (K, N)).astype(np.float32))
    seeds = jnp.arange(S // 2, dtype=jnp.int32)
    y, lq, lp = fl.bayes_linear(
        x, mu, rho, seeds, prior_on_mu=True, antithetic=True,
        save_weights=False,
    )
    assert y.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(lq[0::2]), np.asarray(lq[1::2]),
                               rtol=1e-6)

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(8)(nn.relu(nn.Dense(256)(x)))

    net = Tiny()
    xs = jnp.asarray(rng.normal(size=(8, 256)), jnp.float32)
    params = net.init(jax.random.key(0), xs)["params"]
    apply_fn = lambda p, a: net.apply({"params": p}, a)
    bmodel, bp = bf.to_bayesian(apply_fn, params, delta=0.05, freeze=True)
    labels = jnp.asarray(rng.integers(0, 8, (8,)))

    def loss_fn(bp, key):
        out, aux = bmodel.mc_apply_fused(bp, key, 4, xs, antithetic=True)
        nll = bf.elbo.cross_entropy_sum(bf.elbo.mc_logits_mean(out), labels)
        return bf.elbo.elbo_loss(
            nll, aux["log_prior"], aux["log_variational_posterior"], 4
        )

    loss, grads = jax.value_and_grad(loss_fn)(bp, jax.random.key(1))
    assert np.isfinite(float(loss))
    gmax = max(float(jnp.abs(v).max()) for v in grads.rho.values())
    assert np.isfinite(gmax) and gmax > 0


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_mha_kernel_parity(dtype):
    """Pallas mha == XLA reference, fwd + bwd, incl. a non-divisible batch
    (padding rows must not produce NaNs or leak)."""
    from bayeformers_tpu.ops import attention as at

    rng = np.random.default_rng(0)
    N, L, H, heads = 7, 128, 768, 12  # N=7 exercises example padding
    q = jnp.asarray(rng.normal(size=(N, L, H)), dtype)
    k = jnp.asarray(rng.normal(size=(N, L, H)), dtype)
    v = jnp.asarray(rng.normal(size=(N, L, H)), dtype)
    mask = np.ones((N, L), np.int32)
    mask[0, 100:] = 0
    mask[3, 64:] = 0
    bias = at.mask_to_bias(jnp.asarray(mask))

    out = at.mha(q, k, v, bias, heads)
    ref = at._mha_xla(q, k, v, bias, heads)
    assert not np.isnan(np.asarray(out, np.float32)).any()
    tol = 2e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=tol, atol=tol,
    )

    g = jnp.asarray(rng.normal(size=(N, L, H)), dtype)

    def loss(q, k, v):
        return jnp.sum((at.mha(q, k, v, bias, heads) * g).astype(jnp.float32))

    def loss_ref(q, k, v):
        return jnp.sum(
            (at._mha_xla(q, k, v, bias, heads) * g).astype(jnp.float32)
        )

    got = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=tol * 5, atol=tol * 5, err_msg=name,
        )


def test_mha_squad_shapes_fit_or_fall_back():
    """SQuAD-sized L=384: bf16 fits the kernel — since round 5 through the
    head-GROUPED stacked forward (group=6 at nb=1; round 4 fell back to the
    per-head kernel here, VERDICT r4 #2) — while f32's backward would blow
    scoped VMEM, so f32 routes to the XLA implementation. Both paths must
    agree with the reference, under a doc-stride-realistic partial mask."""
    from bayeformers_tpu.ops import attention as at

    rng = np.random.default_rng(1)
    N, L, H, heads = 4, 384, 768, 12
    assert at.pallas_fits(L, H, 2)       # bf16
    assert not at.pallas_fits(L, H, 4)   # f32 backward exceeds VMEM
    # the long-sequence config must be the phase-batched stacked kernel
    nb_group = at._pick_nb_stacked(L, H, heads, 2)
    assert nb_group is not None and nb_group[1] >= 2, nb_group

    mask = np.ones((N, L), np.int32)
    mask[0, 300:] = 0   # short final window, doc-stride style
    mask[2, 150:] = 0
    for dtype, tol in ((jnp.bfloat16, 2e-2), (jnp.float32, 2e-5)):
        q = jnp.asarray(rng.normal(size=(N, L, H)), dtype)
        k = jnp.asarray(rng.normal(size=(N, L, H)), dtype)
        v = jnp.asarray(rng.normal(size=(N, L, H)), dtype)
        bias = at.mask_to_bias(jnp.asarray(mask))

        def loss(q, k, v):
            return jnp.sum(at.mha(q, k, v, bias, heads).astype(jnp.float32))

        val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)
        ref = at._mha_xla(q, k, v, bias, heads)
        np.testing.assert_allclose(
            np.asarray(at.mha(q, k, v, bias, heads), np.float32),
            np.asarray(ref, np.float32), rtol=tol, atol=tol,
        )
        assert all(np.isfinite(np.asarray(g, np.float32)).all() for g in grads)


def test_fused_step_inside_shard_map_on_tpu():
    """Pallas kernels inside shard_map on real hardware (VERDICT r2 'next'
    #2b): the production make_train_step (fused estimator, dp=1 mesh on the
    single chip) must compile and execute — the combination shard_map +
    pallas_call custom VJPs had otherwise never run anywhere."""
    import optax

    import bayeformers_tpu as bf
    from bayeformers_tpu.models import bert as bert_lib
    from bayeformers_tpu.parallel import train as ptrain
    from bayeformers_tpu.utils.optim import masked_optimizer

    bundle = bert_lib.build_bert(
        task="classification", n_labels=2, size="tiny",
        hidden_size=256, num_attention_heads=4, intermediate_size=512,
    )
    bmodel, bp = bf.to_bayesian(
        bundle.apply_fn, bundle.params, delta=0.05, freeze=True
    )
    batch = bert_lib.synthetic_batch(np.random.default_rng(0), 8, 16, 1024, 2)
    tx = masked_optimizer(optax.sgd(1e-3), bmodel.trainable_mask(bp))

    mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:1]), ("dp",))
    step = ptrain.make_train_step(bmodel, tx, 2, 10, mesh, estimator="fused")
    bp_rep = ptrain.replicate(bp, mesh)
    batch_sh = jax.tree.map(
        lambda a: jax.device_put(
            a,
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("dp")),
        ),
        batch,
    )
    bp2, _, m = step(bp_rep, tx.init(bp_rep), jax.random.key(3), batch_sh)
    assert np.isfinite(float(m["loss"]))
    leaf = np.asarray(
        bp2.rho["bert/encoder/layer/0/attention/self/query/kernel"]
    )
    assert np.isfinite(leaf).all()

    # the same single-device step outside shard_map must agree (same key,
    # same kernels): shard_map must not perturb the Pallas numerics
    from bayeformers_tpu import training

    single = training.make_elbo_train_step(bmodel, tx, 2, 10, fused=True)
    bp1, _, m1 = single(bp, tx.init(bp), jax.random.key(3), batch)
    np.testing.assert_allclose(
        float(m1["loss"]), float(m["loss"]), rtol=2e-5
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_mha_causal_kernel_parity(dtype):
    """causal=True on the Pallas kernel == XLA reference with the same
    in-kernel iota mask, fwd + bwd, pad+causal composition included."""
    from bayeformers_tpu.ops import attention as at

    rng = np.random.default_rng(1)
    N, L, H, heads = 5, 128, 768, 12
    q = jnp.asarray(rng.normal(size=(N, L, H)), dtype)
    k = jnp.asarray(rng.normal(size=(N, L, H)), dtype)
    v = jnp.asarray(rng.normal(size=(N, L, H)), dtype)
    mask = np.ones((N, L), np.int32)
    mask[2, 96:] = 0  # padded keys under causality: where-composition, no NaN
    bias = at.mask_to_bias(jnp.asarray(mask))

    out = at.mha(q, k, v, bias, heads, causal=True)
    ref = at._mha_xla(q, k, v, bias, heads, causal=True)
    assert not np.isnan(np.asarray(out, np.float32)).any()
    tol = 2e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=tol, atol=tol,
    )

    g = jnp.asarray(rng.normal(size=(N, L, H)), dtype)

    def loss(q, k, v):
        return jnp.sum(
            (at.mha(q, k, v, bias, heads, causal=True) * g).astype(jnp.float32)
        )

    def loss_ref(q, k, v):
        return jnp.sum(
            (at._mha_xla(q, k, v, bias, heads, causal=True) * g).astype(
                jnp.float32
            )
        )

    got = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=tol * 5, atol=tol * 5, err_msg=name,
        )
