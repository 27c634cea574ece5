"""Monte-Carlo ELBO estimation (Blundell et al. 2015, Bayes-by-Backprop).

The reference repeats one sampling idiom in its README and every example
(`README.md:58-72`, `examples/mlp_mnist.py:92-106`, `examples/bert_glue.py:
56-73`): S sequential forward passes, average the per-sample logits and
log-prob scalars, then

    loss = (log_variational_posterior - log_prior) / n_batches + nll(sum)

Here the S samples ride a vmapped axis (see BayesianModel.mc_apply) and the
loss is a pure function. Unlike the reference — whose KL term is detached
from autograd by `.data` writes (SURVEY.md Q1) — this ELBO is differentiable
end-to-end, which is the algorithm as published.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def elbo_loss(
    nll: jax.Array,
    log_prior: jax.Array,
    log_variational_posterior: jax.Array,
    n_batches: int,
) -> jax.Array:
    """``(mean_S(log_q) - mean_S(log_p)) / n_batches + nll``.

    ``nll`` must already be sum-reduced over the batch (the reference uses
    sum-reduction criteria, `examples/mlp_mnist.py:36`,
    `examples/bert_glue.py:181`). ``log_prior`` / ``log_q`` may be scalars or
    (S,) vectors of per-sample values; they are averaged over the sample axis.
    """
    return (
        jnp.mean(log_variational_posterior) - jnp.mean(log_prior)
    ) / n_batches + nll


def blundell_weight(batch_index, n_batches: int):
    """Geometric minibatch KL weight pi_i = 2^(M-i) / (2^M - 1)
    (Blundell et al. 2015, eq. 9) — front-loads the complexity cost onto
    the first minibatches of each epoch instead of the uniform 1/M the
    reference hard-codes (`examples/mlp_mnist.py:103`). Use as
    ``elbo_loss(nll, lp, lq, 1/blundell_weight(i, M))``-style scaling, or
    directly: ``nll + w * (mean(lq) - mean(lp))``.

    Computed via the algebraically-cancelled form
    pi_i = 2^-i / (1 - 2^-M): the naive 2^(M-i)/(2^M - 1) overflows f32
    past M~128, and even its log-space version loses the fractional bits
    of (M - i)*log2 at dataset-scale M. ``batch_index`` is 0-based
    (i = index + 1 in the paper's 1-based convention).
    """
    i = jnp.asarray(batch_index, jnp.float32) + 1.0
    m = jnp.float32(n_batches)
    log2 = jnp.log(jnp.float32(2.0))
    return jnp.exp(-i * log2 - jnp.log1p(-jnp.exp(-m * log2)))


def mc_logits_mean(logits: jax.Array) -> jax.Array:
    """Average predictions over the leading MC-sample axis.

    The reference averages the raw (S, B, ...) logits buffer before the NLL
    (`examples/mlp_mnist.py:104`, `examples/bert_glue.py:183`).
    """
    return jnp.mean(logits, axis=0)


def nll_sum_from_log_probs(log_probs: jax.Array, labels: jax.Array) -> jax.Array:
    """Sum-reduced NLL over log-probabilities (torch ``NLLLoss(sum)`` parity).

    Always reduced in float32 so bf16-activation models keep a stable loss.
    """
    log_probs = log_probs.astype(jnp.float32)
    return -jnp.sum(jnp.take_along_axis(log_probs, labels[:, None], axis=-1))


def cross_entropy_sum(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Sum-reduced softmax cross entropy (torch ``CrossEntropyLoss(sum)`` parity)."""
    return nll_sum_from_log_probs(
        jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1), labels
    )


def accuracy_and_std(logits: jax.Array, labels: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(accuracy of the S-averaged prediction, std of per-sample accuracies).

    ``acc_std`` across the S Monte-Carlo draws is the reference's
    uncertainty proxy (`examples/bert_glue.py:185-186`).
    """
    mean_pred = jnp.argmax(mc_logits_mean(logits), axis=-1)
    acc = jnp.mean((mean_pred == labels).astype(jnp.float32))
    per_sample_acc = jnp.mean(
        (jnp.argmax(logits, axis=-1) == labels[None, :]).astype(jnp.float32), axis=1
    )
    return acc, jnp.std(per_sample_acc)


def aux_scalars(aux: dict[str, Any]) -> tuple[jax.Array, jax.Array]:
    """Pull (log_prior, log_q) out of a BayesianModel aux dict."""
    return aux["log_prior"], aux["log_variational_posterior"]


def analytic_kl(bparams, spec, key: jax.Array | None = None,
                mixture_draws: int = 4) -> jax.Array:
    """Closed-form ``KL(q || prior)`` summed over all converted leaves.

    Extension over the reference recipe: the reference always estimates the
    KL with the single-draw ``log_q - log_p`` evaluated at the sampled
    weights (`examples/mlp_mnist.py:145-154`); for Gaussian (MOPED) priors
    the expectation has a closed form, so ``analytic_kl(...) / n_batches +
    nll`` is the same objective with a zero-variance KL term — usable with
    any estimator (fused / naive / flipout).

    The scale-mixture prior has no closed form; its cross-entropy term is
    estimated with ``mixture_draws`` fresh reparametrized draws per leaf
    (requires ``key``), while the entropy term stays analytic.
    """
    from flax.traverse_util import flatten_dict

    from bayeformers_tpu.core import distributions as dist
    from bayeformers_tpu.core import prior as prior_lib
    from bayeformers_tpu.core.distributions import LOG_SQRT_2PI
    from bayeformers_tpu.nn.surgery import SEP

    flat = flatten_dict(bparams.params, sep=SEP)
    kl = jnp.zeros((), jnp.float32)
    for i, path in enumerate(spec.paths):
        mu, rho = flat[path], bparams.rho[path]
        sigma = dist.sigma_from_rho(rho)
        if spec.moped:
            kl = kl + dist.gaussian_kl(
                mu, sigma, bparams.prior_mu[path], prior_lib.MOPED_PRIOR_SIGMA
            )
        else:
            if key is None:
                raise ValueError(
                    "analytic_kl with a scale-mixture prior needs `key` for "
                    "the MC cross-entropy term"
                )
            # E_q[log q] is analytic (negative Gaussian entropy); E_q[log p]
            # is averaged over mixture_draws reparametrized samples
            n = mu.size
            neg_entropy = -0.5 * n * (1.0 + 2.0 * LOG_SQRT_2PI) - jnp.sum(
                jnp.log(sigma)
            )
            draws = jax.random.split(jax.random.fold_in(key, i), mixture_draws)

            def cross(k):
                w, _ = dist.sample_gaussian(k, mu, rho)
                return spec.prior.log_prob(w)

            kl = kl + neg_entropy - jnp.mean(jax.vmap(cross)(draws))
    return kl


def predictive(bmodel, bparams, key: jax.Array, n_samples: int, *args,
               fused: bool = True, **kwargs):
    """Posterior-predictive summary for a classifier.

    Runs S stochastic forwards and returns a dict with:

    - ``probs``: mean softmax probabilities over MC draws (B, C);
    - ``epistemic_std``: per-class std of probabilities across draws — the
      model-uncertainty signal MOPED-style BNNs are used for (the reference
      surfaces the cruder ``acc_std``, `examples/bert_glue.py:186`);
    - ``entropy``: predictive entropy of the mean distribution (B,);
    - ``logits``: the raw (S, B, C) logits for custom analyses.
    """
    if fused:
        logits, _ = bmodel.mc_apply_fused(
            bparams, key, n_samples, *args, save_weights=False, **kwargs
        )
    else:
        logits, _ = bmodel.mc_apply(bparams, key, n_samples, *args, **kwargs)
    probs_s = jax.nn.softmax(logits, axis=-1)
    probs = jnp.mean(probs_s, axis=0)
    entropy = -jnp.sum(probs * jnp.log(jnp.clip(probs, 1e-12)), axis=-1)
    return {
        "probs": probs,
        "epistemic_std": jnp.std(probs_s, axis=0),
        "entropy": entropy,
        "logits": logits,
    }
