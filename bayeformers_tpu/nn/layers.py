"""Hand-built Bayesian layers (the reference ``bayeformers.nn`` zoo).

The reference lets users compose Bayesian models directly — subclass
``bnn.Model``, stack ``bnn.Linear`` layers, read summed ``log_prior`` /
``log_variational_posterior`` (`README.md:34-56`, `bayeformers/nn/layers/
linear.py:24-104`, `bayeformers/nn/model.py`). The Flax equivalents:

- :class:`BayesLinear` — a linen module with Gaussian variational ``mu``/
  ``rho`` params, routed through the fused Pallas sampled-matmul on TPU. Each
  call draws fresh weights from the ``'bayes'`` RNG stream and sows its
  per-call log-prob scalars into the ``'kl'`` collection (the functional
  replacement for the reference's ``.data``-mutated buffer scalars, Q1).
- :func:`bayes_apply` / :func:`collect_kl` — run a hand-built module and sum
  the sown KL terms model-wide (the ``Model.log_prior()`` semantics,
  `nn/model.py:70-89`, with duck-typing replaced by collection scoping).

Sample-axis convention: with ``sample_axis=True`` the input carries an
explicit leading MC axis ``(S, ..., K)`` and each sample gets independent
weights in ONE fused kernel launch — the TPU-first form. With the default
``sample_axis=False`` a call consumes ``(…, K)`` and draws one weight set,
matching the reference's per-forward sampling; run S calls with different
RNGs for the MC loop.
"""
from __future__ import annotations



import flax.linen as nn
import jax
import jax.numpy as jnp

from bayeformers_tpu.core import distributions as dist
from bayeformers_tpu.core import init as init_lib
from bayeformers_tpu.core import prior as prior_lib
from bayeformers_tpu.ops import common as ops_common
from bayeformers_tpu.ops import fused_linear as ops_fused

KL_COLLECTION = "kl"


class BayesLinear(nn.Module):
    """Bayesian dense layer: ``y = x @ (mu + softplus(rho)*eps) + b_sampled``.

    Parity notes vs reference ``bnn.Linear`` (`layers/linear.py`): same
    variational parametrization and default ``Uniform((-0.2,0.2), (-5,-4))``
    init; same default scale-mixture prior values; optional bias via
    ``use_bias`` (the reference's NoneParameter null-object becomes a plain
    conditional). KL terms are differentiable by design.
    """

    features: int
    use_bias: bool = True
    initialization: init_lib.UniformInit = init_lib.DEFAULT_UNIFORM
    prior: prior_lib.ScaleMixturePrior = prior_lib.DEFAULT_SCALE_MIXTURE
    sample_axis: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k_in = x.shape[-1]
        init = self.initialization
        mu = self.param(
            "mu", lambda key, shape: init(key, shape)[0], (k_in, self.features)
        )
        rho = self.param(
            "rho", lambda key, shape: init(key, shape)[1], (k_in, self.features)
        )
        key = self.make_rng("bayes")
        mixture = (self.prior.pi, self.prior.sigma1, self.prior.sigma2)

        if self.sample_axis:
            n_samples = x.shape[0]
            lead = x.shape[:-1]
            xs = x.reshape(n_samples, -1, k_in)
        else:
            n_samples = 1
            lead = x.shape[:-1]
            xs = x.reshape(1, -1, k_in)
        seeds = ops_common.seed_from_key(jax.random.split(key, n_samples))

        y, log_q, log_p = ops_fused.bayes_linear(
            xs, mu, rho, seeds, mixture=mixture
        )

        if self.use_bias:
            b_mu = self.param(
                "bias_mu", lambda key, shape: init(key, shape)[0], (self.features,)
            )
            b_rho = self.param(
                "bias_rho", lambda key, shape: init(key, shape)[1], (self.features,)
            )
            b_key = self.make_rng("bayes")
            b_eps = jax.random.normal(b_key, (n_samples,) + b_mu.shape, b_mu.dtype)
            b_sig = dist.sigma_from_rho(b_rho)
            b = b_mu[None] + b_sig[None] * b_eps
            y = y + b[:, None, :]
            log_q = log_q + jnp.sum(
                -dist.LOG_SQRT_2PI - jnp.log(b_sig)[None] - 0.5 * b_eps * b_eps,
                axis=-1,
            )
            log_p = log_p + jax.vmap(
                lambda bi: dist.scale_mixture_log_prob(bi, *mixture)
            )(b)

        # Per-call KL scalars, summed over the sample axis so stacked calls
        # accumulate comparably. Readers should divide by S or keep (S,) via
        # collect_kl(reduce=False).
        self.sow(KL_COLLECTION, "log_variational_posterior", log_q)
        self.sow(KL_COLLECTION, "log_prior", log_p)

        return y.reshape(lead + (self.features,))


def collect_kl(kl_vars) -> dict[str, jax.Array]:
    """Sum sown KL scalars model-wide (reference ``Model.log_prior()``).

    ``kl_vars`` is the ``'kl'`` collection returned by ``module.apply(...,
    mutable=['kl'])``. Returns (S,)-shaped totals (S=1 when layers ran
    without a sample axis).
    """
    from flax.traverse_util import flatten_dict

    totals: dict[str, jax.Array] = {}
    for path, values in flatten_dict(kl_vars).items():
        name = path[-1]
        for v in values:  # sow stores a tuple per call site
            totals[name] = totals.get(name, 0.0) + v
    if not totals:
        raise ValueError("no Bayesian layers sowed KL terms in this apply")
    return totals


def bayes_apply(module: nn.Module, variables, key: jax.Array, *args, **kwargs):
    """Run a hand-built Bayesian module; returns (out, {log_prior, log_q}).

    Splits ``key`` into the ``'bayes'`` RNG stream and gathers sown KL terms.
    """
    out, mutated = module.apply(
        variables, *args, rngs={"bayes": key}, mutable=[KL_COLLECTION], **kwargs
    )
    totals = collect_kl(mutated[KL_COLLECTION])
    return out, {
        "log_prior": totals["log_prior"],
        "log_variational_posterior": totals["log_variational_posterior"],
    }
