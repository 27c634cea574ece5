"""Prior specifications as plain, hashable config — not stateful modules.

The reference ships a single mutable ``ScaledGaussianMixture`` module
*instance* shared by every layer (`gaussian.py:175-177`, SURVEY.md Q2). Here a
prior is either:

- :class:`ScaleMixturePrior` — static ``(pi, sigma1, sigma2)`` floats, the
  default ``ScaleMixturePrior(0.5, e**0, e**-6)`` mirroring
  ``DEFAULT_SCALED_GAUSSIAN_MIXTURE``; or
- a per-leaf *MOPED Gaussian prior*: mean = the pretrained weight (an array
  carried in the Bayesian parameter pytree), sigma = ``softplus(1.0)`` —
  the reference sets ``prior.rho = ones`` so sigma is softplus(1) ≈ 1.3133,
  not 1.0 (`layers/linear.py:147-150`, SURVEY.md Q3). Replicated exactly.
"""
from __future__ import annotations

import dataclasses
import math

import jax

from bayeformers_tpu.core import distributions as dist

# softplus(1.0): the MOPED prior sigma (reference `linear.py:149` + `gaussian.py:88`).
MOPED_PRIOR_SIGMA = math.log1p(math.e)


@dataclasses.dataclass(frozen=True)
class ScaleMixturePrior:
    """Two-component zero-mean Gaussian scale mixture (reference `gaussian.py:119-171`)."""

    pi: float = 0.5
    sigma1: float = 1.0            # e**0  (reference `gaussian.py:176`)
    sigma2: float = math.exp(-6.0)  # e**-6

    def log_prob(self, w: jax.Array) -> jax.Array:
        return dist.scale_mixture_log_prob(w, self.pi, self.sigma1, self.sigma2)


DEFAULT_SCALE_MIXTURE = ScaleMixturePrior()


def moped_prior_log_prob(w: jax.Array, prior_mu: jax.Array) -> jax.Array:
    """Gaussian prior centered on the pretrained weight, sigma = softplus(1)."""
    return dist.gaussian_log_prob(w, prior_mu, MOPED_PRIOR_SIGMA)
