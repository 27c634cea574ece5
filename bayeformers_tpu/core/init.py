"""Variational-parameter initialization policies.

Mirrors the reference's ``Initialization`` callbacks
(`bayeformers/nn/parameters/initializations.py:14-60`) and the MOPED
empirical-Bayes transform (`bayeformers/nn/layers/linear.py:139-163`,
Krishnan et al. 2020, arXiv:1906.05323) as pure functions.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from bayeformers_tpu.core import distributions as dist


@dataclasses.dataclass(frozen=True)
class UniformInit:
    """Uniform init for ``(mu, rho)``.

    Default ranges mirror ``DEFAULT_UNIFORM = Uniform((-0.2, 0.2), (-5, -4))``
    (reference `initializations.py:60`): rho in (-5, -4) gives an initial
    sigma of roughly softplus(-4.5) ~= 0.011.
    """

    mu_range: tuple[float, float] = (-0.2, 0.2)
    rho_range: tuple[float, float] = (-5.0, -4.0)

    def __call__(
        self, key: jax.Array, shape: tuple[int, ...], dtype=jnp.float32
    ) -> tuple[jax.Array, jax.Array]:
        k_mu, k_rho = jax.random.split(key)
        mu = jax.random.uniform(
            k_mu, shape, dtype, minval=self.mu_range[0], maxval=self.mu_range[1]
        )
        rho = jax.random.uniform(
            k_rho, shape, dtype, minval=self.rho_range[0], maxval=self.rho_range[1]
        )
        return mu, rho


DEFAULT_UNIFORM = UniformInit()


def moped_rho(w: jax.Array, delta: float) -> jax.Array:
    """MOPED posterior scale: ``rho = softplus^-1(delta * |w|)``.

    Reference computes ``log(exp(delta*|w|) - 1)`` and patches the ``-inf``
    produced by exactly-zero (or underflowing) weights back to ``0.0``
    (`layers/linear.py:140-144`). Same patch here, with ``expm1`` for
    precision (values agree well under rtol=1e-5).
    """
    rho = dist.inv_softplus(delta * jnp.abs(w))
    return jnp.where(jnp.isneginf(rho), jnp.zeros_like(rho), rho)
