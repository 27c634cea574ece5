"""BayeFormers-TPU: TPU-native Bayes-by-Backprop over Flax models.

A from-scratch JAX/Flax/Pallas framework with the capabilities of the
PyTorch reference `yliess86/BayeFormers`: convert any frequentist Flax model
(including HF FLAX transformers) into a Bayesian one with Gaussian
variational posteriors ``w = mu + softplus(rho) * eps``, scale-mixture or
MOPED empirical-Bayes priors, differentiable model-wide ``log_prior`` /
``log_variational_posterior``, and a vmapped Monte-Carlo ELBO engine — with
Pallas TPU kernels fusing on-chip weight sampling into the matmul and GSPMD
sharding for multi-chip scale.
"""
from bayeformers_tpu.nn.surgery import (
    BayesianModel,
    BayesParams,
    ConversionRule,
    ConversionSpec,
    CONV_RULE,
    DEFAULT_RULES,
    EMBEDDING_RULE,
    LINEAR_RULE,
    find_convertible_paths,
    to_bayesian,
)
from bayeformers_tpu.core.init import DEFAULT_UNIFORM, UniformInit, moped_rho
from bayeformers_tpu.core.prior import (
    DEFAULT_SCALE_MIXTURE,
    MOPED_PRIOR_SIGMA,
    ScaleMixturePrior,
)
from bayeformers_tpu import elbo

__version__ = "0.1.0"

__all__ = [
    "BayesianModel",
    "BayesParams",
    "ConversionRule",
    "CONV_RULE",
    "ConversionSpec",
    "DEFAULT_RULES",
    "DEFAULT_SCALE_MIXTURE",
    "DEFAULT_UNIFORM",
    "EMBEDDING_RULE",
    "LINEAR_RULE",
    "MOPED_PRIOR_SIGMA",
    "ScaleMixturePrior",
    "UniformInit",
    "elbo",
    "find_convertible_paths",
    "moped_rho",
    "to_bayesian",
]
