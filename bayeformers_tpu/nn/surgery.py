"""``to_bayesian`` as a pytree transform over Flax parameter trees.

The reference converts models by deep-copying a live ``nn.Module`` tree and
``setattr``-ing Bayesian replacements over registry hits
(`bayeformers/__init__.py:50-61`, registry ``TORCH2BAYE = {nn.Linear: Linear}``
at `bayeformers/nn/__init__.py:25`). The TPU-native equivalent operates on the
*parameter pytree*: every convertible leaf ``w`` becomes a variational pair
``(mu, rho)``; the original (unmodified) Flax module is then applied to a
freshly *sampled* concrete tree each forward. This works unchanged for any
Flax model — including HF FLAX transformers — because Flax already separates
module code from parameters.

KL bookkeeping is functional: ``apply`` returns ``(output, aux)`` with
differentiable ``log_prior`` / ``log_variational_posterior`` scalars, fixing
the reference's ``.data``-detached KL (SURVEY.md Q1) by design while keeping
value parity (same formulas, tested at rtol=1e-5).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import struct
from flax.traverse_util import flatten_dict, unflatten_dict

from bayeformers_tpu.core import distributions as dist
from bayeformers_tpu.core import init as init_lib
from bayeformers_tpu.core import prior as prior_lib

SEP = "/"


# ---------------------------------------------------------------------------
# Conversion rules (the TORCH2BAYE registry, re-thought for param pytrees)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ConversionRule:
    """Classifies leaves of a params tree as convertible.

    ``match(path, group)`` receives the leaf path (tuple of str) and the
    sibling group ``{leaf_name: shape-like}`` of its parent module, and
    returns True if this leaf should become a Gaussian variational parameter.
    """

    name: str
    match: Callable[[tuple[str, ...], Mapping[str, Any]], bool]


def _is_dense_group(group: Mapping[str, Any]) -> bool:
    # A Flax nn.Dense param group: 2-D `kernel`, optional 1-D `bias`.
    if "kernel" not in group:
        return False
    kernel = group["kernel"]
    if kernel.ndim != 2:
        return False
    if "bias" in group and group["bias"].ndim != 1:
        return False
    return set(group) <= {"kernel", "bias"}


def _match_linear(path: tuple[str, ...], group: Mapping[str, Any]) -> bool:
    return path[-1] in ("kernel", "bias") and _is_dense_group(group)


def _match_embedding(path: tuple[str, ...], group: Mapping[str, Any]) -> bool:
    return path[-1] == "embedding" and group["embedding"].ndim == 2


def _match_conv(path: tuple[str, ...], group: Mapping[str, Any]) -> bool:
    # A Flax nn.Conv param group: (*kernel_size, cin, cout) `kernel` with
    # 1-3 spatial dims, optional 1-D `bias`.
    if path[-1] not in ("kernel", "bias") or "kernel" not in group:
        return False
    kernel = group["kernel"]
    if kernel.ndim not in (3, 4, 5):
        return False
    if "bias" in group and group["bias"].ndim != 1:
        return False
    return set(group) <= {"kernel", "bias"}


# Default registry mirrors the reference's `{nn.Linear: Linear}` scope:
# only dense/linear layers convert; LayerNorm, conv and embedding leaves stay
# frequentist (`bayeformers/nn/__init__.py:25`). EMBEDDING_RULE and CONV_RULE
# are opt-in extensions: `rules=(*DEFAULT_RULES, CONV_RULE)` converts true
# nn.Conv layers too (ViT patch embedding, Whisper's encoder convs) — the
# naive tier samples them like any leaf, the interception tiers lower them
# to im2col + the fused sampled matmul (nn/fused.py::handle_conv).
LINEAR_RULE = ConversionRule("linear", _match_linear)
EMBEDDING_RULE = ConversionRule("embedding", _match_embedding)
CONV_RULE = ConversionRule("conv", _match_conv)
DEFAULT_RULES: tuple[ConversionRule, ...] = (LINEAR_RULE,)


# ---------------------------------------------------------------------------
# Bayesian parameter container
# ---------------------------------------------------------------------------

@struct.dataclass
class BayesParams:
    """Variational state: full model tree + per-converted-leaf extras.

    ``params`` keeps the original tree structure with converted slots holding
    ``mu``; ``rho`` and (for MOPED) ``prior_mu`` are flat ``{path: array}``
    dicts keyed by '/'-joined leaf paths.
    """

    params: Any
    rho: dict[str, jax.Array]
    prior_mu: dict[str, jax.Array]


@dataclasses.dataclass(frozen=True)
class ConversionSpec:
    """Static description of a conversion (hashable; safe to close over in jit)."""

    paths: tuple[str, ...]
    prior: prior_lib.ScaleMixturePrior
    moped: bool
    frozen: bool
    delta: Optional[float]


# ---------------------------------------------------------------------------
# The Bayesian model wrapper
# ---------------------------------------------------------------------------

class BayesianModel:
    """Functional counterpart of the reference ``Model`` wrapper (`nn/model.py`).

    ``apply`` = sample every variational leaf with an explicit PRNG key, call
    the wrapped apply function on the concrete tree, and return the summed
    ``log_prior`` / ``log_variational_posterior`` as aux outputs (the
    reference aggregates the same sums over "Bayesian children",
    `nn/model.py:70-89`).
    """

    def __init__(self, apply_fn: Callable[..., Any], spec: ConversionSpec):
        self.apply_fn = apply_fn
        self.spec = spec

    # -- sampling -----------------------------------------------------------
    def sample(
        self, bparams: BayesParams, key: jax.Array
    ) -> tuple[Any, jax.Array, jax.Array]:
        """Draw one concrete parameter tree; return (params, log_prior, log_q)."""
        flat = flatten_dict(bparams.params, sep=SEP)
        log_p = jnp.zeros((), jnp.float32)
        log_q = jnp.zeros((), jnp.float32)
        for i, path in enumerate(self.spec.paths):
            mu, rho = flat[path], bparams.rho[path]
            w, _ = dist.sample_gaussian(jax.random.fold_in(key, i), mu, rho)
            sigma = dist.sigma_from_rho(rho)
            log_q = log_q + dist.gaussian_log_prob(w, mu, sigma)
            if self.spec.moped:
                log_p = log_p + prior_lib.moped_prior_log_prob(
                    w, bparams.prior_mu[path]
                )
            else:
                log_p = log_p + self.spec.prior.log_prob(w)
            flat[path] = w
        return unflatten_dict(flat, sep=SEP), log_p, log_q

    # -- forward ------------------------------------------------------------
    def apply(self, bparams: BayesParams, key: jax.Array, *args, **kwargs):
        """One stochastic forward pass. Returns ``(output, aux)``."""
        params, log_p, log_q = self.sample(bparams, key)
        out = self.apply_fn(params, *args, **kwargs)
        return out, {"log_prior": log_p, "log_variational_posterior": log_q}

    def mc_apply(
        self, bparams: BayesParams, key: jax.Array, n_samples: int, *args, **kwargs
    ):
        """S Monte-Carlo forward passes, vmapped over split keys.

        The reference runs S *sequential* full-model forwards per step
        (`examples/bert_glue.py:63`); here the sample axis is a vmapped
        leading axis so XLA batches it onto the MXU.
        Returns ``(outputs_S..., aux)`` with aux scalars of shape (S,).
        """
        keys = jax.random.split(key, n_samples)
        return jax.vmap(lambda k: self.apply(bparams, k, *args, **kwargs))(keys)

    def mc_apply_fused(
        self, bparams: BayesParams, key: jax.Array, n_samples: int, *args,
        save_weights: bool = True, antithetic: bool = False, tp=None, **kwargs,
    ):
        """S MC forwards as ONE super-batched pass through the Pallas tier.

        Same contract as :meth:`mc_apply`, but instead of vmapping S full
        forwards it tiles the batch S-major and intercepts every converted
        ``nn.Dense`` (and opt-in ``nn.Embed``) call, routing it through the
        fused sampled-matmul / KL-reduction kernels with per-sample weights
        (see nn/fused.py). Requires ``apply_fn`` to call a Flax module's
        ``apply`` internally (true for all linen models incl. HF FLAX).
        """
        from bayeformers_tpu.nn import fused as fused_lib

        convert_embeddings = any(
            p.rsplit(SEP, 1)[-1] == "embedding" for p in self.spec.paths
        )
        return fused_lib.fused_mc_apply(
            self.apply_fn, self.spec, bparams, key, n_samples, *args,
            convert_embeddings=convert_embeddings, save_weights=save_weights,
            antithetic=antithetic, tp=tp,
            **kwargs,
        )

    def mc_apply_flipout(
        self, bparams: BayesParams, key: jax.Array, n_samples: int, *args, **kwargs
    ):
        """Flipout estimator (extension; see nn/flipout.py): per-example
        decorrelated perturbations with shared weight draws + analytic KL.
        Same return contract as :meth:`mc_apply`."""
        from bayeformers_tpu.nn import flipout as flipout_lib

        return flipout_lib.flipout_mc_apply(
            self.apply_fn, self.spec, bparams, key, n_samples, *args, **kwargs
        )

    def mc_apply_lrt(
        self, bparams: BayesParams, key: jax.Array, n_samples: int, *args, **kwargs
    ):
        """Local reparameterization estimator (extension; see nn/lrt.py):
        activations sampled from their exact Gaussian marginals — two
        shared-weight matmuls per layer regardless of S, analytic KL.
        Same return contract as :meth:`mc_apply`."""
        from bayeformers_tpu.nn import lrt as lrt_lib

        return lrt_lib.lrt_mc_apply(
            self.apply_fn, self.spec, bparams, key, n_samples, *args, **kwargs
        )

    # -- trainability -------------------------------------------------------
    def trainable_mask(self, bparams: BayesParams) -> BayesParams:
        """Bool pytree for optax.masked: False = do not train.

        MOPED ``freeze=True`` freezes converted-leaf ``mu`` only
        (reference `layers/linear.py:145,161`); ``prior_mu`` is never trained
        (it is the prior's fixed center).
        """
        flat = {
            path: not self.spec.frozen for path in self.spec.paths
        }
        params_mask = jax.tree.map(lambda _: True, bparams.params)
        pflat = flatten_dict(params_mask, sep=SEP)
        for path, trainable in flat.items():
            pflat[path] = trainable
        return BayesParams(
            params=unflatten_dict(pflat, sep=SEP),
            rho={p: True for p in bparams.rho},
            prior_mu={p: False for p in bparams.prior_mu},
        )


# ---------------------------------------------------------------------------
# to_bayesian — the entry point (reference `bayeformers/__init__.py:19-63`)
# ---------------------------------------------------------------------------

def find_convertible_paths(
    params: Any, rules: Sequence[ConversionRule] = DEFAULT_RULES
) -> tuple[str, ...]:
    """All '/'-joined leaf paths matched by any rule, in deterministic order."""
    flat = flatten_dict(params)
    groups: dict[tuple[str, ...], dict[str, Any]] = {}
    for path, leaf in flat.items():
        groups.setdefault(tuple(path[:-1]), {})[path[-1]] = leaf
    out = []
    for path in sorted(flat):
        group = groups[tuple(path[:-1])]
        if any(rule.match(tuple(path), group) for rule in rules):
            out.append(SEP.join(path))
    return tuple(out)


def to_bayesian(
    apply_fn: Callable[..., Any],
    params: Any,
    *,
    rng: Optional[jax.Array] = None,
    initialization: init_lib.UniformInit = init_lib.DEFAULT_UNIFORM,
    prior: prior_lib.ScaleMixturePrior = prior_lib.DEFAULT_SCALE_MIXTURE,
    delta: Optional[float] = None,
    freeze: bool = False,
    rules: Sequence[ConversionRule] = DEFAULT_RULES,
) -> tuple[BayesianModel, BayesParams]:
    """Convert a frequentist Flax model into a Bayesian one.

    Mirrors the reference signature ``to_bayesian(model, initialization,
    prior, delta, freeze)`` (`bayeformers/__init__.py:19-24`):

    - ``delta=None``: random variational init from ``initialization`` (needs
      ``rng``), scale-mixture ``prior``;
    - ``delta`` set: MOPED empirical-Bayes init — ``mu <- w``,
      ``rho <- softplus^-1(delta*|w|)`` with the -inf->0 patch, and a
      per-leaf Gaussian prior centered on the pretrained weights with
      sigma = softplus(1) (`layers/linear.py:139-163`); ``freeze`` marks
      ``mu`` non-trainable via :meth:`BayesianModel.trainable_mask`.

    ``apply_fn(params, *args, **kwargs)`` is the frequentist forward (e.g.
    ``lambda p, x: module.apply({'params': p}, x)``). No deepcopy is needed:
    params are immutable arrays, and the returned tree shares unconverted
    leaves with the input (the reference deepcopies the full model,
    `__init__.py:59`, doubling peak host memory).
    """
    paths = find_convertible_paths(params, rules)
    flat = flatten_dict(params, sep=SEP)
    rho: dict[str, jax.Array] = {}
    prior_mu: dict[str, jax.Array] = {}

    if delta is None:
        if rng is None:
            raise ValueError("to_bayesian(delta=None) needs `rng` for random init")
        for i, path in enumerate(paths):
            w = flat[path]
            mu, r = initialization(jax.random.fold_in(rng, i), w.shape, w.dtype)
            flat[path] = mu
            rho[path] = r
    else:
        for path in paths:
            w = flat[path]
            rho[path] = init_lib.moped_rho(w, delta)
            prior_mu[path] = w
            # mu stays = pretrained w (flat[path] unchanged)

    spec = ConversionSpec(
        paths=paths,
        prior=prior,
        moped=delta is not None,
        frozen=freeze and delta is not None,
        delta=delta,
    )
    bparams = BayesParams(
        params=unflatten_dict(flat, sep=SEP), rho=rho, prior_mu=prior_mu
    )
    return BayesianModel(apply_fn, spec), bparams
