"""Local reparameterization estimator (Kingma, Salimans & Welling 2015,
arXiv:1506.02557) — an extension beyond the reference's capabilities.

For a Gaussian-posterior linear layer, the pre-activations conditioned on
the input are themselves Gaussian:

    y  ~  N( x @ mu + b_mu ,  (x*x) @ sigma^2 + b_sigma^2 )

so instead of materializing weight draws (S*K*N noise volume — the
quantified physical wall of the weight-space tiers, PERF.md) the estimator
samples the *activations* directly: per layer, two shared-weight matmuls
REGARDLESS of S (one for the mean, one for the variance — both MXU-batched
over the S-major super-batch) plus an (S, tokens, N) standard normal. The
weight-space eps volume S*K*N shrinks to S*M*N (K/M-fold smaller whenever
the contraction dim exceeds the token count), no sampled-weight residual is
ever written for the backward pass, and the bias draw folds into the same
variance term for free.

Variance semantics: the per-activation marginal is *exact* (eq. 6 of the
paper), and each token draws independent activation noise, so the
cross-example covariance that makes shared-weight-draw gradients noisy is
zero by construction — the paper's Var_LRT <= Var_BBB result. Like flipout
(nn/flipout.py, same approximation class), cross-token correlations of one
weight draw within a forward are not represented: this estimator targets
*training*; use the weight-space tiers (fused/antithetic/naive) when a
coherent posterior weight draw matters (e.g. `generation.mc_generate`).
Tied modules (invoked twice per forward) share their per-layer noise key,
mirroring the weight-space tiers' shared tied draw, and contribute KL once.

The ELBO's KL term is computed ANALYTICALLY (there is no sampled weight to
score): closed form for Gaussian/MOPED priors, ``kl_draws``-draw MC
cross-entropy for the scale mixture — shared with flipout
(nn/flipout.py::analytic_leaf_kl).

Implemented, like the other interception tiers, as a
`flax.linen.intercept_methods` pass over any linen model (nn/fused.py
conventions: S-major tiling, converted paths from the surgery spec).
Covers nn.Dense, GPT-2's FlaxConv1D ((out, in)-stored kernels via the same
transposed handling as nn/fused.py::handle_dense), and converted nn.Embed
tables (per-occurrence activation noise — a lookup IS its pre-activation).
The variance matmul accumulates in float32 (`preferred_element_type`) so
bf16 activation runs keep a stable sigma^2 sum over large K.

Reference anchor: the reference has no low-variance estimator at all — it
runs S sequential weight-sampled forwards (`examples/bert_glue.py:63`);
this tier is pure extension, same category as flipout.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from bayeformers_tpu.core import distributions as dist
from bayeformers_tpu.nn.flipout import KL_DRAWS, analytic_leaf_kl
from bayeformers_tpu.nn.fused import (
    SEP,
    check_converted_paths_seen,
    lower_conv,
    tile_samples,
    untile_samples,
)


def lrt_mc_apply(
    apply_fn,
    spec,
    bparams,
    key: jax.Array,
    n_samples: int,
    *args,
    kl_draws: int = KL_DRAWS,
    untile_axes: tuple[int, ...] = (),
    **kwargs,
):
    """S local-reparameterization forwards as one super-batched pass.

    Returns ``(outputs (S, B, ...), aux)`` with aux:
    - ``kl``: scalar analytic KL(q||prior) summed over converted leaves;
    - ``log_prior`` / ``log_variational_posterior``: ``(-kl, 0)`` shaped (S,)
      so existing ELBO plumbing (`elbo.elbo_loss`) works unchanged.
    """
    S = n_samples
    paths = spec.paths
    path_index = {p: i for i, p in enumerate(paths)}
    mixture = (spec.prior.pi, spec.prior.sigma1, spec.prior.sigma2)
    kl_terms: list[jax.Array] = []
    seen: set[str] = set()

    def layer_key(i: int) -> jax.Array:
        return jax.random.fold_in(key, i)

    def leaf_kl(path: str, mu, sigma, k, transposed: bool = False):
        return analytic_leaf_kl(
            spec, bparams, mixture, kl_draws, path, mu, sigma, k, transposed
        )

    def handle_dense(mod, x, transposed: bool = False):
        """``transposed=True``: GPT-2's FlaxConv1D stores (out, in) — same
        orientation handling as the fused tier (nn/fused.py)."""
        kpath = SEP.join(mod.path + ("kernel",))
        mu = mod.variables["params"]["kernel"]
        rho = bparams.rho[kpath]
        if transposed:
            mu, rho = mu.T, rho.T
        sigma = dist.sigma_from_rho(rho)
        k = layer_key(path_index[kpath])
        lead, K = x.shape[:-1], x.shape[-1]
        N = mu.shape[1]
        xs = x.reshape(S, -1, K)
        M = xs.shape[1]

        m = xs @ mu.astype(xs.dtype)
        # variance matmul: bf16 operands ride the MXU, f32 accumulation
        v = jnp.einsum(
            "smk,kn->smn", xs * xs, (sigma * sigma).astype(xs.dtype),
            preferred_element_type=jnp.float32,
        )
        if kpath not in seen:
            seen.add(kpath)
            kl_terms.append(leaf_kl(kpath, mu, sigma, k, transposed))

        if mod.use_bias:
            bpath = SEP.join(mod.path + ("bias",))
            bmu = mod.variables["params"]["bias"]
            brho = bparams.rho[bpath]
            bsig = dist.sigma_from_rho(brho)
            m = m + bmu.astype(m.dtype)
            # the bias draw is Gaussian and independent: exact fold into v
            v = v + (bsig * bsig).astype(v.dtype)
            if bpath not in seen:
                seen.add(bpath)
                kl_terms.append(
                    leaf_kl(bpath, bmu, bsig, jax.random.fold_in(k, 6))
                )
        eps = jax.random.normal(jax.random.fold_in(k, 7), (S, M, N), jnp.float32)
        y = m + (jnp.sqrt(jnp.maximum(v, 0.0)) * eps).astype(m.dtype)
        return y.reshape(lead + (N,))

    def handle_conv(mod, x):
        """Bayesian ``nn.Conv`` (CONV_RULE extension) via the shared im2col
        lowering (nn/fused.py::lower_conv): the pre-activation of a conv
        output position is a weighted sum over its patch, so its exact
        Gaussian marginal is mean = patches@mu, var = patches^2 @ sigma^2 —
        the same two-matmul local reparameterization as a dense layer. KL is
        scored on the original (*k, cin, cout) leaves (layout-invariant)."""
        kpath, mu4, reorder, patches, out_spatial = lower_conv(mod, x)
        rho4 = bparams.rho[kpath]
        mu, rho = reorder(mu4), reorder(rho4)
        sigma = dist.sigma_from_rho(rho)
        k = layer_key(path_index[kpath])
        N = mu.shape[1]
        xs = patches.reshape(S, -1, patches.shape[-1])
        M = xs.shape[1]
        m = xs @ mu.astype(xs.dtype)
        v = jnp.einsum(
            "smk,kn->smn", xs * xs, (sigma * sigma).astype(xs.dtype),
            preferred_element_type=jnp.float32,
        )
        if kpath not in seen:
            seen.add(kpath)
            kl_terms.append(
                leaf_kl(kpath, mu4, dist.sigma_from_rho(rho4), k)
            )
        if mod.use_bias:
            bpath = SEP.join(mod.path + ("bias",))
            bmu = mod.variables["params"]["bias"]
            brho = bparams.rho[bpath]
            bsig = dist.sigma_from_rho(brho)
            m = m + bmu.astype(m.dtype)
            v = v + (bsig * bsig).astype(v.dtype)
            if bpath not in seen:
                seen.add(bpath)
                kl_terms.append(
                    leaf_kl(bpath, bmu, bsig, jax.random.fold_in(k, 6))
                )
        eps = jax.random.normal(jax.random.fold_in(k, 7), (S, M, N), jnp.float32)
        y = m + (jnp.sqrt(jnp.maximum(v, 0.0)) * eps).astype(m.dtype)
        return y.reshape((x.shape[0],) + out_spatial + (N,))

    def handle_embed(mod, ids):
        """A lookup is its own pre-activation: row r of the table contributes
        ``mu[r] + sigma[r] * eps`` with fresh eps per occurrence — the exact
        per-position marginal, noise volume (S, tokens, D) instead of the
        full (S, V, D) table draw of the fused tier."""
        epath = SEP.join(mod.path + ("embedding",))
        mu = mod.variables["params"]["embedding"]
        rho = bparams.rho[epath]
        sigma = dist.sigma_from_rho(rho)
        k = layer_key(path_index[epath])
        lead = ids.shape
        ids_s = ids.reshape(S, -1)
        m = jnp.take(mu, ids_s, axis=0)
        sg = jnp.take(sigma, ids_s, axis=0)
        eps = jax.random.normal(jax.random.fold_in(k, 7), m.shape, jnp.float32)
        out = (m + sg * eps.astype(sg.dtype)).astype(
            getattr(mod, "dtype", None) or m.dtype
        )
        if epath not in seen:
            seen.add(epath)
            kl_terms.append(leaf_kl(epath, mu, sigma, k))
        return out.reshape(lead + (mu.shape[-1],))

    def interceptor(next_fun, f_args, f_kwargs, context):
        mod = context.module
        if context.method_name == "__call__":
            if isinstance(mod, nn.Dense) and SEP.join(
                mod.path + ("kernel",)
            ) in bparams.rho:
                return handle_dense(mod, f_args[0])
            if type(mod).__name__ == "FlaxConv1D" and SEP.join(
                mod.path + ("kernel",)
            ) in bparams.rho:
                return handle_dense(mod, f_args[0], transposed=True)
            if isinstance(mod, nn.Conv) and SEP.join(
                mod.path + ("kernel",)
            ) in bparams.rho:
                return handle_conv(mod, f_args[0])
            if isinstance(mod, nn.Embed) and SEP.join(
                mod.path + ("embedding",)
            ) in bparams.rho:
                return handle_embed(mod, f_args[0])
        return next_fun(*f_args, **f_kwargs)

    tiled_args = tile_samples(args, S)
    tiled_kwargs = tile_samples(kwargs, S)
    with nn.intercept_methods(interceptor):
        out = apply_fn(bparams.params, *tiled_args, **tiled_kwargs)
    if not kl_terms:
        raise ValueError("lrt_mc_apply intercepted no converted layers")
    check_converted_paths_seen(paths, seen, "lrt")
    kl = sum(kl_terms)
    aux = {
        "kl": kl,
        "log_prior": jnp.broadcast_to(-kl, (S,)),
        "log_variational_posterior": jnp.zeros((S,), jnp.float32),
    }
    return untile_samples(out, S, untile_axes), aux
