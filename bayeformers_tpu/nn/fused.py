"""Fused Monte-Carlo forward for arbitrary Flax models.

Tier-A (`BayesianModel.mc_apply`) vmaps S stochastic forwards, materializing
every sampled weight in HBM per sample — a faithful but bandwidth-bound
mapping of the reference's sequential S-loop (`examples/bert_glue.py:63`).

This module implements the TPU-first alternative: run the model ONCE over an
``S*B`` super-batch and intercept every converted ``nn.Dense`` call
(`flax.linen.intercept_methods`), routing it through the Pallas fused
sampled-matmul with an explicit per-sample weight axis. Non-converted ops
(LayerNorm, softmax, embeddings, residuals) are per-example and simply see a
bigger batch; the MXU sees S-fold larger matmuls; sampled weights never
round-trip HBM. Per-layer ``log_q``/``log_prior`` come from the fused
KL-reduction kernels and are summed model-wide, matching the reference
``Model.log_prior()`` aggregation semantics (`bayeformers/nn/model.py:70-89`).

Sample-axis convention: batch-like leading axes are tiled S-major
(``x_tiled[s*B + b] == x[b]``), so inside the interceptor a ``(S*B, ..., K)``
activation reshapes losslessly to ``(S, B*..., K)`` for the kernel.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from bayeformers_tpu.core import distributions as dist
from bayeformers_tpu.core import prior as prior_lib
from bayeformers_tpu.ops import attention as ops_attention
from bayeformers_tpu.ops import common as ops_common
from bayeformers_tpu.ops import fused_linear as ops_fused
from bayeformers_tpu.ops import logprob as ops_logprob
from bayeformers_tpu.ops import sampled_linear as ops_linear

SEP = "/"


def tile_samples(tree: Any, n_samples: int) -> Any:
    """Tile every array leaf S-major along a new flattened leading axis."""
    def tile(a):
        if not hasattr(a, "shape") or a.ndim == 0:
            return a
        return jnp.broadcast_to(a[None], (n_samples,) + a.shape).reshape(
            (n_samples * a.shape[0],) + a.shape[1:]
        )
    return jax.tree.map(tile, tree)


def untile_samples(
    tree: Any, n_samples: int, extra_axes: tuple[int, ...] = ()
) -> Any:
    """Inverse of :func:`tile_samples`: ``(S*B, ...) -> (S, B, ...)``.

    ``extra_axes`` (axis indices in the model's natural, untiled output
    coordinates, each > 0) marks additional output axes that are S-tiled
    because the model couples two tiled batches into one output — e.g.
    CLIP's ``logits_per_image (B_img, B_txt)`` computed on tiled batches as
    ``(S*B_img, S*B_txt)``: pass ``(1,)``. Only same-sample pairings are
    meaningful, so for each such axis the per-sample diagonal block is
    extracted: axis k of size S*Bk becomes size Bk, keeping entries whose
    sample index matches the leading sample axis.
    """
    def untile(a):
        if not hasattr(a, "shape") or a.ndim == 0:
            return a
        a = a.reshape((n_samples, a.shape[0] // n_samples) + a.shape[1:])
        # natural-output axis k sits at k+1 once the sample axis is prepended
        for ax in sorted(ax + 1 for ax in extra_axes):
            bk = a.shape[ax] // n_samples
            # (S, ..., S, Bk, ...): pick the matching-sample diagonal block
            a = a.reshape(a.shape[:ax] + (n_samples, bk) + a.shape[ax + 1:])
            a = jnp.take_along_axis(
                a,
                jnp.arange(n_samples).reshape(
                    (n_samples,) + (1,) * (a.ndim - 1)
                ),
                axis=ax,
            )
            a = jnp.squeeze(a, axis=ax)
        return a
    return jax.tree.map(untile, tree)


def check_converted_paths_seen(paths, seen: set, tier: str) -> None:
    """Raise if any converted leaf never routed through this tier's handlers.

    The interceptors dispatch on concrete module types (``nn.Dense``,
    ``nn.Conv``, ``nn.Embed``, HF attention classes); a converted leaf owned
    by anything else — ``nn.ConvTranspose``/``nn.ConvLocal`` matched by the
    shape-only CONV_RULE, a ``DenseGeneral``, or a module the apply function
    simply never calls — would otherwise run the stock forward at ``mu``
    with no sampling and no KL: dead rho gradients and a silently biased
    ELBO. That exact silent failure must raise instead (the contract
    ``lower_conv`` documents). A converted ``bias`` counts as seen when its
    own path or its sibling ``kernel`` was handled (the dense/conv handlers
    fold the bias into the kernel interception).
    """
    missed = []
    for p in paths:
        head, _, leaf = p.rpartition(SEP)
        if leaf == "bias":
            sibling = (head + SEP + "kernel") if head else "kernel"
            if p not in seen and sibling not in seen:
                missed.append(p)
        elif p not in seen:
            missed.append(p)
    if missed:
        raise NotImplementedError(
            f"{tier} tier: converted parameter(s) {missed} were never "
            "intercepted during the forward pass — the owning module is "
            "not a supported type (nn.Dense / nn.Conv / nn.Embed / "
            "HF attention) or is never called by this apply function. "
            "Running it frequentist at mu would silently bias the ELBO; "
            "exclude the leaf from the conversion rules instead."
        )


def lower_conv(mod, x: jax.Array) -> tuple:
    """im2col lowering of a converted ``nn.Conv`` (CONV_RULE extension).

    Returns ``(kpath, mu, reorder, patches, out_spatial)``: the conv becomes
    ``patches @ reorder(kernel)`` where ``patches`` (from
    ``lax.conv_general_dilated_patches``) carries a trailing channel-major
    feature dim of size ``cin * prod(kernel_size)`` and ``reorder`` maps any
    ``(*kernel_size, cin, cout)`` leaf (mu, rho, prior_mu) into the matching
    ``(K, cout)`` layout. This is the TPU-first mapping: XLA rewrites the
    patch extraction into layout moves and the FLOPs land in one large MXU
    contraction that the fused sampled-matmul kernels already own.

    Unsupported configurations raise instead of falling back: the leaf is
    *converted*, so running the stock module would silently use ``mu`` with
    no KL contribution.
    """
    kpath = SEP.join(mod.path + ("kernel",))
    mu = mod.variables["params"]["kernel"]
    nd = mu.ndim - 2
    ksize = tuple(mu.shape[:nd])
    cout = mu.shape[-1]
    if getattr(mod, "feature_group_count", 1) != 1:
        raise NotImplementedError(
            f"converted conv {kpath}: feature_group_count>1 has no Bayesian "
            "lowering here; exclude the layer from the conversion rules"
        )
    if getattr(mod, "mask", None) is not None:
        raise NotImplementedError(
            f"converted conv {kpath}: kernel masks are not applied by the "
            "Bayesian im2col lowering; exclude the layer from the "
            "conversion rules"
        )
    if x.ndim != nd + 2:
        raise NotImplementedError(
            f"converted conv {kpath}: expected batched (N, *spatial, C) "
            f"input, got ndim={x.ndim}"
        )

    def tup(v):
        if v is None:
            return (1,) * nd
        if isinstance(v, int):
            return (v,) * nd
        return tuple(v)

    padding = mod.padding
    if isinstance(padding, str):
        padding = padding.upper()
        if padding not in ("SAME", "VALID", "SAME_LOWER"):
            raise NotImplementedError(
                f"converted conv {kpath}: padding={mod.padding!r} is not "
                "supported by the Bayesian lowering"
            )
    elif isinstance(padding, int):
        padding = ((padding, padding),) * nd
    else:
        padding = tuple(
            (p, p) if isinstance(p, int) else tuple(p) for p in padding
        )
    spatial = "DHW"[3 - nd:]
    dn = ("N" + spatial + "C", spatial + "IO", "N" + spatial + "C")
    patches = jax.lax.conv_general_dilated_patches(
        x, ksize, tup(mod.strides), padding,
        lhs_dilation=tup(mod.input_dilation),
        rhs_dilation=tup(mod.kernel_dilation),
        dimension_numbers=dn,
    )
    K = patches.shape[-1]

    def reorder(a):
        # patch features are channel-major (cin, *kernel_size)
        return jnp.moveaxis(a, -2, 0).reshape(K, cout)

    return kpath, mu, reorder, patches, tuple(patches.shape[1:-1])


def _unit_bias_eps(bkey: jax.Array, n_draws: int, n: int, n0) -> jax.Array:
    """(n_draws, n) standard normals in absolute 128-wide units.

    Mirrors the 2-D unit streams (ops/common.py, sampled_linear.naive_eps):
    eps for bias element j is a pure function of (bkey, (n0 + j) // 128,
    j % 128), so a column-sharded bias whose global offset ``n0`` (a
    multiple of 128) is passed draws exactly its slice of the unsharded
    bias noise — same invariant as the kernels, at bias (1-D) scale.
    """
    nu = -(-n // 128)
    ids = jnp.arange(nu, dtype=jnp.int32) + (
        jnp.int32(0) if n0 is None else jnp.asarray(n0, jnp.int32) // 128
    )

    def unit(u):
        return jax.random.normal(jax.random.fold_in(bkey, u), (n_draws, 128))

    units = jax.vmap(unit, out_axes=1)(ids)  # (n_draws, nu, 128)
    return units.reshape(n_draws, nu * 128)[:, :n]


def _bias_logprobs(b, bmu, bsig, beps, prior_mu, mixture):
    """(S,) log_q and log_p for a sampled bias (small; plain jnp)."""
    lq = jnp.sum(
        -dist.LOG_SQRT_2PI - jnp.log(bsig)[None] - 0.5 * beps * beps, axis=-1
    )
    if prior_mu is not None:
        z = (b - prior_mu[None]) / prior_lib.MOPED_PRIOR_SIGMA
        lp = jnp.sum(
            -dist.LOG_SQRT_2PI - jnp.log(prior_lib.MOPED_PRIOR_SIGMA) - 0.5 * z * z,
            axis=-1,
        )
    else:
        lp = jax.vmap(
            lambda bi: dist.scale_mixture_log_prob(bi, *mixture)
        )(b)
    return lq, lp


def fused_mc_apply(
    apply_fn,
    spec,
    bparams,
    key: jax.Array,
    n_samples: int,
    *args,
    convert_embeddings: bool = False,
    save_weights: bool = True,
    antithetic: bool = False,
    fuse_attention: bool | None = None,
    tp=None,
    untile_axes: tuple[int, ...] = (),
    **kwargs,
):
    """S-sample fused forward. Returns ``(outputs, aux)`` like
    ``BayesianModel.mc_apply``: outputs have a leading (S, B, ...) axis and
    aux carries (S,)-shaped ``log_prior`` / ``log_variational_posterior``.

    ``untile_axes``: extra S-tiled output axes for dual-batch models (see
    :func:`untile_samples`); e.g. ``(1,)`` for CLIP similarity logits.

    ``antithetic=True`` (extension): samples (2t, 2t+1) share one weight
    draw with opposite signs (w = mu ± sigma*eps) — classic antithetic
    variates; unbiased, lower-variance, and the paired Pallas kernel
    generates half the Gaussian noise. Requires even ``n_samples``.

    ``tp`` (a ``parallel.collectives.TPContext``): Megatron tensor
    parallelism for the fused tier, to be used INSIDE a ``shard_map`` whose
    arrays were sharded per the same rules (parallel/mesh.py). Per leaf kind:

    - ``col``: mu/rho hold the local out-feature shard; the input activation
      gets the Megatron "f" (identity fwd / psum bwd) and the local matmul
      produces the sharded output. Sharded bias follows.
    - ``row``: mu/rho hold the local in-feature shard; the local partial
      output gets the "g" (psum fwd / identity bwd), then the replicated
      bias is added once.
    - ``rep``: exactly the single-device path.

    KL bookkeeping: sharded leaves contribute local partial sums which are
    psummed over the tp axis once at the end; replicated leaves contribute
    their (device-invariant) full sums directly. When a shard's global
    element offset lands on the backend's eps-unit grid the shard draws the
    exact slice of the unsharded noise stream (bit-parity with the
    single-device step); otherwise the layer's sample keys are decorrelated
    per shard (still valid iid draws — required so the two halves of one
    logical weight never share noise).
    """
    import os

    if fuse_attention is None:
        fuse_attention = os.environ.get("BAYEFORMERS_FUSE_ATTENTION", "1") != "0"
    if tp is not None and tp.size <= 1:
        tp = None
    if tp is not None and not fuse_attention:
        raise ValueError(
            "tensor parallelism in the fused tier requires the fused "
            "attention interception (fuse_attention=True): the stock "
            "attention module would reshape a tp-sharded width with the "
            "full head count"
        )
    if tp is not None:
        from bayeformers_tpu.parallel import collectives as coll
    S = n_samples
    if antithetic and S % 2:
        raise ValueError(f"antithetic needs an even n_samples; got {S}")
    n_draws = S // 2 if antithetic else S
    paths = spec.paths
    path_index = {p: i for i, p in enumerate(paths)}
    mixture = (spec.prior.pi, spec.prior.sigma1, spec.prior.sigma2)
    # (log_q, log_p, is_tp_sharded) per converted leaf
    collected: list[tuple[jax.Array, jax.Array, bool]] = []
    # Weight-sharing guard: a module invoked multiple times per forward
    # (tied layers) samples the same weights each call (same seeds) but must
    # contribute its KL terms exactly once, as the reference's per-module
    # aggregation does (`bayeformers/nn/model.py:70-89`).
    seen: set[str] = set()

    def layer_seeds(i: int, decorrelate: bool = False) -> jax.Array:
        lkey = jax.random.fold_in(key, i)
        if decorrelate:
            lkey = jax.random.fold_in(lkey, jax.lax.axis_index(tp.axis))
        keys = jax.random.split(lkey, n_draws)
        return ops_common.seed_from_key(keys)

    def _tp_kernel_plan(kpath: str, local_shape) -> tuple[str, Any, bool]:
        """(kind, unit_offsets, decorrelate) for a converted kernel leaf.

        Offsets are usable only when every shard boundary lands on the
        backend's eps-unit grid (local dim divisible by the unit size);
        otherwise per-shard key decorrelation keeps the two halves of one
        logical weight from sharing noise.
        """
        if tp is None:
            return "rep", None, False
        kind = tp.kind_fn(kpath)
        if kind == "rep":
            return kind, None, False
        k_l, n_l = local_shape
        if ops_linear.use_pallas():
            uk, un = ops_common.UNIT_K, ops_common.UNIT_N
        else:
            uk = un = ops_linear.NAIVE_UNIT
        idx = jax.lax.axis_index(tp.axis)
        if kind == "col":
            if n_l % un == 0:
                return kind, jnp.stack(
                    [jnp.int32(0), (idx * n_l).astype(jnp.int32)]
                ), False
        else:  # row
            if k_l % uk == 0:
                return kind, jnp.stack(
                    [(idx * k_l).astype(jnp.int32), jnp.int32(0)]
                ), False
        return kind, None, True

    def interleave(a_half: jax.Array) -> jax.Array:
        """(S/2, ...) draws -> (S, ...) antithetic ± pairs along axis 0."""
        pair = jnp.stack([a_half, -a_half], axis=1)
        return pair.reshape((-1,) + a_half.shape[1:])

    def _route_matmul(kpath, mu, rho, prior_mu_t, xs):
        """Shared sampled-matmul core of handle_dense / handle_conv: tp
        plan, per-layer seeds, the fused Pallas matmul+KL op, Megatron
        collectives, and the collected-KL bookkeeping. ``xs`` is (S, M, K);
        ``mu``/``rho`` are (K, N) in the orientation that DEFINES the eps
        stream; ``prior_mu_t`` is the same-orientation MOPED prior center
        (needed only when mu is trainable). Returns (y, new_leaf, kind)."""
        kind, offsets, decor = _tp_kernel_plan(kpath, mu.shape)
        seeds = layer_seeds(path_index[kpath], decorrelate=decor)
        if kind == "col":
            # Megatron f: replicated activation consumed by sharded branches
            xs = coll.copy_to_shards(xs, tp.axis)
        if spec.moped and spec.frozen:
            # mu is frozen at the pretrained weights == the prior center, so
            # the kernel can skip streaming a separate prior_mu array
            y, lq, lp = ops_fused.bayes_linear(
                xs, mu, rho, seeds, prior_on_mu=True,
                save_weights=save_weights, antithetic=antithetic,
                unit_offsets=offsets,
            )
        elif spec.moped:
            y, lq, lp = ops_fused.bayes_linear(
                xs, mu, rho, seeds, prior_mu=prior_mu_t,
                save_weights=save_weights, antithetic=antithetic,
                unit_offsets=offsets,
            )
        else:
            y, lq, lp = ops_fused.bayes_linear(
                xs, mu, rho, seeds, mixture=mixture,
                save_weights=save_weights, antithetic=antithetic,
                unit_offsets=offsets,
            )
        if kind == "row":
            # Megatron g: all-reduce the partial (full-width) outputs
            y = coll.reduce_from_shards(y, tp.axis)
        new_leaf = kpath not in seen
        if new_leaf:
            seen.add(kpath)
            collected.append((lq, lp, kind != "rep"))
        return y, new_leaf, kind

    def handle_dense(mod, x, transposed: bool = False):
        """``transposed=True``: the module stores its kernel as (out, in) —
        GPT-2's FlaxConv1D (`modeling_flax_gpt2.FlaxConv1D` computes
        ``x @ kernel.T``). The fused op wants (in, out), so mu/rho (and
        prior_mu) are transposed here — one XLA transpose per leaf per step
        (two extra streams over the layer's params); the sampled math and
        KL sums are orientation-invariant, though the eps stream is defined
        in the transposed orientation (so fused-tier draws differ from the
        naive tier's (out, in)-oriented stream for these layers)."""
        kpath = SEP.join(mod.path + ("kernel",))
        mu = mod.variables["params"]["kernel"]
        rho = bparams.rho[kpath]
        if transposed:
            mu, rho = mu.T, rho.T
        prior_mu_t = None
        if spec.moped and not spec.frozen:
            pm = bparams.prior_mu[kpath]
            prior_mu_t = pm.T if transposed else pm
        lead, K = x.shape[:-1], x.shape[-1]
        xs = x.reshape(S, -1, K)
        y, new_leaf, kind = _route_matmul(kpath, mu, rho, prior_mu_t, xs)
        if mod.use_bias:
            y = _add_bias(y, mod, kind, new_leaf)
        return y.reshape(lead + (y.shape[-1],))

    def handle_conv(mod, x):
        """Bayesian ``nn.Conv`` (CONV_RULE extension; the reference converts
        Linear only, `bayeformers/nn/__init__.py:25`). TPU-first lowering:
        im2col patches followed by the SAME fused sampled matmul as
        handle_dense — the MXU sees one (S, B*P, K)x(K, cout) contraction
        and the sampled kernel never materializes in HBM. The eps stream is
        defined in the channel-major (K, cout) orientation (fused-tier draws
        differ from the naive tier's (*k, cin, cout)-oriented stream — same
        documented divergence as GPT-2's transposed Conv1D)."""
        kpath, mu4, reorder, patches, out_spatial = lower_conv(mod, x)
        mu, rho = reorder(mu4), reorder(bparams.rho[kpath])
        prior_mu_t = None
        if spec.moped and not spec.frozen:
            prior_mu_t = reorder(bparams.prior_mu[kpath])
        xs = patches.reshape(S, -1, patches.shape[-1])
        y, new_leaf, kind = _route_matmul(kpath, mu, rho, prior_mu_t, xs)
        if mod.use_bias:
            y = _add_bias(y, mod, kind, new_leaf)
        return y.reshape((x.shape[0],) + out_spatial + (y.shape[-1],))

    def _add_bias(y, mod, kind, new_leaf):
        """Sampled-bias add shared by handle_dense / handle_conv; ``y`` is
        the (S, M, N) kernel output, ``kind`` the kernel's tp plan (a
        column-sharded kernel implies a sharded bias)."""
        bpath = SEP.join(mod.path + ("bias",))
        bmu = mod.variables["params"]["bias"]
        brho = bparams.rho[bpath]
        bkind = "col" if kind == "col" else "rep"
        bkey = jax.random.fold_in(key, path_index[bpath])
        if bkind == "col":
            if bmu.shape[0] % 128 == 0:
                b0 = jax.lax.axis_index(tp.axis) * bmu.shape[0]
            else:
                bkey = jax.random.fold_in(
                    bkey, jax.lax.axis_index(tp.axis)
                )
                b0 = None
        else:
            b0 = None
        beps = _unit_bias_eps(bkey, n_draws, bmu.shape[0], b0).astype(
            bmu.dtype
        )
        if antithetic:
            beps = interleave(beps)
        bsig = dist.sigma_from_rho(brho)
        b = bmu[None] + bsig[None] * beps
        y = y + b[:, None, :].astype(y.dtype)  # keep bf16 activations bf16
        lq_b, lp_b = _bias_logprobs(
            b, bmu, bsig, beps,
            bparams.prior_mu.get(bpath) if spec.moped else None, mixture,
        )
        if new_leaf:
            collected.append((lq_b, lp_b, bkind != "rep"))
        return y

    def handle_embed(mod, ids):
        epath = SEP.join(mod.path + ("embedding",))
        mu = mod.variables["params"]["embedding"]
        rho = bparams.rho[epath]
        seeds = layer_seeds(path_index[epath])
        # sampled_weights (not the raw regen kernel): the tables flow into
        # the loss, so the op must carry a reparametrization VJP on TPU
        tables = ops_fused.sampled_weights(mu, rho, seeds)  # (S|S/2, V, D)
        if antithetic:
            # pair member 2t+1 mirrors 2t: tables = mu ± sigma*eps
            tables = ops_fused.interleave_antithetic(tables, mu)
        lead = ids.shape
        ids_s = ids.reshape(S, -1)
        out = jax.vmap(lambda t, i: jnp.take(t, i, axis=0))(tables, ids_s)
        out = out.astype(getattr(mod, "dtype", None) or out.dtype)
        # Log-probs are evaluated directly AT the materialized tables, so
        # they provably share the forward pass's weight draw. (Calling the
        # split logprob kernel here would evaluate them at a DIFFERENT
        # deterministic eps stream than sampled_weights' full-K stream on
        # TPU — the same-draw invariant of ops/common.py would break
        # silently; CPU tests never catch it because both ops share the
        # naive jax.random stream there.)
        sigma = dist.sigma_from_rho(rho)
        lq = jax.vmap(lambda t: dist.gaussian_log_prob(t, mu, sigma))(tables)
        if spec.moped:
            pmu = bparams.prior_mu[epath]
            psig = jnp.full_like(pmu, prior_lib.MOPED_PRIOR_SIGMA)
            lp = jax.vmap(lambda t: dist.gaussian_log_prob(t, pmu, psig))(tables)
        else:
            lp = jax.vmap(
                lambda t: dist.scale_mixture_log_prob(t, *mixture)
            )(tables)
        if epath not in seen:
            seen.add(epath)
            collected.append((lq, lp, False))  # embeddings replicate under tp
        return out.reshape(lead + (mu.shape[-1],))

    def _local_heads(mod, qkv_names: tuple, n_heads: int) -> int:
        """Per-device head count for the mha op: column-sharded q/k/v carry
        n_heads/tp local heads (whole heads, since the Megatron col rules
        shard the out-feature axis uniformly)."""
        if tp is None:
            return n_heads
        kinds = {
            tp.kind_fn(SEP.join(getattr(mod, n).path + ("kernel",)))
            for n in qkv_names
        }
        if kinds == {"rep"}:
            return n_heads
        if kinds != {"col"}:
            raise ValueError(
                f"tp sharding of attention {mod.path} must column-shard all "
                f"of q/k/v or none; got kinds {kinds}"
            )
        if n_heads % tp.size:
            raise ValueError(
                f"n_heads={n_heads} must divide by tp={tp.size} "
                f"(attention {mod.path})"
            )
        return n_heads // tp.size

    def _tp_attention_error(mod, qkv_names: tuple):
        """Raise when an attention block with tp-sharded q/k/v fell through
        the fused interception: the stock module code would reshape the
        sharded width with the full head count — a silent-corruption shape
        error at best. (Only reachable when a NotImplemented feature — mask
        rank, caching, head masking, attention outputs — is requested.)"""
        if tp is None:
            return
        for n in qkv_names:
            sub = getattr(mod, n, None)
            if sub is None:
                continue
            if tp.kind_fn(SEP.join(sub.path + ("kernel",))) != "rep":
                raise ValueError(
                    f"attention {mod.path} is tp-sharded but the fused "
                    "attention interception declined this call (unsupported "
                    "feature: cache/cross-attention/head-mask/attention-"
                    "dropout/attn-outputs or non-2D mask). Run this "
                    "configuration with tp=1 or the GSPMD tier."
                )

    def handle_self_attention(mod, f_args, f_kwargs):
        """Run a whole HF self-attention block through the layout-preserving
        mha op (ops/attention.py): q/k/v come from the SAME handle_dense
        path (identical eps streams and KL bookkeeping as the per-Dense
        interception), and the head-split transposes that XLA would insert
        around the Pallas custom calls (~14 ms/step measured, PERF.md) never
        materialize. Returns NotImplemented to fall back for any feature the
        op does not cover (caching, cross-attention, head masking,
        attention dropout, attention-weight outputs)."""
        if getattr(mod, "causal", False):
            return NotImplemented
        hidden = f_args[0]
        attention_mask = (
            f_args[1] if len(f_args) > 1 else f_kwargs.get("attention_mask")
        )
        layer_head_mask = (
            f_args[2] if len(f_args) > 2 else f_kwargs.get("layer_head_mask")
        )
        if layer_head_mask is not None:
            return NotImplemented
        if f_kwargs.get("key_value_states") is not None:
            return NotImplemented
        if f_kwargs.get("init_cache", False):
            return NotImplemented
        if f_kwargs.get("output_attentions", False):
            return NotImplemented
        p_drop = getattr(
            getattr(mod, "config", None), "attention_probs_dropout_prob", 0.0
        )
        if not f_kwargs.get("deterministic", True) and p_drop > 0:
            return NotImplemented
        for name in ("query", "key", "value"):
            if SEP.join(mod.path + (name, "kernel")) not in bparams.rho:
                return NotImplemented
        n_heads = mod.config.num_attention_heads
        H = hidden.shape[-1]
        if hidden.ndim != 3 or H % n_heads or (H // n_heads) % 8:
            return NotImplemented
        n_heads_local = _local_heads(mod, ("query", "key", "value"), n_heads)
        # All fallback decisions happen BEFORE any handle_dense call: a
        # NotImplemented return after interception would leave abandoned
        # (lq, lp) entries in `collected` for XLA DCE to clean up.
        if attention_mask is None:
            bias = jnp.zeros(hidden.shape[:2], jnp.float32)
        elif attention_mask.ndim != 2:
            return NotImplemented
        else:
            bias = ops_attention.mask_to_bias(attention_mask)
        q = handle_dense(mod.query, hidden)
        k = handle_dense(mod.key, hidden)
        v = handle_dense(mod.value, hidden)
        return (ops_attention.mha(q, k, v, bias, n_heads_local),)

    attn_classes = (
        "FlaxBertSelfAttention",
        "FlaxRobertaSelfAttention",
        "FlaxElectraSelfAttention",  # HF 'Copied from' clone of BERT's
        # ViT (models/vit.py): same q/k/v Dense trio, mask-free (images have
        # no padding) — attention_mask arrives as None and the handler's
        # zero bias reproduces the stock unmasked softmax
        "FlaxViTSelfAttention",
    )

    def handle_albert_attention(mod, f_args, f_kwargs):
        """ALBERT's FlaxAlbertSelfAttention holds q/k/v AND the output
        projection (`dense`), dropout, and LayerNorm in one module; the
        handler reproduces that whole block: q/k/v and the output dense ride
        handle_dense (identical eps/KL bookkeeping; row-parallel psum under
        tp), attention itself is the layout-preserving mha op, and the
        module's own dropout/LayerNorm submodules run unchanged."""
        hidden = f_args[0]
        attention_mask = (
            f_args[1] if len(f_args) > 1 else f_kwargs.get("attention_mask")
        )
        if f_kwargs.get("output_attentions", False):
            return NotImplemented
        deterministic = f_kwargs.get("deterministic", True)
        p_drop = getattr(
            getattr(mod, "config", None), "attention_probs_dropout_prob", 0.0
        )
        if not deterministic and p_drop > 0:
            return NotImplemented
        for name in ("query", "key", "value", "dense"):
            if SEP.join(mod.path + (name, "kernel")) not in bparams.rho:
                return NotImplemented
        n_heads = mod.config.num_attention_heads
        H = hidden.shape[-1]
        if hidden.ndim != 3 or H % n_heads or (H // n_heads) % 8:
            return NotImplemented
        if attention_mask is None:
            bias = jnp.zeros(hidden.shape[:2], jnp.float32)
        elif attention_mask.ndim != 2:
            return NotImplemented
        else:
            bias = ops_attention.mask_to_bias(attention_mask)
        n_heads_local = _local_heads(mod, ("query", "key", "value"), n_heads)
        q = handle_dense(mod.query, hidden)
        k = handle_dense(mod.key, hidden)
        v = handle_dense(mod.value, hidden)
        ctx = ops_attention.mha(q, k, v, bias, n_heads_local)
        proj = handle_dense(mod.dense, ctx)
        proj = mod.dropout(proj, deterministic=deterministic)
        return (mod.LayerNorm(proj + hidden),)

    def handle_distilbert_attention(mod, f_args, f_kwargs):
        """DistilBERT's FlaxMultiHeadSelfAttention: q/k/v/out projections
        live inside one module and the mask is applied as
        ``scores - 1e30 * (1 - mask)`` — reproduced as an additive bias to
        the same mha op. Self-attention only (the transformer block passes
        the same hidden array three times)."""
        if len(f_args) < 4:
            return NotImplemented
        query, key_, value, mask = f_args[:4]
        if key_ is not query or value is not query:
            return NotImplemented  # cross-attention: not DistilBERT's use
        if f_kwargs.get("output_attentions", False):
            return NotImplemented
        p_drop = getattr(getattr(mod, "config", None), "attention_dropout", 0.0)
        if not f_kwargs.get("deterministic", True) and p_drop > 0:
            return NotImplemented
        for name in ("q_lin", "k_lin", "v_lin", "out_lin"):
            if SEP.join(mod.path + (name, "kernel")) not in bparams.rho:
                return NotImplemented
        n_heads = mod.config.n_heads
        H = query.shape[-1]
        if query.ndim != 3 or mask.ndim != 2 or H % n_heads or (
            H // n_heads
        ) % 8:
            return NotImplemented
        n_heads_local = _local_heads(mod, ("q_lin", "k_lin", "v_lin"), n_heads)
        q = handle_dense(mod.q_lin, query)
        k = handle_dense(mod.k_lin, query)
        v = handle_dense(mod.v_lin, query)
        bias = -1e30 * (1.0 - mask.astype(jnp.float32))
        out = ops_attention.mha(q, k, v, bias, n_heads_local)
        return (handle_dense(mod.out_lin, out),)

    def handle_gpt2_attention(mod, f_args, f_kwargs):
        """GPT-2's FlaxGPT2Attention: ONE packed-QKV Conv1D (``c_attn``,
        kernel (3E, E)) + output Conv1D (``c_proj``) + causal masking, all
        inside one module. The handler reproduces the block: c_attn/c_proj
        ride ``handle_dense(transposed=True)`` (identical eps streams and KL
        bookkeeping as the per-Conv1D interception), the packed output is
        split into q/k/v locally (a free slice — no head transposes), and
        attention runs through the layout-preserving mha op with IN-KERNEL
        causal masking (the (L, L) mask never hits HBM, unlike the stock
        path's materialized broadcast of ``self.causal_mask``). The module's
        own resid_dropout runs unchanged. Cross-attention, KV-cache decode,
        and attention-weight outputs fall back to the stock path."""
        if getattr(mod, "is_cross_attention", False) or not getattr(
            mod, "causal", True
        ):
            return NotImplemented
        hidden = f_args[0]
        key_value_states = (
            f_args[1] if len(f_args) > 1 else f_kwargs.get("key_value_states")
        )
        if key_value_states is not None:
            return NotImplemented
        attention_mask = (
            f_args[2] if len(f_args) > 2 else f_kwargs.get("attention_mask")
        )
        if f_kwargs.get("init_cache", False) or mod.has_variable(
            "cache", "cached_key"
        ):
            return NotImplemented
        if f_kwargs.get("output_attentions", False):
            return NotImplemented
        deterministic = f_kwargs.get("deterministic", True)
        p_drop = getattr(getattr(mod, "config", None), "attn_pdrop", 0.0)
        if not deterministic and p_drop > 0:
            return NotImplemented
        for name in ("c_attn", "c_proj"):
            if SEP.join(mod.path + (name, "kernel")) not in bparams.rho:
                return NotImplemented
        n_heads = mod.num_heads
        H = hidden.shape[-1]
        if hidden.ndim != 3 or H % n_heads or (H // n_heads) % 8:
            return NotImplemented
        if tp is None:
            n_heads_local = n_heads
        else:
            kinds = (
                tp.kind_fn(SEP.join(mod.path + ("c_attn", "kernel"))),
                tp.kind_fn(SEP.join(mod.path + ("c_proj", "kernel"))),
            )
            if kinds == ("rep", "rep"):
                n_heads_local = n_heads
            elif kinds == ("col", "row"):
                # Megatron split of the PACKED c_attn: valid only on the
                # head-aligned permuted layout (parallel/mesh.py::
                # permute_gpt2_qkv), where the local 3E/tp block is
                # [Q_heads_r | K_heads_r | V_heads_r] and the 3-way split
                # below lands exactly on this shard's heads.
                if n_heads % tp.size:
                    raise ValueError(
                        f"n_heads={n_heads} must divide by tp={tp.size} "
                        f"(gpt2 attention {mod.path})"
                    )
                n_heads_local = n_heads // tp.size
            else:
                raise ValueError(
                    f"gpt2 attention {mod.path} needs c_attn col + c_proj "
                    f"row sharding (parallel/mesh.py::gpt2_tp_kind); got "
                    f"{kinds}"
                )
        if attention_mask is None:
            bias = jnp.zeros(hidden.shape[:2], jnp.float32)
        elif attention_mask.ndim != 2:
            return NotImplemented
        else:
            bias = ops_attention.mask_to_bias(attention_mask)
        qkv = handle_dense(mod.c_attn, hidden, transposed=True)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        ctx = ops_attention.mha(q, k, v, bias, n_heads_local, causal=True)
        out = handle_dense(mod.c_proj, ctx, transposed=True)
        out = mod.resid_dropout(out, deterministic=deterministic)
        return (out,)

    def handle_gqa_attention(mod, f_args, f_kwargs):
        """LLaMA-architecture attention (FlaxLlama/Mistral/GemmaAttention —
        models/llama.py): bias-free q/k/v/o Dense projections, rotary
        position embeddings, grouped-query attention, causal masking. The
        handler reproduces the stock block exactly: q/k/v/o ride
        handle_dense (same eps streams and KL bookkeeping as the per-Dense
        interception; Megatron col/row collectives under tp), rotary runs
        through the module's OWN ``rotary_emb`` submodule (numerics
        guaranteed identical to stock), k/v heads repeat to the full head
        count after rotary (`modeling_flax_llama.py` jnp.repeat), and
        attention runs through the layout-preserving mha op with IN-KERNEL
        causal masking. KV-cache decode, attention-weight outputs, and a
        Mistral sliding window narrower than the sequence fall back to the
        stock path."""
        hidden = f_args[0]
        attention_mask = (
            f_args[1] if len(f_args) > 1 else f_kwargs.get("attention_mask")
        )
        position_ids = (
            f_args[2] if len(f_args) > 2 else f_kwargs.get("position_ids")
        )
        if position_ids is None:
            return NotImplemented
        if f_kwargs.get("init_cache", False) or mod.has_variable(
            "cache", "cached_key"
        ):
            return NotImplemented
        if f_kwargs.get("output_attentions", False):
            return NotImplemented
        deterministic = f_kwargs.get("deterministic", True)
        p_drop = getattr(
            getattr(mod, "config", None), "attention_dropout", 0.0
        )
        if not deterministic and p_drop > 0:
            return NotImplemented
        for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
            if SEP.join(mod.path + (name, "kernel")) not in bparams.rho:
                return NotImplemented
        n_heads = mod.num_heads
        n_kv = mod.num_key_value_heads
        d = mod.head_dim
        if hidden.ndim != 3 or d % 8:
            return NotImplemented
        L = hidden.shape[1]
        window = getattr(mod.config, "sliding_window", None)
        if window and L > window:
            # the banded causal mask would bite: stock path handles it
            return NotImplemented
        if attention_mask is None:
            bias = jnp.zeros(hidden.shape[:2], jnp.float32)
        elif attention_mask.ndim != 2:
            return NotImplemented
        else:
            bias = ops_attention.mask_to_bias(attention_mask)
        if tp is None:
            n_heads_local, n_kv_local = n_heads, n_kv
        else:
            kinds = {
                tp.kind_fn(SEP.join(getattr(mod, n).path + ("kernel",)))
                for n in ("q_proj", "k_proj", "v_proj")
            }
            if kinds == {"rep"}:
                n_heads_local, n_kv_local = n_heads, n_kv
            elif kinds == {"col"}:
                if n_heads % tp.size or n_kv % tp.size:
                    raise ValueError(
                        f"num_heads={n_heads} and num_key_value_heads="
                        f"{n_kv} must both divide by tp={tp.size} "
                        f"(attention {mod.path})"
                    )
                n_heads_local = n_heads // tp.size
                n_kv_local = n_kv // tp.size
            else:
                raise ValueError(
                    f"tp sharding of attention {mod.path} must column-shard "
                    f"all of q/k/v or none; got kinds {kinds}"
                )
        q = handle_dense(mod.q_proj, hidden)  # (N, L, n_heads_local*d)
        k = handle_dense(mod.k_proj, hidden)  # (N, L, n_kv_local*d)
        v = handle_dense(mod.v_proj, hidden)
        N = q.shape[0]
        qh = q.reshape(N, L, n_heads_local, d)
        kh = k.reshape(N, L, n_kv_local, d)
        kh, qh = mod.rotary_emb(kh, qh, position_ids)
        groups = n_heads // n_kv  # GQA repetition factor (tp-invariant)
        vh = v.reshape(N, L, n_kv_local, d)
        if groups > 1:
            kh = jnp.repeat(kh, groups, axis=2)
            vh = jnp.repeat(vh, groups, axis=2)
        ctx = ops_attention.mha(
            qh.reshape(N, L, n_heads_local * d),
            kh.reshape(N, L, n_heads_local * d),
            vh.reshape(N, L, n_heads_local * d),
            bias, n_heads_local, causal=True,
        )
        return (handle_dense(mod.o_proj, ctx),)

    gqa_attn_classes = (
        "FlaxLlamaAttention",
        "FlaxMistralAttention",
        "FlaxGemmaAttention",
    )

    def interceptor(next_fun, f_args, f_kwargs, context):
        mod = context.module
        if context.method_name != "__call__":
            return next_fun(*f_args, **f_kwargs)
        if fuse_attention and type(mod).__name__ in attn_classes:
            out = handle_self_attention(mod, f_args, f_kwargs)
            if out is not NotImplemented:
                return out
            _tp_attention_error(mod, ("query", "key", "value"))
        if fuse_attention and type(mod).__name__ == "FlaxMultiHeadSelfAttention":
            out = handle_distilbert_attention(mod, f_args, f_kwargs)
            if out is not NotImplemented:
                return out
            _tp_attention_error(mod, ("q_lin", "k_lin", "v_lin"))
        if fuse_attention and type(mod).__name__ == "FlaxAlbertSelfAttention":
            out = handle_albert_attention(mod, f_args, f_kwargs)
            if out is not NotImplemented:
                return out
            _tp_attention_error(mod, ("query", "key", "value"))
        if fuse_attention and type(mod).__name__ == "FlaxGPT2Attention":
            out = handle_gpt2_attention(mod, f_args, f_kwargs)
            if out is not NotImplemented:
                return out
            _tp_attention_error(mod, ("c_attn",))
        if fuse_attention and type(mod).__name__ in gqa_attn_classes:
            out = handle_gqa_attention(mod, f_args, f_kwargs)
            if out is not NotImplemented:
                return out
            _tp_attention_error(mod, ("q_proj", "k_proj", "v_proj"))
        if isinstance(mod, nn.Dense):
            kpath = SEP.join(mod.path + ("kernel",))
            if kpath in bparams.rho:
                return handle_dense(mod, f_args[0])
        if type(mod).__name__ == "FlaxConv1D":
            # GPT-2's dense-equivalent (kernel stored (out, in)); converted
            # by the same dense rule — see handle_dense(transposed=True)
            kpath = SEP.join(mod.path + ("kernel",))
            if kpath in bparams.rho:
                return handle_dense(mod, f_args[0], transposed=True)
        if isinstance(mod, nn.Conv):
            # true convolutions (CONV_RULE, opt-in): im2col + fused matmul
            kpath = SEP.join(mod.path + ("kernel",))
            if kpath in bparams.rho:
                return handle_conv(mod, f_args[0])
        if convert_embeddings and isinstance(mod, nn.Embed):
            epath = SEP.join(mod.path + ("embedding",))
            if epath in bparams.rho:
                return handle_embed(mod, f_args[0])
        return next_fun(*f_args, **f_kwargs)

    tiled_args = tile_samples(args, S)
    tiled_kwargs = tile_samples(kwargs, S)
    with nn.intercept_methods(interceptor):
        out = apply_fn(bparams.params, *tiled_args, **tiled_kwargs)

    if not collected:
        raise ValueError(
            "fused_mc_apply intercepted no converted layers; the model's "
            "apply function must route through flax module __call__s"
        )
    check_converted_paths_seen(paths, seen, "fused")
    zero = jnp.zeros((S,), jnp.float32)
    log_q = sum((lq for lq, _, sh in collected if not sh), zero)
    log_p = sum((lp for _, lp, sh in collected if not sh), zero)
    if tp is not None:
        lq_sh = sum((lq for lq, _, sh in collected if sh), zero)
        lp_sh = sum((lp for _, lp, sh in collected if sh), zero)
        # one all-reduce reconstitutes the sharded leaves' full KL sums;
        # replicated leaves were already counted exactly once per device
        log_q = log_q + coll.reduce_from_shards(lq_sh, tp.axis)
        log_p = log_p + coll.reduce_from_shards(lp_sh, tp.axis)
    return untile_samples(out, S, untile_axes), {
        "log_prior": log_p,
        "log_variational_posterior": log_q,
    }
