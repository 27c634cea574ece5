"""Depth-stacked Bayesian transformer blocks: the pp/ep transformer tier.

The reference composes hand-built Bayesian layers into models
(`README.md:34-56`) and has no pipeline or expert parallelism (SURVEY.md
§2: PP/EP "absent"). :class:`TransformerStack` extends the hand-built tier
from dense blocks (``parallel/pipeline.py::BlockStack``) to full pre-LN
transformer blocks whose parameters are STACKED along a leading depth axis
— the layout that makes depth shardable:

- **pp**: the stack satisfies the ``pipeline_apply`` protocol
  (``block_apply`` + ``dummy_input``), so a causal-LM training step runs as
  a GPipe pipeline over the ``pp`` mesh axis via
  :func:`make_pp_lm_train_step` — depth-sharded weights, microbatched
  activations over ``lax.ppermute``, KL counted once per draw.
- **ep**: with ``moe=BayesMoE(...)`` every block's FFN is a top-1-routed
  Bayesian mixture of experts (expert leaves ``(L, E, ...)``);
  :func:`make_ep_lm_train_step` shards the expert axis over the ``ep`` mesh
  axis inside ``shard_map`` (router replicated, combine + KL partials
  psummed — `parallel/moe.py` semantics at per-block granularity).

Per the reference's conversion scope (`bayeformers/nn/__init__.py:25`:
only ``nn.Linear`` is Bayesian), every projection (packed QKV, attention
output, FFN/experts) is a Gaussian variational posterior run through the
fused ``bayes_linear`` op, while LayerNorm scales/biases, the router, and
the workload's embeddings stay frequentist (plain trainable leaves).

Weight noise is a pure function of (draw key, global block index) — NOT of
the activation — so every microbatch of a pipeline tick sees the same
sampled weights within one MC draw (the pipeline-correctness invariant,
`parallel/pipeline.py`), and expert draws are routing-independent.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from bayeformers_tpu.core import distributions as dist
from bayeformers_tpu.core import init as init_lib
from bayeformers_tpu.core import prior as prior_lib
from bayeformers_tpu.ops import common as ops_common
from bayeformers_tpu.ops import fused_linear as ops_fused
from bayeformers_tpu.parallel import collectives as coll
from bayeformers_tpu.parallel.moe import BayesMoE


def _bayes_dense(h, mu, rho, b_mu, b_rho, skey, mixture):
    """One sampled dense on ``h (N, d_in)``: returns ``(y, log_q, log_p)``.

    Weight eps comes from the fused kernel's deterministic stream seeded
    from ``skey``; bias eps from ``fold_in(skey, 1)`` (the BlockStack /
    BayesMoE convention, so all hand-built tiers share one sampling
    contract)."""
    seeds = ops_common.seed_from_key(skey[None])
    y, lq, lp = ops_fused.bayes_linear(h[None], mu, rho, seeds,
                                       mixture=mixture)
    b_eps = jax.random.normal(jax.random.fold_in(skey, 1), b_mu.shape,
                              b_mu.dtype)
    b_sig = dist.sigma_from_rho(b_rho)
    b = b_mu + b_sig * b_eps
    log_q = lq[0] + jnp.sum(
        -dist.LOG_SQRT_2PI - jnp.log(b_sig) - 0.5 * b_eps * b_eps
    )
    log_p = lp[0] + dist.scale_mixture_log_prob(b, *mixture)
    return y[0] + b[None, :], log_q, log_p


def _layer_norm(x, scale, bias, eps=1e-6):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.var(x, axis=-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * scale + bias


@dataclasses.dataclass(frozen=True)
class TransformerStack:
    """Stacked pre-LN Bayesian transformer blocks.

    ``h <- h + O(attn(LN1(h)))``, ``h <- h + FFN(LN2(h))`` with every
    projection a Gaussian variational posterior. Leaves carry a leading
    depth axis (``(L, ...)``); with ``moe`` set, the FFN leaves live under
    the nested ``"moe"`` subtree with shapes ``(L, E, ...)`` (+ per-block
    router ``(L, d, E)``).
    """

    n_blocks: int
    d_model: int
    n_heads: int
    d_ff: int
    causal: bool = True
    moe: Optional[BayesMoE] = None

    def __post_init__(self):
        if self.d_model % self.n_heads:
            raise ValueError(
                f"d_model {self.d_model} % n_heads {self.n_heads} != 0"
            )
        if self.moe is not None and self.moe.features != self.d_model:
            raise ValueError(
                f"moe.features {self.moe.features} != d_model {self.d_model}"
            )

    def init_stack(self, key: jax.Array) -> dict:
        L, d, f = self.n_blocks, self.d_model, self.d_ff
        ks = jax.random.split(key, 8)
        qkv_mu, qkv_rho = init_lib.DEFAULT_UNIFORM(ks[0], (L, d, 3 * d))
        qkv_bmu, qkv_brho = init_lib.DEFAULT_UNIFORM(ks[1], (L, 3 * d))
        o_mu, o_rho = init_lib.DEFAULT_UNIFORM(ks[2], (L, d, d))
        o_bmu, o_brho = init_lib.DEFAULT_UNIFORM(ks[3], (L, d))
        params = {
            "qkv_mu": qkv_mu, "qkv_rho": qkv_rho,
            "qkv_bmu": qkv_bmu, "qkv_brho": qkv_brho,
            "o_mu": o_mu, "o_rho": o_rho,
            "o_bmu": o_bmu, "o_brho": o_brho,
            "ln1_scale": jnp.ones((L, d)), "ln1_bias": jnp.zeros((L, d)),
            "ln2_scale": jnp.ones((L, d)), "ln2_bias": jnp.zeros((L, d)),
        }
        if self.moe is None:
            wi_mu, wi_rho = init_lib.DEFAULT_UNIFORM(ks[4], (L, d, f))
            wi_bmu, wi_brho = init_lib.DEFAULT_UNIFORM(ks[5], (L, f))
            wo_mu, wo_rho = init_lib.DEFAULT_UNIFORM(ks[6], (L, f, d))
            wo_bmu, wo_brho = init_lib.DEFAULT_UNIFORM(ks[7], (L, d))
            params.update({
                "wi_mu": wi_mu, "wi_rho": wi_rho,
                "wi_bmu": wi_bmu, "wi_brho": wi_brho,
                "wo_mu": wo_mu, "wo_rho": wo_rho,
                "wo_bmu": wo_bmu, "wo_brho": wo_brho,
            })
        else:
            # per-block MoE params: vmap the layer's initializer over depth
            moe_keys = jax.random.split(ks[4], L)
            params["moe"] = jax.vmap(self.moe.init_params)(moe_keys)
        return params

    def dummy_input(self) -> jax.Array:
        """Minimal activation for the pipeline KL probe (a 1-token
        sequence; causal attention over T=1 is the identity pattern)."""
        return jnp.zeros((1, 1, self.d_model))

    def block_apply(self, leaf, key: jax.Array, global_idx: jax.Array,
                    h: jax.Array, *, ep: int = 1, axis: str | None = None):
        """One transformer block on ``h (mb, T, d)``; returns
        ``(h', log_q, log_p)``. eps streams are pure functions of
        (key, global_idx) — tick-invariant under the pipeline schedule and
        routing-independent under MoE dispatch."""
        prior = prior_lib.DEFAULT_SCALE_MIXTURE
        mixture = (prior.pi, prior.sigma1, prior.sigma2)
        bkey = jax.random.fold_in(key, global_idx)
        mb, T, d = h.shape
        nh, hd = self.n_heads, d // self.n_heads

        # --- attention (sampled QKV/O projections, XLA attention math) ---
        x = _layer_norm(h, leaf["ln1_scale"], leaf["ln1_bias"])
        qkv, lq1, lp1 = _bayes_dense(
            x.reshape(mb * T, d), leaf["qkv_mu"], leaf["qkv_rho"],
            leaf["qkv_bmu"], leaf["qkv_brho"],
            jax.random.fold_in(bkey, 0), mixture,
        )
        q, k, v = jnp.split(qkv.reshape(mb, T, 3, nh, hd), 3, axis=2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]   # (mb, T, nh, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(hd, h.dtype)
        )
        if self.causal:
            mask = jnp.tril(jnp.ones((T, T), bool))
            scores = jnp.where(mask[None, None], scores, -1e30)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(h.dtype), v)
        o, lq2, lp2 = _bayes_dense(
            attn.reshape(mb * T, d), leaf["o_mu"], leaf["o_rho"],
            leaf["o_bmu"], leaf["o_brho"],
            jax.random.fold_in(bkey, 1), mixture,
        )
        h = h + o.reshape(mb, T, d)

        # --- FFN (dense pair or per-block Bayesian MoE) ---
        x2 = _layer_norm(h, leaf["ln2_scale"], leaf["ln2_bias"])
        tokens = x2.reshape(mb * T, d)
        if self.moe is None:
            hidden, lq3, lp3 = _bayes_dense(
                tokens, leaf["wi_mu"], leaf["wi_rho"],
                leaf["wi_bmu"], leaf["wi_brho"],
                jax.random.fold_in(bkey, 2), mixture,
            )
            out, lq4, lp4 = _bayes_dense(
                jax.nn.gelu(hidden), leaf["wo_mu"], leaf["wo_rho"],
                leaf["wo_bmu"], leaf["wo_brho"],
                jax.random.fold_in(bkey, 3), mixture,
            )
            lq_ffn, lp_ffn = lq3 + lq4, lp3 + lp4
        else:
            out, lq_ffn, lp_ffn = self.moe.apply_local(
                leaf["moe"], jax.random.fold_in(bkey, 2), tokens,
                ep=ep, axis=axis,
            )
        h = h + out.reshape(mb, T, d)
        return h, lq1 + lq2 + lq_ffn, lp1 + lp2 + lp_ffn

    def apply_stack(self, params, key: jax.Array, h: jax.Array, *,
                    ep: int = 1, axis: str | None = None):
        """All blocks in depth order on ``h (B, T, d)`` (single device, or
        inside an ``ep`` shard_map with the MoE expert leaves sharded);
        returns ``(h', log_q, log_p)``."""
        def body(h, args):
            leaf, l = args
            h, lq, lp = self.block_apply(leaf, key, l, h, ep=ep, axis=axis)
            return h, (lq, lp)

        h, (lqs, lps) = jax.lax.scan(
            body, h, (params, jnp.arange(self.n_blocks))
        )
        return h, jnp.sum(lqs), jnp.sum(lps)


# --------------------------------------------------------------------------
# Causal-LM training steps (tied-embedding readout, next-token CE)
# --------------------------------------------------------------------------

def lm_init(stack: TransformerStack, vocab: int, seq_len: int,
            key: jax.Array) -> dict:
    """Full LM params: the Bayesian stack + frequentist token/positional
    embeddings (reference conversion scope: embeddings stay frequentist,
    `bayeformers/nn/__init__.py:25`). The readout is tied to the token
    embedding (logits = h @ embed.T) so every projection in the stack
    remains Bayesian and depth-shardable."""
    ks = jax.random.split(key, 3)
    d = stack.d_model
    return {
        "stack": stack.init_stack(ks[0]),
        "embed": jax.random.normal(ks[1], (vocab, d)) * (d ** -0.5),
        "pos": jax.random.normal(ks[2], (seq_len, d)) * (d ** -0.5),
    }


def lm_logits_single(stack: TransformerStack, params, key: jax.Array,
                     tokens: jax.Array):
    """Single-device LM forward: ``tokens (B, T)`` int32 -> ``(logits
    (B, T, V), log_q, log_p)``. The ep variant lives in the train step
    (needs the mesh axis)."""
    h = params["embed"][tokens] + params["pos"][None, : tokens.shape[1]]
    h, lq, lp = stack.apply_stack(params["stack"], key, h)
    return h @ params["embed"].T, lq, lp


def _lm_loss(logits, batch):
    """Next-token CE (sum over B*T, reference NLL sum-reduction
    `examples/mlp_mnist.py:153`) + accuracy metrics. ``batch["eval_mask"]``
    (B, T) selects the positions with a checkable ceiling (e.g. the
    repeated half of a copy task)."""
    targets = batch["targets"]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll_tok = -jnp.take_along_axis(logp, targets[..., None], -1)[..., 0]
    nll = jnp.sum(nll_tok)
    pred = jnp.argmax(logits, -1)
    hit = (pred == targets).astype(jnp.float32)
    mask = batch["eval_mask"].astype(jnp.float32)
    metrics = {
        "acc": jnp.mean(hit),
        "copy_acc": jnp.sum(hit * mask) / jnp.maximum(jnp.sum(mask), 1.0),
    }
    return nll, metrics


def make_single_lm_train_step(stack: TransformerStack, tx, *,
                              n_samples: int, n_batches: int):
    """Single-device MC-ELBO step for the transformer LM (also the ep=1
    code path of :func:`make_ep_lm_train_step`)."""
    import optax

    @jax.jit
    def step(params, opt_state, key, batch):
        def loss(params):
            def draw(carry, skey):
                logits, lq, lp = lm_logits_single(
                    stack, params, skey, batch["tokens"]
                )
                nll, metrics = _lm_loss(logits, batch)
                l = (lq - lp) / n_batches + nll
                return carry + l / n_samples, (nll, metrics)

            total, (nlls, metrics) = jax.lax.scan(
                draw, 0.0, jax.random.split(key, n_samples)
            )
            return total, (jnp.mean(nlls), jax.tree.map(jnp.mean, metrics))

        (l, (nll, metrics)), grads = jax.value_and_grad(
            loss, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, dict(metrics, loss=l, nll=nll)

    return step


def make_pp_lm_train_step(stack: TransformerStack, tx, *, mesh,
                          n_samples: int, n_batches: int,
                          n_microbatches: int):
    """Pipelined MC-ELBO step for the transformer LM over the ``pp`` mesh.

    The stack's depth-stacked leaves shard on ``pp``; embeddings replicate
    (every stage embeds — cheap — but only stage 0's result enters the
    pipe). Embedding/readout gradients flow through the pipeline's psum-
    masked output broadcast, then ``pmean`` over stages for fp safety.
    """
    import optax
    from jax.sharding import PartitionSpec as P

    from bayeformers_tpu.parallel import pipeline as pp_lib

    if stack.moe is not None:
        raise NotImplementedError(
            "pp over a MoE-FFN TransformerStack needs a pp x ep mesh; "
            "shard experts with make_ep_lm_train_step or use a dense FFN"
        )
    pp = dict(mesh.shape)["pp"]

    def local_step(params, opt_state, key, batch):
        def loss(params):
            def draw(carry, skey):
                h = (params["embed"][batch["tokens"]]
                     + params["pos"][None, : batch["tokens"].shape[1]])
                # Megatron "f" at the replication boundary: only stage 0's
                # pipeline injection carries the embedding-path cotangent
                # (other stages' reads are dead code), so backward psums it
                # onto every stage — embed/pos grads come out full and
                # device-invariant (inject part + the identical readout
                # part from the tied logits below).
                h = coll.copy_to_shards(h, "pp")
                out, lq, lp = pp_lib.pipeline_apply(
                    stack, params["stack"], skey, h,
                    pp=pp, n_microbatches=n_microbatches,
                )
                logits = out @ params["embed"].T
                nll, metrics = _lm_loss(logits, batch)
                l = (lq - lp) / n_batches + nll
                return carry + l / n_samples, (nll, metrics)

            total, (nlls, metrics) = jax.lax.scan(
                draw, 0.0, jax.random.split(key, n_samples)
            )
            return total, (jnp.mean(nlls), jax.tree.map(jnp.mean, metrics))

        (l, (nll, metrics)), grads = jax.value_and_grad(
            loss, has_aux=True
        )(params)
        # stack grads are stage-local; embed/pos grads are full and
        # device-invariant via the "f" collective above — no sync needed
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, dict(metrics, loss=l, nll=nll)

    @jax.jit
    def step(params, opt_state, key, batch):
        pspecs = {
            "stack": jax.tree.map(lambda _: P("pp"), params["stack"]),
            "embed": P(), "pos": P(),
        }
        # optimizer moments mirror the params tree; mark a moment leaf as
        # depth-sharded iff its leading dim is the depth L. Collision
        # caveat (same style as moe.py): a vocab or seq_len equal to
        # n_blocks would misclassify — keep the sizes distinct.
        opt_specs = jax.tree.map(
            lambda a: P("pp") if getattr(a, "ndim", 0) >= 2
            and a.shape[0] == stack.n_blocks else P(),
            opt_state,
        )
        fn = jax.shard_map(
            local_step, mesh=mesh,
            in_specs=(pspecs, opt_specs, P(), P()),
            out_specs=(pspecs, opt_specs, P()),
            check_vma=False,
        )
        return fn(params, opt_state, key, batch)

    return step


def moe_stack_specs(params_stack):
    """PartitionSpec tree for a MoE TransformerStack's params: expert
    leaves (under the nested ``"moe"`` subtree, shapes (L, E, ...)) shard
    their EXPERT axis over ``ep``; the per-block router and everything
    else replicate."""
    from jax.sharding import PartitionSpec as P

    specs = jax.tree.map(lambda _: P(), params_stack)
    specs["moe"] = {
        k: (P() if k == "router" else P(None, "ep"))
        for k in params_stack["moe"]
    }
    return specs


def make_ep_lm_train_step(stack: TransformerStack, tx, *, mesh,
                          n_samples: int, n_batches: int):
    """Expert-parallel MC-ELBO step for the MoE-FFN transformer LM over
    the ``ep`` mesh: every block's expert leaves shard on ep, attention /
    LN / router / embeddings replicate, per-block combines and KL partials
    psum over ep (`parallel/moe.py` semantics at depth granularity)."""
    import optax
    from jax.sharding import PartitionSpec as P

    if stack.moe is None:
        raise ValueError("make_ep_lm_train_step needs a MoE TransformerStack")
    ep = dict(mesh.shape)["ep"]

    def local_step(params, opt_state, key, batch):
        def loss(params):
            def draw(carry, skey):
                h = (params["embed"][batch["tokens"]]
                     + params["pos"][None, : batch["tokens"].shape[1]])
                h, lq, lp = stack.apply_stack(
                    params["stack"], skey, h, ep=ep, axis="ep"
                )
                logits = h @ params["embed"].T
                nll, metrics = _lm_loss(logits, batch)
                l = (lq - lp) / n_batches + nll
                return carry + l / n_samples, (nll, metrics)

            total, (nlls, metrics) = jax.lax.scan(
                draw, 0.0, jax.random.split(key, n_samples)
            )
            return total, (jnp.mean(nlls), jax.tree.map(jnp.mean, metrics))

        (l, (nll, metrics)), grads = jax.value_and_grad(
            loss, has_aux=True
        )(params)
        # expert-leaf grads are shard-local; every replicated leaf's grads
        # (attention/LN/router/embeddings) are full and device-invariant by
        # construction: apply_local's "f" collective psums the per-device
        # expert-partial cotangents of x and the router in backward, and
        # every other path is identical replicated math — no sync needed
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, dict(metrics, loss=l, nll=nll)

    @jax.jit
    def step(params, opt_state, key, batch):
        pspecs = {
            "stack": moe_stack_specs(params["stack"]),
            "embed": P(), "pos": P(),
        }
        # moment leaves mirroring an expert leaf carry (L, E/ep, ...);
        # identified by ndim>=3 with a leading depth axis. Router moments
        # are (L, d, E) — also ndim 3 — so match on the E axis too.
        E = stack.moe.n_experts

        def _opt_spec(a):
            nd = getattr(a, "ndim", 0)
            if nd >= 3 and a.shape[0] == stack.n_blocks and a.shape[1] == E:
                return P(None, "ep")
            return P()

        opt_specs = jax.tree.map(_opt_spec, opt_state)
        fn = jax.shard_map(
            local_step, mesh=mesh,
            in_specs=(pspecs, opt_specs, P(), P()),
            out_specs=(pspecs, opt_specs, P()),
            check_vma=False,
        )
        return fn(params, opt_state, key, batch)

    return step
