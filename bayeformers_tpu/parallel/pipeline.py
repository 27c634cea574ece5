"""GPipe-style pipeline parallelism for stacked Bayesian blocks (pp axis).

The reference has no pipeline parallelism (SURVEY.md §2: PP "absent") — this
module is TPU-native surplus completing the mesh story (dp/tp/sp/pp). The
design is the canonical JAX pipeline-inside-``shard_map``:

- The model is a stack of L identical Bayesian blocks whose parameters are
  STACKED along a leading depth axis (``(L, ...)`` leaves). Sharding that
  axis over the ``pp`` mesh axis gives every stage ``L/pp`` resident blocks —
  weights never move, activations do.
- A training batch is split into M microbatches. Each pipeline tick, every
  stage runs its local blocks (a ``lax.scan`` over depth) on its current
  activation and passes the result to the next stage with ``lax.ppermute``
  (ICI neighbor hop). Stage 0 injects microbatch ``t`` on tick ``t``; the
  last stage emits microbatch ``t - (pp-1)``. ``M + pp - 1`` ticks drain the
  pipe; the bubble fraction is ``(pp-1)/(M+pp-1)``.
- **Weight noise is tick-invariant**: a block's eps stream is a deterministic
  function of (key, global block index) via the framework's unit-offset
  streams (ops/common.py), so every microbatch sees the SAME sampled weights
  within one MC draw — exactly the semantics of a full-batch forward, which
  is what makes the ELBO decomposition below exact rather than approximate.
- **KL is computed once, not per microbatch**: ``log q - log p`` depends only
  on (weights, eps), so each stage evaluates its local blocks' KL terms
  directly from the stacked params and the result is ``psum``-med over
  ``pp`` (through the custom-VJP :func:`~bayeformers_tpu.parallel.
  collectives.reduce_from_shards`, identity backward). The NLL is summed
  over microbatches. ``loss = (log_q - log_p)/n_batches + nll`` matches the
  single-device MC-ELBO bit-for-bit up to fp reassociation
  (tests/test_pipeline.py).

Scope: the HAND-BUILT tier (reference ``bnn.Model`` composition,
`README.md:34-56`) — blocks are explicit (mu, rho) stacks run through the
fused ``bayes_linear`` op. The HF interception tier is NOT pipelined: HF
FLAX models unroll their layers as separate named modules, so there is no
stacked depth axis to shard; use dp/tp/sp for those families.
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from bayeformers_tpu.core import distributions as dist
from bayeformers_tpu.core import init as init_lib
from bayeformers_tpu.core import prior as prior_lib
from bayeformers_tpu.ops import common as ops_common
from bayeformers_tpu.ops import fused_linear as ops_fused
from bayeformers_tpu.parallel import collectives as coll


@dataclasses.dataclass(frozen=True)
class BlockStack:
    """Stacked Bayesian dense blocks: ``h <- act(h @ W_l + b_l)`` with
    ``W_l = mu_l + softplus(rho_l) * eps_l``, optionally residual.

    Leaves carry a leading depth axis: mu/rho ``(L, d, d)``, bias mu/rho
    ``(L, d)``. ``init_stack`` draws the reference's default
    ``Uniform((-0.2, 0.2), (-5, -4))`` ranges (`initializations.py:60`).
    """

    n_blocks: int
    features: int
    act: Callable[[jax.Array], jax.Array] = jax.nn.gelu
    residual: bool = True

    def init_stack(self, key: jax.Array) -> dict[str, jax.Array]:
        L, d = self.n_blocks, self.features
        ks = jax.random.split(key, 2)
        mu, rho = init_lib.DEFAULT_UNIFORM(ks[0], (L, d, d))
        b_mu, b_rho = init_lib.DEFAULT_UNIFORM(ks[1], (L, d))
        return {"mu": mu, "rho": rho, "bias_mu": b_mu, "bias_rho": b_rho}

    def dummy_input(self) -> jax.Array:
        """Minimal activation for the KL probe (see ``pipeline_apply``)."""
        return jnp.zeros((1, self.features))

    def block_apply(self, leaf, key: jax.Array, global_idx: jax.Array,
                    h: jax.Array):
        """One block on one activation ``(mb, d)``; returns
        ``(h', log_q, log_p)``. eps is a pure function of (key, global_idx)
        — NOT of ``h`` — so repeated calls within a draw reuse one weight
        sample (the pipeline-correctness invariant)."""
        prior = prior_lib.DEFAULT_SCALE_MIXTURE
        mixture = (prior.pi, prior.sigma1, prior.sigma2)
        bkey = jax.random.fold_in(key, global_idx)
        seeds = ops_common.seed_from_key(bkey[None])
        y, lq, lp = ops_fused.bayes_linear(
            h[None], leaf["mu"], leaf["rho"], seeds, mixture=mixture,
        )
        y = y[0]
        b_eps = jax.random.normal(
            jax.random.fold_in(bkey, 1), leaf["bias_mu"].shape,
            leaf["bias_mu"].dtype,
        )
        b_sig = dist.sigma_from_rho(leaf["bias_rho"])
        b = leaf["bias_mu"] + b_sig * b_eps
        y = y + b[None, :]
        lq = lq[0] + jnp.sum(
            -dist.LOG_SQRT_2PI - jnp.log(b_sig) - 0.5 * b_eps * b_eps
        )
        lp = lp[0] + dist.scale_mixture_log_prob(b, *mixture)
        out = self.act(y)
        if self.residual:
            out = out + h
        return out, lq, lp


def stack_specs(mesh_axes=("pp",)):
    """PartitionSpec pytree for a BlockStack params dict: depth-sharded."""
    P = jax.sharding.PartitionSpec
    spec = P(mesh_axes[0])
    return {"mu": spec, "rho": spec, "bias_mu": spec, "bias_rho": spec}


def make_pp_mesh(pp: int, devices=None) -> jax.sharding.Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    if pp > devices.size:
        raise ValueError(f"pp={pp} needs {pp} devices, have {devices.size}")
    return jax.sharding.Mesh(devices[:pp], ("pp",))


def pipeline_apply(
    stack, params, key: jax.Array, x: jax.Array, *,
    pp: int, n_microbatches: int, axis: str = "pp",
):
    """Run a block stack as a ``pp``-stage pipeline INSIDE ``shard_map``.

    ``stack`` is any object with ``block_apply(leaf, key, global_idx, h)``
    and ``dummy_input()`` (``BlockStack`` here, ``TransformerStack`` in
    ``parallel/transformer.py``). ``params`` leaves are the LOCAL depth
    shard ``(L/pp, ...)``; ``x`` is the full ``(B, *rest)`` batch
    (replicated — stage 0 reads it, other stages' reads are dead code the
    scheduler overlaps); microbatching splits the leading axis. Returns
    ``(out, log_q, log_p)`` with ``out`` valid on every device (the last
    stage's results are broadcast with a psum-mask so the loss can be
    computed uniformly) and the KL scalars already psum-reduced over
    ``pp``.
    """
    stage = jax.lax.axis_index(axis)
    n_local = jax.tree.leaves(params)[0].shape[0]
    B, *rest = x.shape
    if B % n_microbatches:
        raise ValueError(f"batch {B} % microbatches {n_microbatches} != 0")
    mb = B // n_microbatches
    xs = x.reshape(n_microbatches, mb, *rest)
    n_ticks = n_microbatches + pp - 1
    perm = [(i, (i + 1) % pp) for i in range(pp)]

    def run_local(h):
        """scan the stage's resident blocks over one activation."""
        def body(h, args):
            leaf, l = args
            g_idx = stage * n_local + l
            h, lq, lp = stack.block_apply(leaf, key, g_idx, h)
            return h, (lq, lp)

        h, (lqs, lps) = jax.lax.scan(
            body, h, (params, jnp.arange(n_local)),
        )
        return h, jnp.sum(lqs), jnp.sum(lps)

    def tick(carry, t):
        state, outputs = carry
        # stage 0 injects microbatch t (clamped; post-drain injections are
        # dead values that never reach the output window)
        inject = xs[jnp.clip(t, 0, n_microbatches - 1)]
        h = jnp.where(stage == 0, inject, state)
        h, _, _ = run_local(h)
        # last stage emits microbatch t-(pp-1) once the pipe is full
        out_idx = t - (pp - 1)
        write = (stage == pp - 1) & (out_idx >= 0)
        outputs = jax.lax.dynamic_update_index_in_dim(
            outputs,
            jnp.where(write, h, jax.lax.dynamic_index_in_dim(
                outputs, jnp.clip(out_idx, 0, n_microbatches - 1), 0,
                keepdims=False)),
            jnp.clip(out_idx, 0, n_microbatches - 1), 0,
        )
        state = jax.lax.ppermute(h, axis, perm)
        return (state, outputs), None

    outputs0 = jnp.zeros((n_microbatches, mb, *rest), x.dtype)
    (_, outputs), _ = jax.lax.scan(
        tick, (jnp.zeros((mb, *rest), x.dtype), outputs0), jnp.arange(n_ticks)
    )
    # broadcast the last stage's outputs to every device (mask + psum via
    # the custom-VJP g collective: identity backward hands every stage the
    # replicated cotangent and the mask routes it to the last stage only)
    outputs = coll.reduce_from_shards(
        jnp.where(stage == pp - 1, outputs, jnp.zeros_like(outputs)), axis
    )

    # KL once per draw (weights are tick-invariant): local blocks only,
    # then the Megatron-g collective sums stages' partials
    def kl_body(_, args):
        leaf, l = args
        g_idx = stage * n_local + l
        # run on a zero activation only to reuse block_apply's eps/log-prob
        # math? No: compute directly — sampling identities are exposed by
        # bayes_linear's logprob outputs only alongside a matmul. A minimal
        # zero input (stack.dummy_input()) costs one tiny matmul per block
        # and guarantees the SAME eps stream as the forward ticks.
        _, lq, lp = stack.block_apply(leaf, key, g_idx, stack.dummy_input())
        return 0.0, (lq, lp)

    _, (lqs, lps) = jax.lax.scan(
        kl_body, 0.0, (params, jnp.arange(n_local))
    )
    log_q = coll.reduce_from_shards(jnp.sum(lqs), axis)
    log_p = coll.reduce_from_shards(jnp.sum(lps), axis)
    return outputs.reshape(B, *rest), log_q, log_p


def make_pp_train_step(
    stack: BlockStack, tx, *, mesh, n_samples: int, n_batches: int,
    n_microbatches: int, loss_fn,
):
    """jitted shard_map training step over the ``pp`` mesh.

    ``loss_fn(out, batch) -> (nll_sum, metrics)`` on the pipeline output
    ``(B, d)``. MC samples run as a ``lax.scan`` of full pipeline passes
    (fresh weight draw per sample, reference `bert_glue.py:63` semantics);
    ``loss = (log_q - log_p)/n_batches + mean_s nll``. Parameters stay
    depth-sharded; their grads are stage-local so the optimizer update
    needs no collective.
    """
    import optax
    from jax.sharding import PartitionSpec as P

    pp = dict(mesh.shape)["pp"]

    def local_step(params, opt_state, key, batch):
        def loss(params):
            def draw(carry, skey):
                out, lq, lp = pipeline_apply(
                    stack, params, skey, batch["x"],
                    pp=pp, n_microbatches=n_microbatches,
                )
                nll, metrics = loss_fn(out, batch)
                l = (lq - lp) / n_batches + nll
                return carry + l / n_samples, (nll, metrics)

            total, (nlls, metrics) = jax.lax.scan(
                draw, 0.0, jax.random.split(key, n_samples)
            )
            return total, (jnp.mean(nlls), jax.tree.map(jnp.mean, metrics))

        (l, (nll, metrics)), grads = jax.value_and_grad(
            loss, has_aux=True
        )(params)
        # grads of depth-sharded leaves are stage-local (each stage's blocks
        # touch only its shard) — no collective in the update
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(metrics, loss=l, nll=nll)
        return params, opt_state, metrics

    @jax.jit
    def step(params, opt_state, key, batch):
        # every stack leaf is depth-stacked (L, ...): shard them all on pp
        pspecs = jax.tree.map(lambda _: P("pp"), params)
        # optimizer-state leaves mirroring a params leaf carry its depth
        # axis (adam/sgd moments are (L/pp, ...) like the leaf); scalar
        # state (step counts) replicates. ndim>=2 is exactly "mirrors a
        # stacked leaf" for BlockStack's (L,d,d)/(L,d) leaves.
        opt_specs = jax.tree.map(
            lambda a: P("pp") if getattr(a, "ndim", 0) >= 2 else P(),
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
