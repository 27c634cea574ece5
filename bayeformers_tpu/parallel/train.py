"""Data- and tensor-parallel training via shard_map — the scaling path for
the Pallas tier.

GSPMD (parallel/mesh.py + plain jit) is the right tool for the tier-A
(vmapped) path: XLA partitions the einsums and inserts collectives itself.
A Pallas kernel, however, is a black box to the partitioner — under a
sharded jit XLA would all-gather its inputs. ``shard_map`` solves this the
TPU-native way: each device runs the SAME single-device program (fused
kernels included) on its local shard, with explicit collectives over ICI:

- **dp**: the batch's leading axis is sharded; gradients are all-reduced
  with ``lax.psum`` over ``dp`` after the local backward pass.
- **tp** (Megatron, arXiv:1909.08053): converted weights are sharded per
  parallel/mesh.py's column/row rules, and the fused interception
  (nn/fused.py ``tp=``) inserts the conjugate f/g collectives
  (parallel/collectives.py) inside the forward — one all-reduce per
  attention block and one per MLP, riding ICI, exactly the comm pattern
  the scaling-book recipe prescribes for tensor parallelism.

Draw semantics: by default the PRNG key is replicated, so every dp replica
samples the same S weight draws and the step is bit-equivalent to the
single-device step on the concatenated batch (the parity tests in
tests/test_parallel.py). ``independent_draws=True`` instead folds the key
with the dp coordinate — the reference's ``DataParallel`` semantics
(`examples/bert_squad.py:245`, each GPU replica holds its own Bayesian
sample set), giving S x dp effective samples per step; the psum of the
per-shard ELBOs/D is then the MC average over all S x dp draws, still an
unbiased estimate of the same objective.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

import optax
from jax.sharding import Mesh, PartitionSpec as P

import bayeformers_tpu.elbo as elbo
from bayeformers_tpu.nn.surgery import BayesianModel, BayesParams
from bayeformers_tpu.parallel import collectives as coll
from bayeformers_tpu.parallel import mesh as mesh_lib
from bayeformers_tpu.training import classification_loss


def _is_sharded(spec) -> bool:
    return spec is not None and any(ax is not None for ax in tuple(spec))


def _global_grad_norm(grads, spec_tree, tp_axis: Optional[str]):
    """Global L2 norm of a (possibly tp-sharded) gradient tree.

    Sharded leaves (spec mentions an axis) contribute local sum-of-squares
    psummed over ``tp_axis``; replicated leaves are identical on every
    device and count once. Equivalent to optax.clip_by_global_norm's norm on
    the logically-unsharded tree.
    """
    leaves = jax.tree.leaves(grads)
    if tp_axis is None:
        specs = [None] * len(leaves)
    else:
        specs = jax.tree.leaves(spec_tree, is_leaf=lambda x: isinstance(x, P))
    sq_sh = jnp.zeros((), jnp.float32)
    sq_rep = jnp.zeros((), jnp.float32)
    for g, s in zip(leaves, specs):
        v = jnp.sum(jnp.square(g.astype(jnp.float32)))
        if tp_axis is not None and _is_sharded(s):
            sq_sh = sq_sh + v
        else:
            sq_rep = sq_rep + v
    if tp_axis is not None:
        sq_sh = jax.lax.psum(sq_sh, tp_axis)
    return jnp.sqrt(sq_sh + sq_rep)


def make_train_step(
    bmodel: BayesianModel,
    tx: optax.GradientTransformation,
    n_samples: int,
    n_batches: int,
    mesh: Mesh,
    loss_fn: Callable = classification_loss,
    fused: bool = True,
    input_keys: tuple[str, ...] = ("input_ids", "attention_mask", "token_type_ids"),
    axis: str = "dp",
    estimator: str | None = None,
    mc_chunk: int | None = None,
    spec_fn=None,
    kind_fn=None,
    independent_draws: bool = False,
    clip_norm: float | None = None,
):
    """Jitted ``step(bparams, opt_state, key, batch)`` over a shard_map mesh.

    Every array in ``batch`` is sharded on its leading axis over ``axis``
    (the global batch size must divide the dp size) and replicated over the
    ``tp`` axis if the mesh has one with size > 1. With tp, ``bparams`` and
    ``opt_state`` must be sharded per ``spec_fn`` (default
    parallel/mesh.py::tp_param_spec — use shard_bayes_params); the fused
    estimator then runs Megatron-style on the weight shards.

    ``mc_chunk`` composes with dp exactly as in
    ``training.make_elbo_train_step``: each shard runs the S MC samples in
    chunks with local gradient accumulation, and the single psum happens on
    the chunk-averaged gradients.

    ``clip_norm``: sharded-aware global-norm gradient clipping applied after
    the dp all-reduce. With tp > 1 pass the clip here (NOT inside ``tx``):
    an in-``tx`` optax clip would compute a *local* norm that differs per
    device and silently desynchronizes the replicated parameters.

    Metrics returned match the single-device step's surface: ``loss`` and
    ``nll`` are global sums, ``log_prior`` / ``log_variational_posterior``
    are means over draws (and over dp shards under ``independent_draws``),
    plus whatever ``loss_fn`` reports (dp-averaged).
    """
    from bayeformers_tpu.training import pick_mc

    mesh_shape = dict(mesh.shape)
    n_dev = mesh_shape[axis]
    tp_size = mesh_shape.get("tp", 1)
    if spec_fn is None:
        # family-aware defaults: GPT-2's Conv1D orientation needs its own
        # (spec, kind) pair; Dense families derive kind from the spec
        spec_fn, default_kind, fused_tp_ok = mesh_lib.family_tp_fns(
            bmodel.spec.paths
        )
        if tp_size > 1 and not fused_tp_ok:
            raise ValueError(
                "this model family shards under the GSPMD tier only (its "
                "attention modules are not interception-covered); tp>1 in "
                "the fused shard_map tier would let stock attention code "
                "reshape sharded widths. Use plain jit over "
                "shard_bayes_params instead."
            )
    else:
        default_kind = lambda path: mesh_lib.kind_from_spec(spec_fn(path))
    kind_fn = kind_fn or default_kind

    if estimator is None:
        estimator = "fused" if fused else "naive"
    if tp_size > 1:
        if estimator not in ("fused", "antithetic"):
            raise ValueError(
                "tp>1 in the shard_map tier requires estimator 'fused' or "
                "'antithetic' (use the GSPMD tier for 'naive')"
            )
        tpctx = coll.TPContext(axis="tp", size=tp_size, kind_fn=kind_fn)
        mc = functools.partial(
            bmodel.mc_apply_fused, antithetic=(estimator == "antithetic"),
            tp=tpctx,
        )
    elif estimator in ("fused", "antithetic"):
        mc = functools.partial(
            bmodel.mc_apply_fused, antithetic=(estimator == "antithetic")
        )
    else:
        mc = pick_mc(bmodel, fused, estimator)

    if mc_chunk is not None and mc_chunk < n_samples:
        if n_samples % mc_chunk:
            raise ValueError(
                f"mc_chunk={mc_chunk} must divide n_samples={n_samples}"
            )
        n_chunks = n_samples // mc_chunk
        chunk_size = mc_chunk
    else:
        n_chunks, chunk_size = 1, n_samples

    def make_local_step(bp_specs):
        def local_step(bparams, opt_state, key, batch):
            inputs = {k: batch[k] for k in input_keys if k in batch}
            if independent_draws:
                # reference-DataParallel semantics: every dp replica draws
                # its own sample set (`examples/bert_squad.py:245`)
                key_l = jax.random.fold_in(key, jax.lax.axis_index(axis))
            else:
                key_l = key

            def objective(bparams, kc):
                out, aux = mc(bparams, kc, chunk_size, **inputs)
                nll, metrics = loss_fn(out, batch)
                # The KL is identical on every dp shard under shared draws
                # (and an independent estimate under independent_draws):
                # scale by 1/D so the dp psum reconstitutes (averages) it.
                loss = (
                    elbo.elbo_loss(
                        nll * 0.0, aux["log_prior"],
                        aux["log_variational_posterior"], n_batches,
                    ) / n_dev
                    + nll
                )
                metrics = dict(
                    metrics,
                    nll=nll,
                    log_prior=jnp.mean(aux["log_prior"]),
                    log_variational_posterior=jnp.mean(
                        aux["log_variational_posterior"]
                    ),
                )
                return loss, metrics

            grad_fn = jax.value_and_grad(objective, has_aux=True)
            if n_chunks == 1:
                (loss, metrics), grads = grad_fn(bparams, key_l)
            else:
                keys = jax.random.split(key_l, n_chunks)
                (loss, metrics), grads = grad_fn(bparams, keys[0])

                def body(carry, kc):
                    g_acc, l_acc, m_acc = carry
                    (l, m), g = grad_fn(bparams, kc)
                    return (
                        jax.tree.map(jnp.add, g_acc, g),
                        l_acc + l,
                        {k2: m_acc[k2] + m[k2] for k2 in m_acc},
                    ), None

                (grads, loss, metrics), _ = jax.lax.scan(
                    body, (grads, loss, metrics), keys[1:]
                )
                grads = jax.tree.map(lambda a: a / n_chunks, grads)
                loss = loss / n_chunks
                metrics = {k2: v / n_chunks for k2, v in metrics.items()}
            grads = jax.lax.psum(grads, axis)
            loss = jax.lax.psum(loss, axis)
            nll = jax.lax.psum(metrics.pop("nll"), axis)
            metrics = jax.tree.map(lambda v: jax.lax.pmean(v, axis), metrics)
            if clip_norm is not None:
                gnorm = _global_grad_norm(
                    grads, bp_specs, "tp" if tp_size > 1 else None
                )
                scale = jnp.minimum(1.0, clip_norm / (gnorm + 1e-12))
                grads = jax.tree.map(lambda g: g * scale, grads)
            updates, opt_state = tx.update(grads, opt_state, bparams)
            bparams = optax.apply_updates(bparams, updates)
            metrics["loss"] = loss
            metrics["nll"] = nll
            return bparams, opt_state, metrics

        return local_step

    rep = P()

    if tp_size <= 1:
        local_step = make_local_step(None)
        sharded = jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(rep, rep, rep, P(axis)),
            out_specs=(rep, rep, rep),
            check_vma=False,
        )
        return jax.jit(sharded)

    @jax.jit
    def step(bparams, opt_state, key, batch):
        bp_specs = mesh_lib.bayes_param_specs(bparams, spec_fn)
        opt_specs = jax.tree.map(
            lambda x: bp_specs if isinstance(x, BayesParams) else rep,
            opt_state,
            is_leaf=lambda x: isinstance(x, BayesParams),
        )
        fn = jax.shard_map(
            make_local_step(bp_specs),
            mesh=mesh,
            in_specs=(bp_specs, opt_specs, rep, P(axis)),
            out_specs=(bp_specs, opt_specs, rep),
            check_vma=False,
        )
        return fn(bparams, opt_state, key, batch)

    return step


def make_dp_train_step(*args, **kwargs):
    """Round-1/2 name for :func:`make_train_step` (dp-only call sites)."""
    return make_train_step(*args, **kwargs)


def replicate(tree, mesh: Mesh):
    """Place every leaf replicated on the mesh."""
    sharding = jax.sharding.NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)
