"""Data-parallel training via shard_map — the scaling path for the Pallas tier.

GSPMD (parallel/mesh.py + plain jit) is the right tool for the tier-A
(vmapped) path: XLA partitions the einsums and inserts collectives itself.
A Pallas kernel, however, is a black box to the partitioner — under a
sharded jit XLA would all-gather its inputs. ``shard_map`` solves this the
TPU-native way: each device runs the SAME single-device program (fused
kernels included) on its local batch shard, and gradients are all-reduced
explicitly with ``lax.psum`` over the ``dp`` mesh axis, riding ICI.

Semantics match the single-device step exactly: the PRNG key is replicated,
so every device samples the same S weight draws (one MC sample set shared
across the data-parallel batch, as on one chip), and the ELBO's KL term is
computed redundantly per device but scaled by 1/D before the psum.
"""
from __future__ import annotations

import functools
from typing import Callable

import jax

import optax
from jax.sharding import Mesh, PartitionSpec as P

import bayeformers_tpu.elbo as elbo
from bayeformers_tpu.nn.surgery import BayesianModel
from bayeformers_tpu.training import classification_loss


def make_dp_train_step(
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
):
    """Jitted ``step(bparams, opt_state, key, batch)`` where every array in
    ``batch`` is sharded on its leading axis over ``axis`` and everything
    else is replicated. The global batch size must divide the dp size.

    ``mc_chunk`` composes with dp exactly as in
    ``training.make_elbo_train_step``: each shard runs the S MC samples in
    chunks with local gradient accumulation, and the single psum happens on
    the chunk-averaged gradients."""
    from bayeformers_tpu.training import pick_mc

    n_dev = mesh.shape[axis]
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

    def local_step(bparams, opt_state, key, batch):
        inputs = {k: batch[k] for k in input_keys if k in batch}

        def objective(bparams, kc):
            out, aux = mc(bparams, kc, chunk_size, **inputs)
            nll, metrics = loss_fn(out, batch)
            # KL is identical on every device (same key, same weights):
            # scale by 1/D so the psum reconstitutes it exactly once.
            loss = (
                elbo.elbo_loss(
                    nll * 0.0, aux["log_prior"],
                    aux["log_variational_posterior"], n_batches,
                ) / n_dev
                + nll
            )
            return loss, metrics

        grad_fn = jax.value_and_grad(objective, has_aux=True)
        if n_chunks == 1:
            (loss, metrics), grads = grad_fn(bparams, key)
        else:
            keys = jax.random.split(key, n_chunks)
            (loss, metrics), grads = grad_fn(bparams, keys[0])

            def body(carry, kc):
                g_acc, l_acc, m_acc = carry
                (l, m), g = grad_fn(bparams, kc)
                return (
                    jax.tree.map(jax.numpy.add, g_acc, g),
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
        metrics = jax.tree.map(lambda v: jax.lax.pmean(v, axis), metrics)
        updates, opt_state = tx.update(grads, opt_state, bparams)
        bparams = optax.apply_updates(bparams, updates)
        metrics["loss"] = loss
        return bparams, opt_state, metrics

    rep = P()
    sharded = functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(rep, rep, rep, P(axis)),
        out_specs=(rep, rep, rep),
        check_vma=False,
    )
    return jax.jit(sharded(local_step))


def replicate(tree, mesh: Mesh):
    """Place every leaf replicated on the mesh."""
    sharding = jax.sharding.NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)
