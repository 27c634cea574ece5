"""Bayesian Mixture-of-Experts with expert parallelism (ep axis).

The reference has no MoE and no expert parallelism (SURVEY.md §2: EP
"absent") — TPU-native surplus completing the mesh story (dp/tp/sp/pp/ep).

Design (GShard-style, Lepikhin et al. 2020, arXiv:2006.16668):

- :class:`BayesMoE` is a hand-built-tier layer: a FREQUENTIST router (a
  plain dense — routing decisions should not be noise-driven) over E
  Bayesian expert FFNs whose parameters are STACKED along a leading expert
  axis (``(E, ...)`` leaves), each expert sampling weights through the same
  fused ``bayes_linear`` op as every other tier.
- Top-1 dispatch with a static per-expert capacity ``C = ceil(T/E *
  capacity_factor)``: tokens beyond an expert's capacity are dropped
  (standard GShard semantics — the residual path, if any, is the caller's).
  Dispatch/combine are one-hot einsums, so every shape is static under jit.
- **Expert parallelism**: shard the expert axis over ``ep`` inside
  ``shard_map``. The router runs replicated (tiny); each device einsum-
  dispatches only its local experts' capacity slots, runs its resident
  Bayesian experts, and the weighted combine is ``psum``-med over ``ep``
  (through the custom-VJP g collective). Expert weights never move — only
  the (T, d) combine rides the ICI.
- **KL**: every expert's weights are sampled each draw (eps deterministic
  per (key, global expert index)), so each contributes its log-prob terms
  once per draw regardless of routing — local partials are psummed over
  ``ep`` exactly like the pipeline tier.
"""
from __future__ import annotations

import dataclasses
import math
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
class BayesMoE:
    """Top-1 Bayesian MoE: ``y[t] = gate[t] * expert_{e(t)}(x[t])``.

    Expert FFN: ``h -> act(h @ W1_e + b1_e) @ W2_e + b2_e`` with every W/b a
    Gaussian variational posterior (reference parametrization,
    `bayeformers/nn/layers/linear.py:66-76`, reused at MoE granularity).
    Stacked leaves: wi mu/rho ``(E, d, ff)``, wo mu/rho ``(E, ff, d)``,
    biases ``(E, ff)`` / ``(E, d)``; router kernel ``(d, E)`` frequentist.
    """

    n_experts: int
    features: int
    ffn: int
    capacity_factor: float = 1.25
    act: Callable[[jax.Array], jax.Array] = jax.nn.gelu

    def init_params(self, key: jax.Array) -> dict[str, jax.Array]:
        E, d, f = self.n_experts, self.features, self.ffn
        ks = jax.random.split(key, 5)
        wi_mu, wi_rho = init_lib.DEFAULT_UNIFORM(ks[0], (E, d, f))
        wo_mu, wo_rho = init_lib.DEFAULT_UNIFORM(ks[1], (E, f, d))
        bi_mu, bi_rho = init_lib.DEFAULT_UNIFORM(ks[2], (E, f))
        bo_mu, bo_rho = init_lib.DEFAULT_UNIFORM(ks[3], (E, d))
        router = jax.random.normal(ks[4], (d, E)) * (1.0 / math.sqrt(d))
        return {
            "wi_mu": wi_mu, "wi_rho": wi_rho, "wo_mu": wo_mu,
            "wo_rho": wo_rho, "bi_mu": bi_mu, "bi_rho": bi_rho,
            "bo_mu": bo_mu, "bo_rho": bo_rho, "router": router,
        }

    def capacity(self, n_tokens: int) -> int:
        return max(1, math.ceil(
            n_tokens / self.n_experts * self.capacity_factor
        ))

    def route(self, router, x: jax.Array):
        """Top-1 dispatch/combine tensors for tokens ``x (T, d)``.

        Returns ``(dispatch (T, E, C) one-hot, combine (T, E, C) gated)``,
        both zero for capacity-overflow tokens. Identical on every device
        (router replicated) — ep shards slice the E axis afterwards.
        """
        T = x.shape[0]
        C = self.capacity(T)
        logits = x @ router
        gates = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        expert = jnp.argmax(gates, axis=-1)                      # (T,)
        onehot = jax.nn.one_hot(expert, self.n_experts, dtype=x.dtype)
        # position of each token within its expert's queue
        pos = (jnp.cumsum(onehot, axis=0) - onehot) * onehot     # (T, E)
        slot = jnp.sum(pos, axis=-1).astype(jnp.int32)           # (T,)
        keep = slot < C
        dispatch = (
            onehot[:, :, None]
            * jax.nn.one_hot(slot, C, dtype=x.dtype)[:, None, :]
            * keep[:, None, None]
        )                                                        # (T, E, C)
        gate = jnp.sum(gates.astype(x.dtype) * onehot, axis=-1)  # (T,)
        combine = dispatch * gate[:, None, None]
        return dispatch, combine

    def expert_apply(self, params, key: jax.Array, global_idx: jax.Array,
                     h: jax.Array):
        """One expert FFN on its capacity slots ``h (C, d)``; returns
        ``(y (C, d), log_q, log_p)``. eps is a pure function of
        (key, global expert index): routing-independent draws."""
        prior = prior_lib.DEFAULT_SCALE_MIXTURE
        mixture = (prior.pi, prior.sigma1, prior.sigma2)
        ekey = jax.random.fold_in(key, global_idx)
        lq, lp = 0.0, 0.0

        def dense(h, mu, rho, b_mu, b_rho, skey):
            nonlocal lq, lp
            seeds = ops_common.seed_from_key(skey[None])
            y, lqi, lpi = ops_fused.bayes_linear(
                h[None], mu, rho, seeds, mixture=mixture
            )
            b_eps = jax.random.normal(
                jax.random.fold_in(skey, 1), b_mu.shape, b_mu.dtype
            )
            b_sig = dist.sigma_from_rho(b_rho)
            b = b_mu + b_sig * b_eps
            lq = lq + lqi[0] + jnp.sum(
                -dist.LOG_SQRT_2PI - jnp.log(b_sig) - 0.5 * b_eps * b_eps
            )
            lp = lp + lpi[0] + dist.scale_mixture_log_prob(b, *mixture)
            return y[0] + b[None, :]

        h = self.act(dense(h, params["wi_mu"], params["wi_rho"],
                           params["bi_mu"], params["bi_rho"],
                           jax.random.fold_in(ekey, 0)))
        y = dense(h, params["wo_mu"], params["wo_rho"],
                  params["bo_mu"], params["bo_rho"],
                  jax.random.fold_in(ekey, 1))
        return y, lq, lp

    def apply_local(self, params, key: jax.Array, x: jax.Array, *,
                    ep: int = 1, axis: str | None = None):
        """The MoE layer on tokens ``x (T, d)``.

        With ``ep == 1``: plain single-device apply (params carry all E
        experts). Inside ``shard_map`` with ``ep > 1``: params leaves are
        the LOCAL ``(E/ep, ...)`` shard, x is replicated; the combine and
        the KL partials are psummed over ``axis``.
        """
        E_local = params["wi_mu"].shape[0]
        router = params["router"]
        if ep > 1:
            # Megatron "f" at the replication boundary: forward identity,
            # backward psum. Each device's local backward yields only ITS
            # experts' cotangent contribution to x and the router (the
            # dispatch/combine slices cut the other experts' paths), so
            # without the psum every upstream gradient is a 1/ep-scaled
            # partial — measured exactly that (probe 2026-08-19: router
            # pmean rel err 0.75 at ep=4; Adam's scale invariance masked it).
            x = coll.copy_to_shards(x, axis)
            router = coll.copy_to_shards(router, axis)
        dispatch, combine = self.route(router, x)
        if ep > 1:
            shard = jax.lax.axis_index(axis)
            e0 = shard * E_local
            dispatch = jax.lax.dynamic_slice_in_dim(dispatch, e0, E_local, 1)
            combine = jax.lax.dynamic_slice_in_dim(combine, e0, E_local, 1)
        else:
            e0 = 0
        # (T, El, C) x (T, d) -> (El, C, d)
        inputs = jnp.einsum("tec,td->ecd", dispatch, x)

        def body(carry, args):
            leaf, l = args
            y, lq, lp = self.expert_apply(leaf, key, e0 + l, inputs[l])
            return carry, (y, lq, lp)

        leaves = {k: v for k, v in params.items() if k != "router"}
        _, (ys, lqs, lps) = jax.lax.scan(
            body, 0.0, (leaves, jnp.arange(E_local))
        )
        out = jnp.einsum("tec,ecd->td", combine, ys)
        log_q, log_p = jnp.sum(lqs), jnp.sum(lps)
        if ep > 1:
            out = coll.reduce_from_shards(out, axis)
            log_q = coll.reduce_from_shards(log_q, axis)
            log_p = coll.reduce_from_shards(log_p, axis)
        return out, log_q, log_p


def expert_specs():
    """PartitionSpec pytree for BayesMoE params: experts sharded over ep,
    router replicated."""
    P = jax.sharding.PartitionSpec
    return {
        "wi_mu": P("ep"), "wi_rho": P("ep"), "wo_mu": P("ep"),
        "wo_rho": P("ep"), "bi_mu": P("ep"), "bi_rho": P("ep"),
        "bo_mu": P("ep"), "bo_rho": P("ep"), "router": P(),
    }


def make_ep_mesh(ep: int, devices=None) -> jax.sharding.Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    if ep > devices.size:
        raise ValueError(f"ep={ep} needs {ep} devices, have {devices.size}")
    return jax.sharding.Mesh(devices[:ep], ("ep",))


def make_ep_train_step(
    moe: BayesMoE, tx, *, mesh, n_samples: int, n_batches: int, loss_fn,
):
    """jitted shard_map ELBO training step over the ``ep`` mesh.

    ``loss_fn(out, batch) -> (nll_sum, metrics)`` on the MoE output
    ``(T, d)``. Expert-leaf grads are shard-local; the router's are full
    and device-invariant by construction (``apply_local`` wraps the router
    and x in the Megatron "f" collective, which psums the per-device
    expert-partial cotangents in backward).
    """
    import optax
    from jax.sharding import PartitionSpec as P

    ep = dict(mesh.shape)["ep"]
    especs = expert_specs()

    def local_step(params, opt_state, key, batch):
        def loss(params):
            def draw(carry, skey):
                out, lq, lp = moe.apply_local(
                    params, skey, batch["x"], ep=ep, axis="ep"
                )
                nll, metrics = loss_fn(out, batch)
                return carry + ((lq - lp) / n_batches + nll) / n_samples, (
                    nll, metrics
                )

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

    @jax.jit
    def step(params, opt_state, key, batch):
        # optimizer moments mirroring an expert-stacked leaf carry its
        # leading (E, ...) axis; everything else (router moments, step
        # counts) replicates. Collision caveat: a router with
        # features == n_experts would be misclassified — BayesMoE sizes
        # are the caller's, keep them distinct.
        opt_specs = jax.tree.map(
            lambda a: P("ep") if getattr(a, "ndim", 0) >= 2
            and a.shape[0] == moe.n_experts else P(),
            opt_state,
        )
        fn = jax.shard_map(
            local_step, mesh=mesh,
            in_specs=(especs, opt_specs, P(), P()),
            out_specs=(especs, opt_specs, P()),
            check_vma=False,
        )
        return fn(params, opt_state, key, batch)

    return step
