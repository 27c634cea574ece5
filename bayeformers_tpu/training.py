"""Reusable jitted ELBO train/eval step factories.

Packages the MC-ELBO idiom every reference workload re-implements inline
(`examples/bert_glue.py:56-73, 225-241`; SURVEY.md C11) into two factories.
Losses are sum-reduced over the batch, the KL term is divided by the number
of minibatches, and — unlike the reference — the whole step (S-sample
forward, loss, backward, clip, optimizer update) is one compiled XLA program.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

import bayeformers_tpu.elbo as elbo
from bayeformers_tpu.nn.surgery import BayesianModel, BayesParams


def classification_loss(out, batch):
    """Sum-reduced CE on S-averaged logits + accuracy metrics."""
    labels = batch["labels"]
    nll = elbo.cross_entropy_sum(elbo.mc_logits_mean(out), labels)
    acc, acc_std = elbo.accuracy_and_std(out, labels)
    return nll, {"acc": acc, "acc_std": acc_std}


def regression_loss(out, batch):
    """Sum-reduced MSE on the S-averaged scalar head (STS-B).

    The reference's generic `GlueDataset` path accepts regression tasks but
    its loss/metric code is classification-only (`examples/bert_glue.py:
    183-186`); this is the regression completion of that recipe. ``acc_std``'s
    regression analog is the std of per-MC-sample MSEs.
    """
    targets = batch["labels"].astype(jnp.float32)
    per_sample = out[..., 0].astype(jnp.float32)  # (S, B)
    preds = jnp.mean(per_sample, axis=0)
    nll = jnp.sum((preds - targets) ** 2)
    per_sample_mse = jnp.mean((per_sample - targets[None]) ** 2, axis=1)
    return nll, {"mse": nll / targets.shape[0], "mse_std": jnp.std(per_sample_mse)}


def qa_span_loss(out, batch):
    """SQuAD span loss: mean of start/end CE (reference
    `examples/bert_squad.py:307-313`), sum-reduced over the batch."""
    start_logits, end_logits = out
    nll = 0.5 * (
        elbo.cross_entropy_sum(elbo.mc_logits_mean(start_logits), batch["start_positions"])
        + elbo.cross_entropy_sum(elbo.mc_logits_mean(end_logits), batch["end_positions"])
    )
    start_acc, start_std = elbo.accuracy_and_std(start_logits, batch["start_positions"])
    end_acc, end_std = elbo.accuracy_and_std(end_logits, batch["end_positions"])
    return nll, {
        "acc": 0.5 * (start_acc + end_acc),
        "acc_std": 0.5 * (start_std + end_std),
    }


def pick_mc(bmodel: BayesianModel, fused: bool, estimator: Optional[str] = None):
    """Resolve the MC forward: 'fused' (Pallas), 'naive' (vmapped tier-A),
    'flipout' (per-example decorrelated perturbations, nn/flipout.py),
    'antithetic' (fused with ± paired weight draws — unbiased, lower
    variance, half the on-chip noise generation; needs even n_samples), or
    'local' (local reparameterization, nn/lrt.py — exact activation
    marginals, two shared-weight matmuls per layer regardless of S).
    ``estimator`` overrides the legacy ``fused`` flag when given."""
    import functools

    if estimator is None:
        estimator = "fused" if fused else "naive"
    try:
        return {
            "fused": bmodel.mc_apply_fused,
            "naive": bmodel.mc_apply,
            "flipout": bmodel.mc_apply_flipout,
            "antithetic": functools.partial(
                bmodel.mc_apply_fused, antithetic=True
            ),
            "local": bmodel.mc_apply_lrt,
            "lrt": bmodel.mc_apply_lrt,
        }[estimator]
    except KeyError:
        raise ValueError(f"unknown estimator {estimator!r}") from None


def make_elbo_train_step(
    bmodel: BayesianModel,
    tx: optax.GradientTransformation,
    n_samples: int,
    n_batches: int,
    loss_fn: Callable = classification_loss,
    fused: bool = True,
    input_keys: tuple[str, ...] = ("input_ids", "attention_mask", "token_type_ids"),
    estimator: Optional[str] = None,
    mc_chunk: Optional[int] = None,
):
    """Returns jitted ``step(bparams, opt_state, key, batch) ->
    (bparams, opt_state, metrics)``. ``batch`` maps input_keys to model
    inputs plus whatever ``loss_fn`` needs (labels / positions).

    ``mc_chunk`` (memory lever): run the S MC samples in chunks of this
    size with gradient accumulation across chunks. Activation and
    weight-residual memory scale with the chunk instead of S — the
    reference SQuAD recipe (S=10, batch 13, seq 384) exceeds one chip's
    HBM S-major but fits chunked. Semantics: each chunk is the reference
    recipe at S=mc_chunk; losses/gradients/metrics are averaged over
    chunks (fresh draws per chunk), so the estimator stays unbiased for
    the same objective family. ``mc_chunk >= n_samples`` (or None) is
    exactly the single-pass path.
    """

    mc = pick_mc(bmodel, fused, estimator)

    if mc_chunk is not None and mc_chunk < n_samples:
        if n_samples % mc_chunk:
            raise ValueError(
                f"mc_chunk={mc_chunk} must divide n_samples={n_samples}"
            )
        n_chunks = n_samples // mc_chunk

        @jax.jit
        def step(bparams: BayesParams, opt_state, key, batch):
            inputs = {k: batch[k] for k in input_keys if k in batch}

            def objective(bparams, kc):
                out, aux = mc(bparams, kc, mc_chunk, **inputs)
                nll, metrics = loss_fn(out, batch)
                loss = elbo.elbo_loss(
                    nll, aux["log_prior"], aux["log_variational_posterior"],
                    n_batches,
                )
                metrics = dict(
                    metrics,
                    nll=nll,
                    log_prior=jnp.mean(aux["log_prior"]),
                    log_variational_posterior=jnp.mean(
                        aux["log_variational_posterior"]
                    ),
                )
                metrics["loss"] = loss
                return loss, metrics

            keys = jax.random.split(key, n_chunks)
            grad_fn = jax.value_and_grad(objective, has_aux=True)
            (_, m_acc), g_acc = grad_fn(bparams, keys[0])

            def body(carry, kc):
                g_acc, m_acc = carry
                (_, m), g = grad_fn(bparams, kc)
                g_acc = jax.tree.map(jnp.add, g_acc, g)
                m_acc = {k2: m_acc[k2] + m[k2] for k2 in m_acc}
                return (g_acc, m_acc), None

            if n_chunks > 1:
                (g_acc, m_acc), _ = jax.lax.scan(
                    body, (g_acc, m_acc), keys[1:]
                )
            grads = jax.tree.map(lambda a: a / n_chunks, g_acc)
            metrics = {k2: v / n_chunks for k2, v in m_acc.items()}
            updates, opt_state = tx.update(grads, opt_state, bparams)
            bparams = optax.apply_updates(bparams, updates)
            return bparams, opt_state, metrics

        return step

    @jax.jit
    def step(bparams: BayesParams, opt_state, key, batch):
        inputs = {k: batch[k] for k in input_keys if k in batch}

        def objective(bparams):
            out, aux = mc(bparams, key, n_samples, **inputs)
            nll, metrics = loss_fn(out, batch)
            loss = elbo.elbo_loss(
                nll, aux["log_prior"], aux["log_variational_posterior"], n_batches
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

        (loss, metrics), grads = jax.value_and_grad(objective, has_aux=True)(bparams)
        updates, opt_state = tx.update(grads, opt_state, bparams)
        bparams = optax.apply_updates(bparams, updates)
        metrics["loss"] = loss
        return bparams, opt_state, metrics

    return step


def make_elbo_eval_step(
    bmodel: BayesianModel,
    n_samples: int,
    loss_fn: Callable = classification_loss,
    fused: bool = True,
    input_keys: tuple[str, ...] = ("input_ids", "attention_mask", "token_type_ids"),
    estimator: Optional[str] = None,
):
    """Returns jitted ``eval_step(bparams, key, batch) -> (out, metrics)``."""
    import functools

    # eval never runs backward, so skip writing sampled weights to HBM
    if (estimator is None and fused) or estimator == "fused":
        mc = functools.partial(bmodel.mc_apply_fused, save_weights=False)
    elif estimator == "antithetic":
        mc = functools.partial(
            bmodel.mc_apply_fused, save_weights=False, antithetic=True
        )
    else:
        mc = pick_mc(bmodel, fused, estimator)

    @jax.jit
    def eval_step(bparams: BayesParams, key, batch):
        inputs = {k: batch[k] for k in input_keys if k in batch}
        out, aux = mc(bparams, key, n_samples, **inputs)
        nll, metrics = loss_fn(out, batch)
        metrics = dict(
            metrics,
            nll=nll,
            log_prior=jnp.mean(aux["log_prior"]),
            log_variational_posterior=jnp.mean(aux["log_variational_posterior"]),
        )
        return out, metrics

    return eval_step


def adamw_with_decay_groups(
    lr, weight_decay: float, mask_no_decay: Callable, eps: float = 1e-8,
    clip_norm: Optional[float] = 1.0,
):
    """AdamW with bias/LayerNorm excluded from weight decay + grad clipping.

    The reference *intends* this grouping but its name filter never matches
    (`examples/bert_glue.py:104-105`, SURVEY.md Q6) so everything lands in
    one group; here the grouping actually works. ``mask_no_decay(path) ->
    bool`` marks parameters that skip decay.

    ``weight_decay`` rides ``optax.inject_hyperparams``: it lives in the
    optimizer STATE (a runtime scalar), not in the compiled HLO, so a
    hypersearch over weight_decay reuses one jitted train step for every
    trial (`set_weight_decay`) instead of paying a full model recompile
    per trial — the reference's 10-trial random search
    (`examples/hypersearch.py:42-58`) at TPU-sane compile cost.
    """
    def decay_mask(tree):
        from flax.traverse_util import flatten_dict, unflatten_dict
        from bayeformers_tpu.nn.surgery import BayesParams, SEP

        if isinstance(tree, BayesParams):
            flat = flatten_dict(tree.params, sep=SEP)
            params_mask = unflatten_dict(
                {k: not mask_no_decay(k) for k in flat}, sep=SEP
            )
            return BayesParams(
                params=params_mask,
                rho={k: False for k in tree.rho},  # sigma never decays
                prior_mu={k: False for k in tree.prior_mu},
            )
        return jax.tree.map(lambda _: True, tree)

    chain = []
    if clip_norm is not None:
        chain.append(optax.clip_by_global_norm(clip_norm))
    chain.append(
        optax.inject_hyperparams(optax.adamw, static_args=("mask",))(
            learning_rate=lr, eps=eps, weight_decay=weight_decay,
            mask=decay_mask,
        )
    )
    return optax.chain(*chain)


def set_weight_decay(opt_state, weight_decay: float):
    """New optimizer state with the injected ``weight_decay`` replaced.

    Works through any wrapper nesting (``chain``/``masked``): finds the
    ``InjectHyperparamsState`` entry by hyperparameter name. Value-only —
    the state STRUCTURE (and therefore every compiled step using it) is
    unchanged."""
    import optax.tree_utils as otu

    return otu.tree_set(
        opt_state, weight_decay=jnp.asarray(weight_decay, jnp.float32)
    )


def default_no_decay(path: str) -> bool:
    """bias and normalization parameters skip weight decay (HF convention).

    In Flax, LayerNorm/GroupNorm gains are leaves named ``scale`` regardless
    of the module's name, so that leaf name is matched directly in addition
    to the HF-style ``LayerNorm`` module-name check.
    """
    lowered = path.lower()
    return (
        lowered.endswith("bias")
        or lowered.endswith("scale")
        or "layernorm" in lowered.replace("_", "")
    )
