"""BERT GLUE fine-tune workload — TPU reproduction of `examples/bert_glue.py`.

Four phases, as in the reference (SURVEY.md §3.4):
  A. frequentist fine-tune (AdamW lr=2e-5 eps=1e-8, CE-sum, grad-clip 1.0,
     linear LR decay, 5 epochs — `bert_glue.py:77-112`),
  B. ``to_bayesian(model, delta=DELTA, freeze=True)`` (`bert_glue.py:167`),
  C. no-grad Bayesian eval (S=10; acc + acc_std across MC draws),
  D. Bayesian ELBO fine-tune (fresh AdamW, 5 epochs) + final save.

Driven by random hypersearch over DELTA (log) x WEIGHT_DECAY (linear), 10
iterations (`bert_glue.py:324-331`). Deliberate divergences, documented per
SURVEY.md quirks: weight-decay grouping actually excludes bias/LayerNorm
(Q6), the LR schedule steps per optimizer step (Q7), and the KL term is
differentiable (Q1).

Data: pass ``--data`` pointing to an .npz with arrays
``{train,dev}_{input_ids,attention_mask,token_type_ids,labels}`` (tokenized
GLUE, any task); otherwise a synthetic stand-in is generated (zero-egress).
"""
from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from tqdm import tqdm

import bayeformers_tpu as bf
from bayeformers_tpu import training
from bayeformers_tpu.models import bert as bert_lib
from bayeformers_tpu.parallel import mesh as mesh_lib
from bayeformers_tpu.parallel import train as parallel_lib
from bayeformers_tpu.utils import checkpoint as ckpt_lib
from bayeformers_tpu.utils import glue as glue_lib
from bayeformers_tpu.utils import metrics as metrics_lib
from bayeformers_tpu.utils.dumper import Dumper
from bayeformers_tpu.utils.hypersearch import HyperSearch
from bayeformers_tpu.utils.metrics import MetricsWriter, Report, run_name
from bayeformers_tpu.utils.optim import masked_optimizer

# Reference constants (`examples/bert_glue.py:77-88`)
EPOCHS = 5
SAMPLES = 10
BATCH_SIZE = 8
MAX_SEQ = 128
LR = 2e-5
ADAM_EPSILON = 1e-8
CLIP_NORM = 1.0


def load_glue(data_path: str | None, vocab_size: int, seed: int = 0,
              task: str = "mrpc", vocab: str | None = None,
              n_labels: int = 2, regression: bool = False):
    """Returns dicts train/dev of jnp arrays.

    Resolution order: (1) a pre-tokenized .npz; (2) a GLUE task directory of
    raw TSVs + a local vocab.txt, featurized via the native WordPiece
    tokenizer (utils/glue.py — no HF datasets dependency); (3) a synthetic
    stand-in that keeps label signal by planting a label-dependent token."""
    label_dtype = jnp.float32 if regression else jnp.int32
    if data_path and os.path.isfile(data_path):
        z = np.load(data_path)
        def split(prefix):
            return {
                "input_ids": jnp.asarray(z[f"{prefix}_input_ids"], jnp.int32),
                "attention_mask": jnp.asarray(z[f"{prefix}_attention_mask"], jnp.int32),
                "token_type_ids": jnp.asarray(z[f"{prefix}_token_type_ids"], jnp.int32),
                "labels": jnp.asarray(z[f"{prefix}_labels"], label_dtype),
            }
        return split("train"), split("dev"), False
    if (
        data_path and os.path.isdir(data_path)
        and os.path.exists(os.path.join(data_path, "train.tsv"))
        and vocab and os.path.exists(vocab)
    ):
        from bayeformers_tpu.native import WordPieceTokenizer

        tok = WordPieceTokenizer(vocab)
        train, dev = glue_lib.load_glue_task(
            data_path, task, tok.tokenize, max_seq=MAX_SEQ
        )
        as_jnp = lambda d: {
            k: jnp.asarray(v, label_dtype if k == "labels" else jnp.int32)
            for k, v in d.items()
        }
        return as_jnp(train), as_jnp(dev), False
    rng = np.random.default_rng(seed)
    def make(n):
        ids = rng.integers(4, vocab_size, (n, MAX_SEQ))
        if regression:
            labels = rng.uniform(0.0, 5.0, (n,)).astype(np.float32)
            ids[:, 1] = 4 + (labels * 4).astype(np.int64)  # score-binned token
        else:
            labels = rng.integers(0, n_labels, (n,))
            # plantable signal tokens (positions 1-8): dense enough that a
            # RANDOM-INIT bert-base learns it within a fine-tune budget (a
            # single signal token washes out through 12 random layers; the
            # reference's recipes presume pretrained weights)
            ids[:, 1:9] = (4 + labels * 7)[:, None]
            # 12% of examples are drawn from 8 AMBIGUOUS TEMPLATES: the
            # signal block interleaves every label's token symmetrically and
            # the filler positions are a constant per template, so rows
            # sharing a template are byte-identical while their gold labels
            # stay coin flips. The label is then irreducibly ~50/50 given
            # the input, a converged model must sit AT the decision
            # boundary, and MC weight draws genuinely flip the argmax —
            # exercising acc_std / ECE / predictive entropy for real.
            # Weaker constructions measured on-chip and rejected
            # (logs/artifact_r3*.log): evidence-free random-token rows leave
            # a fine-tuned bert-base overconfident (acc_std = 0 at delta
            # 0.05 AND 0.2), and per-row random fillers let the model
            # memorize each ambiguous row through its unique filler tokens.
            ambiguous = rng.random(n) < 0.12
            conf_tokens = 4 + (np.arange(8)[None, :] % n_labels) * 7
            ids[:, 1:9] = np.where(
                ambiguous[:, None], conf_tokens, ids[:, 1:9]
            )
            tmpl = rng.integers(0, 8, n)
            filler = np.broadcast_to(
                (vocab_size - 1 - tmpl)[:, None], (n, MAX_SEQ - 9)
            )
            ids[:, 9:] = np.where(
                ambiguous[:, None], filler, ids[:, 9:]
            )
        return {
            "input_ids": jnp.asarray(ids, jnp.int32),
            "attention_mask": jnp.ones((n, MAX_SEQ), jnp.int32),
            "token_type_ids": jnp.zeros((n, MAX_SEQ), jnp.int32),
            "labels": jnp.asarray(labels, label_dtype),
        }
    # large enough that a random-init bert-base must generalize to the
    # planted token rather than memorize the training set
    return make(2048), make(256), True


def batch_iter(data: dict, batch_size: int, seed: int | None = None):
    n = data["labels"].shape[0]
    idx = np.arange(n - n % batch_size)
    if seed is not None:
        np.random.default_rng(seed).shuffle(idx)
    for start in range(0, len(idx), batch_size):
        sel = idx[start : start + batch_size]
        yield {k: v[sel] for k, v in data.items()}


def train(
    exp: str = "bert_glue",
    model_name: str = "bert-base-uncased",
    delta: float = 0.05,
    weight_decay: float = 0.0,
    *,
    data: str | None = None,
    task: str = "mrpc",
    vocab: str | None = None,
    logs: str = "logs",
    epochs: int = EPOCHS,
    b_epochs: int = EPOCHS,
    samples: int = SAMPLES,
    batch_size: int = BATCH_SIZE,
    lr: float = LR,
    size: str = "base",
    bf16: bool = False,
    pretrained: str | None = None,
    seed: int = 0,
    limit_batches: int | None = None,
    fused: bool = True,
    save_dir: str | None = None,
    resume: bool = False,
    profile_dir: str | None = None,
    dp: int = 1,
    tp: int = 1,
    sp: int = 1,
    estimator: str | None = None,
    mc_chunk: int | None = None,
    independent_draws: bool = False,
    warmup: float = 0.0,
    _shared: dict | None = None,
) -> float:
    name = run_name(exp, delta=round(delta, 5), weight_decay=round(weight_decay, 6))
    writer = MetricsWriter(logs, name)
    dumper = Dumper(os.path.join(logs, name + ".results"))

    # One-compile hypersearch (VERDICT r4 #4): trials vary only delta (an
    # INIT-time value — same program) and weight_decay (injected into the
    # optimizer STATE, `training.adamw_with_decay_groups`), so every jitted
    # step, the model bundle, and the dataset can be built once and reused
    # across the search's train() calls. The driver passes one dict for the
    # whole search; a solo train() keeps a private dict (no sharing).
    cache = _shared if _shared is not None else {}

    def memo(key, builder):
        if key not in cache:
            cache[key] = builder()
        return cache[key]

    # Task-driven head + loss: the reference's `GlueDataset` accepts every
    # task generically (`examples/bert_glue.py:98-102`); here label count,
    # regression-ness, and the official metric all come from the registry.
    spec = glue_lib.task_spec(task)
    # default estimator: antithetic whenever S is even — identical objective
    # family, strictly lower MC variance, and the paired kernel generates
    # half the Gaussian noise (measured faster than plain fused; PERF.md)
    if estimator is None:
        anti_ok = samples % 2 == 0 and (mc_chunk is None or mc_chunk % 2 == 0)
        estimator = ("antithetic" if anti_ok else "fused") if fused else "naive"
    regression = spec.regression
    loss_fn = (
        training.regression_loss if regression else training.classification_loss
    )

    bundle = memo("bundle", lambda: bert_lib.build_model(
        model_name, task="classification", n_labels=spec.n_labels,
        pretrained=pretrained, size=size, seed=seed,
        dtype=jnp.bfloat16 if bf16 else jnp.float32,
    ))
    train_data, dev_data, synthetic = memo("data", lambda: load_glue(
        data, bundle.config.vocab_size, seed, task=task, vocab=vocab,
        n_labels=spec.n_labels, regression=regression,
    ))
    if synthetic:
        print("[bert_glue] no dataset found; using synthetic stand-in")
    n_batches = len(train_data["labels"]) // batch_size
    if limit_batches:
        n_batches = min(n_batches, limit_batches)
    # model-family input pruning (reference `bert_squad.py:184-185`)
    input_keys = ("input_ids", "attention_mask") + (
        ("token_type_ids",) if bundle.uses_token_type_ids else ()
    )

    # Multi-device mesh (supersedes the reference's 4-GPU DataParallel,
    # `examples/bert_squad.py:245`): dp shards the batch; tp shards the
    # Megatron way — GSPMD partitions the vmapped tier, while the fused
    # Pallas tier runs Megatron tp INSIDE shard_map (a Pallas kernel is a
    # black box to the partitioner; nn/fused.py inserts the f/g collectives
    # around the weight-sharded kernels itself).
    mesh = None
    use_shard_map = estimator in ("fused", "antithetic", "flipout", "local")
    tp_fused = False  # Megatron-sharded fused tier (shard_map dp x tp)
    if sp > 1 and use_shard_map:
        # GSPMD shards sequence by relabeling layouts; a Pallas kernel is a
        # black box to the partitioner, so the fused tier cannot ride it
        raise ValueError(
            "sp>1 requires the GSPMD tier (--estimator naive): sequence "
            "sharding is a GSPMD layout, opaque to the Pallas shard_map tier"
        )
    if dp != 1 or tp != 1 or sp != 1:
        if dp <= 0:
            dp = len(jax.devices()) // (tp * sp)
        if batch_size % dp:
            raise ValueError(f"batch_size {batch_size} must divide dp={dp}")
        tp_fused = use_shard_map and tp != 1
        mesh = mesh_lib.make_mesh(dp, tp, sp)
        print(f"[bert_glue] mesh dp={dp} tp={tp} sp={sp} "
              f"({'shard_map+Pallas' if use_shard_map else 'GSPMD'})")

    def shard(batch):
        return mesh_lib.shard_batch(batch, mesh) if mesh is not None else batch

    # ---------------- Phase A: frequentist fine-tune -----------------------
    params = bundle.params
    total_steps = max(1, n_batches * epochs)
    # ``warmup`` (fraction of total steps): linear warmup then linear decay.
    # The reference recipe has no warmup — defaults preserve that — but a
    # RANDOM-INIT post-LN BERT does not train without it (gradients stall at
    # init; the 2018 BERT recipe's warmup exists for this reason), so the
    # offline full-scale convergence runs enable it.
    def make_schedule(peak, total):
        w = int(total * warmup)
        if w <= 0:
            return optax.linear_schedule(peak, 0.0, total)
        return optax.join_schedules(
            [optax.linear_schedule(0.0, peak, w),
             optax.linear_schedule(peak, 0.0, total - w)], [w]
        )

    schedule = make_schedule(lr, total_steps)

    def frequentist_nll(logits, labels):
        if regression:
            return jnp.sum((logits[..., 0].astype(jnp.float32) - labels) ** 2)
        return bf.elbo.cross_entropy_sum(logits, labels)

    def _build_phase_a():
        tx = training.adamw_with_decay_groups(
            schedule, weight_decay, training.default_no_decay,
            eps=ADAM_EPSILON, clip_norm=CLIP_NORM,
        )

        @jax.jit
        def f_step(params, opt_state, batch):
            def objective(p):
                logits = bundle.apply_fn(p, **{k: batch[k] for k in input_keys})
                return frequentist_nll(logits, batch["labels"])
            loss, grads = jax.value_and_grad(objective)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        @jax.jit
        def f_eval(params, batch):
            logits = bundle.apply_fn(params, **{k: batch[k] for k in input_keys})
            nll = frequentist_nll(logits, batch["labels"])
            preds = (
                logits[..., 0].astype(jnp.float32)
                if regression
                else jnp.argmax(logits, -1)
            )
            return nll, preds

        return tx, f_step, f_eval

    tx, f_step, f_eval = memo("phase_a", _build_phase_a)
    # per-trial values into the SHARED program: fresh opt state, this
    # trial's weight_decay written into the injected hyperparams
    opt_state = training.set_weight_decay(tx.init(params), weight_decay)

    def eval_frequentist(params):
        report = Report("nll", "n")
        preds, labels = [], []
        for batch in batch_iter(dev_data, batch_size):
            nll, p = f_eval(params, batch)
            report.update(nll=float(nll), n=len(batch["labels"]))
            preds.append(np.asarray(p))
            labels.append(np.asarray(batch["labels"]))
        n = max(report.totals.pop("n"), 1)
        means = report.means(n)
        means.update(metrics_lib.glue_metrics(
            spec.metric, np.concatenate(preds), np.concatenate(labels)
        ))
        return means

    with dumper.section("frequentist"):
        for epoch in range(epochs):
            pbar = tqdm(batch_iter(train_data, batch_size, seed=seed + epoch),
                        total=n_batches, desc=f"freq {epoch}")
            for i, batch in enumerate(pbar):
                if limit_batches and i >= limit_batches:
                    break
                # under a mesh the sharded batch makes plain jit data-parallel
                # (GSPMD inserts the gradient all-reduce)
                params, opt_state, loss = f_step(params, opt_state, shard(batch))
                pbar.set_postfix(loss=float(loss))
            metrics = eval_frequentist(params)
            writer.scalars("frequentist_test", metrics, epoch)
            dumper.record(**{f"epoch_{epoch}_{k}": v for k, v in metrics.items()})
            print(f"[freq {epoch}] nll={metrics['nll']:.4f} "
                  f"{spec.metric}={metrics['score']:.4f}")

    # ---------------- Phase B: conversion ----------------------------------
    bmodel, bparams = bf.to_bayesian(
        bundle.apply_fn, params, delta=delta, freeze=True
    )
    if mesh is not None:
        if use_shard_map and not tp_fused:
            # dp-only shard_map tier: replicated params, batch-sharded step
            bparams = parallel_lib.replicate(bparams, mesh)
        else:
            # Megatron tp sharding (GSPMD tier, or the fused shard_map tp
            # tier which consumes the same per-leaf shardings)
            bparams = mesh_lib.shard_bayes_params(bparams, mesh)

    # checkpoint resume (gap-fill over the reference's save-only flow,
    # SURVEY.md §5): continue the Bayesian phase from the latest step
    start_epoch = 0
    if resume and save_dir:
        step_n = ckpt_lib.latest_step(save_dir)
        if step_n is not None:
            bparams, meta = ckpt_lib.load_checkpoint(save_dir, bparams, step=step_n)
            start_epoch = int(step_n)
            print(f"[bert_glue] resumed from {save_dir} step {step_n}")

    eval_step = memo("eval_step", lambda: training.make_elbo_eval_step(
        bmodel, samples, loss_fn=loss_fn, fused=fused, input_keys=input_keys,
        estimator=estimator,
    ))
    # per-example metric keys from loss_fn (acc/acc_std or mse/mse_std)
    sample_keys = ("mse", "mse_std") if regression else ("acc", "acc_std")

    def eval_bayesian(bparams, key):
        if tp_fused:
            # eval runs the single-device fused step; gather the Megatron
            # shards back to replicated once per eval (one all-gather)
            bparams = parallel_lib.replicate(bparams, mesh)
        report = Report("nll", *sample_keys, "log_prior",
                        "log_variational_posterior", "n")
        preds, labels, probs = [], [], []
        n_b = 0
        for batch in batch_iter(dev_data, batch_size):
            key, k = jax.random.split(key)
            out, m = eval_step(bparams, k, batch)
            bsz = len(batch["labels"])
            report.update(
                nll=float(m["nll"]),
                **{k2: float(m[k2]) * bsz for k2 in sample_keys},
                log_prior=float(m["log_prior"]),
                log_variational_posterior=float(m["log_variational_posterior"]),
                n=bsz,
            )
            mean_out = np.asarray(bf.elbo.mc_logits_mean(out), np.float32)
            preds.append(mean_out[..., 0] if regression else mean_out.argmax(-1))
            if not regression:
                # MC-averaged predictive probabilities for calibration
                probs.append(np.asarray(
                    jnp.mean(jax.nn.softmax(out.astype(jnp.float32), -1), 0)
                ))
            labels.append(np.asarray(batch["labels"]))
            n_b += 1
        n = max(report.totals.pop("n"), 1)
        means = report.means(n)
        for tag in ("log_prior", "log_variational_posterior"):
            means[tag] = means[tag] * n / max(n_b, 1)  # per-batch scalars
        means.update(metrics_lib.glue_metrics(
            spec.metric, np.concatenate(preds), np.concatenate(labels)
        ))
        if not regression:
            # calibration of the posterior predictive (extension; the
            # reference reports only acc_std, `examples/bert_glue.py:186`)
            means["ece"] = metrics_lib.expected_calibration_error(
                np.concatenate(probs), np.concatenate(labels)
            )
        return means

    # ---------------- Phase C: Bayesian eval -------------------------------
    key = jax.random.key(seed + 1)
    with dumper.section("bayesian_eval"):
        key, k = jax.random.split(key)
        metrics = eval_bayesian(bparams, k)
        writer.scalars("bayesian_eval", metrics, 0)
        dumper.record(**metrics)
        print(f"[baye eval] {spec.metric}={metrics['score']:.4f} "
              f"{sample_keys[1]}={metrics[sample_keys[1]]:.4f}")

    # ---------------- Phase D: Bayesian ELBO fine-tune ---------------------
    b_total = max(1, n_batches * b_epochs)
    b_schedule = make_schedule(lr, b_total)

    def _build_phase_d():
        base_tx = training.adamw_with_decay_groups(
            b_schedule, weight_decay, training.default_no_decay,
            eps=ADAM_EPSILON,
            # with Megatron-sharded weights an in-tx clip would compute a
            # LOCAL norm per device; the trainer clips sharded-aware instead
            clip_norm=None if tp_fused else CLIP_NORM,
        )
        btx = masked_optimizer(base_tx, bmodel.trainable_mask(bparams))
        if mesh is not None and use_shard_map:
            # Pallas kernels are opaque to the GSPMD partitioner; shard_map
            # runs the single-device fused/flipout step per dp shard with an
            # explicit psum (and Megatron f/g collectives over tp when tp>1)
            b_step = parallel_lib.make_train_step(
                bmodel, btx, samples, n_batches, mesh, loss_fn=loss_fn,
                fused=fused, input_keys=input_keys, estimator=estimator,
                mc_chunk=mc_chunk, independent_draws=independent_draws,
                clip_norm=CLIP_NORM if tp_fused else None,
            )
        else:
            b_step = training.make_elbo_train_step(
                bmodel, btx, samples, n_batches, loss_fn=loss_fn, fused=fused,
                input_keys=input_keys, estimator=estimator, mc_chunk=mc_chunk,
            )
        return btx, b_step

    btx, b_step = memo("phase_d", _build_phase_d)
    b_opt_state = training.set_weight_decay(btx.init(bparams), weight_decay)

    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    with dumper.section("bayesian_train"):
        for epoch in range(start_epoch, b_epochs):
            pbar = tqdm(batch_iter(train_data, batch_size, seed=seed + 100 + epoch),
                        total=n_batches, desc=f"baye {epoch}")
            for i, batch in enumerate(pbar):
                if limit_batches and i >= limit_batches:
                    break
                key, k = jax.random.split(key)
                bparams, b_opt_state, m = b_step(
                    bparams, b_opt_state, k, shard(batch)
                )
                pbar.set_postfix(loss=float(m["loss"]),
                                 **{sample_keys[0]: float(m[sample_keys[0]])})
            key, k = jax.random.split(key)
            metrics = eval_bayesian(bparams, k)
            writer.scalars("bayesian_test", metrics, epoch)
            dumper.record(**{f"epoch_{epoch}_{k2}": v for k2, v in metrics.items()})
            print(f"[baye {epoch}] nll={metrics['nll']:.4f} "
                  f"{spec.metric}={metrics['score']:.4f} "
                  f"{sample_keys[1]}={metrics[sample_keys[1]]:.4f}")
            if save_dir:
                ckpt_lib.save_checkpoint(
                    save_dir, bparams, step=epoch + 1,
                    metadata={"delta": delta, "weight_decay": weight_decay,
                              **metrics},
                )
    if profile_dir:
        jax.profiler.stop_trace()

    if start_epoch >= b_epochs and start_epoch > 0:
        # resumed past the end of the Bayesian phase: the loop never ran, so
        # evaluate the restored parameters (regardless of save_dir) instead of
        # returning the stale phase-C value
        key, k = jax.random.split(key)
        metrics = eval_bayesian(bparams, k)
        writer.scalars("bayesian_test", metrics, start_epoch)
    writer.close()
    dumper.flush()
    return float(metrics["score"])


def main():
    parser = argparse.ArgumentParser(description="Bayesian BERT on GLUE (TPU)")
    parser.add_argument("--exp", default="bert_glue")
    parser.add_argument("--model", default="bert-base-uncased")
    parser.add_argument("--data", default=None,
                        help=".npz of tokenized GLUE, or a task dir of raw TSVs")
    parser.add_argument("--task", default="mrpc",
                        help="GLUE task name for raw-TSV featurization")
    parser.add_argument("--vocab", default=None,
                        help="vocab.txt for the native tokenizer (raw TSVs)")
    parser.add_argument("--pretrained", default=None,
                        help="local HF checkpoint path (offline env)")
    parser.add_argument("--size", default="base", choices=["base", "tiny"])
    parser.add_argument("--logs", default="logs")
    parser.add_argument("--epochs", type=int, default=EPOCHS)
    parser.add_argument("--b-epochs", type=int, default=EPOCHS)
    parser.add_argument("--samples", type=int, default=SAMPLES)
    parser.add_argument("--batch-size", type=int, default=BATCH_SIZE)
    parser.add_argument("--lr", type=float, default=LR)
    parser.add_argument("--delta", type=float, default=0.05)
    parser.add_argument("--weight-decay", type=float, default=0.0)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--limit-batches", type=int, default=None)
    parser.add_argument("--no-fused", action="store_true")
    parser.add_argument("--mc-chunk", type=int, default=None,
                        help="run the S MC samples in chunks of this size "
                             "with gradient accumulation (memory lever for "
                             "large batch/seq configs)")
    parser.add_argument("--estimator", default=None,
                        choices=["fused", "naive", "flipout", "antithetic", "local"],
                        help="MC gradient estimator for the Bayesian phase "
                             "(flipout: per-example decorrelated "
                             "perturbations — try --samples 1; antithetic: "
                             "± paired weight draws, even --samples)")
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 activations (variational numerics stay f32)")
    parser.add_argument("--save-dir", default=None)
    parser.add_argument("--resume", action="store_true",
                        help="continue the Bayesian phase from --save-dir")
    parser.add_argument("--profile-dir", default=None,
                        help="write a jax profiler trace of the Bayesian phase")
    parser.add_argument("--dp", type=int, default=1,
                        help="data-parallel mesh size (0 = all devices / tp)")
    parser.add_argument("--tp", type=int, default=1,
                        help="tensor-parallel mesh size (Megatron sharding; "
                             "works with the fused Pallas tier via shard_map "
                             "and with the GSPMD tier)")
    parser.add_argument("--sp", type=int, default=1,
                        help="sequence-parallel mesh size (GSPMD tier only: "
                             "shards the token axis of every rank>=2 batch "
                             "leaf; XLA inserts attention's collectives)")
    parser.add_argument("--warmup", type=float, default=0.0,
                        help="linear-warmup fraction of total steps (0 = "
                             "reference behavior; random-init models need "
                             "~0.1)")
    parser.add_argument("--independent-draws", action="store_true",
                        help="each dp shard draws its own MC sample set "
                             "(reference DataParallel semantics; S x dp "
                             "effective samples)")
    parser.add_argument("--hypersearch", type=int, default=0,
                        help="run N random-search trials over delta/weight_decay")
    args = parser.parse_args()

    kwargs = dict(
        exp=args.exp, model_name=args.model, data=args.data, task=args.task,
        vocab=args.vocab, logs=args.logs,
        epochs=args.epochs, b_epochs=args.b_epochs, samples=args.samples,
        batch_size=args.batch_size, lr=args.lr, size=args.size, bf16=args.bf16,
        pretrained=args.pretrained, seed=args.seed,
        limit_batches=args.limit_batches, fused=not args.no_fused,
        save_dir=args.save_dir, resume=args.resume,
        profile_dir=args.profile_dir, dp=args.dp, tp=args.tp, sp=args.sp,
        estimator=args.estimator, mc_chunk=args.mc_chunk,
        independent_draws=args.independent_draws, warmup=args.warmup,
    )
    t0 = time.time()
    if args.hypersearch:
        # reference driver: DELTA log-scale (1e-2, 1e-1), WEIGHT_DECAY linear
        # in (1e-3, 0) — i.e. uniform over [0, 1e-3], zero included —
        # 10 iterations (`examples/bert_glue.py:324-331`)
        hs = HyperSearch(seed=args.seed)
        hs["delta"] = (1e-2, 1e-1), HyperSearch.LOG_SCALE
        hs["weight_decay"] = (0.0, 1e-3), HyperSearch.LINEAR_SCALE
        # one _shared dict across trials: every jitted step compiles once
        # (delta is init-only, weight_decay is optimizer state)
        best = hs.search(train, iterations=args.hypersearch, _shared={},
                         **kwargs)
        print(f"best acc={best.value:.4f} with {best.hyperparameters}")
    else:
        score = train(delta=args.delta, weight_decay=args.weight_decay, **kwargs)
        print(f"final score={score:.4f}")
    print(f"done in {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
