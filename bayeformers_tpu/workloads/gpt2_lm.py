"""GPT-2 causal-LM workload — the 4-phase recipe on a decoder family.

Extension beyond the reference's encoder-only examples: same phase
structure as `examples/mlp_mnist.py` / `examples/bert_glue.py` (frequentist
fine-tune → MOPED `to_bayesian` → Bayesian MC eval → ELBO train), applied
to next-token prediction with FlaxGPT2LMHeadModel (models/gpt2.py).

Data is the synthetic Markov language from models/gpt2.py: a fixed random
successor table followed with probability ``order_frac`` per step, so the
Bayes-optimal next-token accuracy is ``order_frac + (1-order_frac)/V`` and
convergence is checkable against a known ceiling (a memorizing model
cannot beat it). Pass ``--corpus path/to/text(.txt|dir)`` to train on real
text instead, tokenized by the native GPT-2 BPE tier
(`utils/data.py::load_lm_corpus`; artifacts via ``make gpt2-bootstrap``).

Uncertainty metrics mirror the GLUE workload's: ``acc_std`` is the std of
per-draw next-token accuracy across the S Monte-Carlo draws
(`examples/bert_glue.py:185-186` semantics), plus mean per-token
predictive entropy of the S-averaged distribution.
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from tqdm import tqdm

import bayeformers_tpu as bf
from bayeformers_tpu import training
from bayeformers_tpu.models import gpt2 as gpt2_lib
from bayeformers_tpu.parallel import mesh as mesh_lib
from bayeformers_tpu.parallel import train as parallel_lib
from bayeformers_tpu.utils.dumper import Dumper
from bayeformers_tpu.utils.metrics import (MetricsWriter, Report,
                                            ece_from_confidence, run_name)
from bayeformers_tpu.utils.optim import masked_optimizer

EPOCHS = 1
B_EPOCHS = 1
SAMPLES = 10
BATCH_SIZE = 8
SEQ = 128
LR = 5e-5
DELTA = 0.05
ORDER_FRAC = 0.85


def lm_nll_sum(logits: jax.Array, input_ids: jax.Array) -> jax.Array:
    """Sum-reduced next-token cross entropy: position t predicts t+1."""
    lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = input_ids[:, 1:]
    picked = jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
    return -jnp.sum(picked)


def lm_loss(out, batch):
    """make_train_step-contract loss: (sum NLL, per-example metrics)."""
    ids = batch["input_ids"]
    nll = lm_nll_sum(bf.elbo.mc_logits_mean(out), ids)
    acc, acc_std, _ = lm_accuracy_and_std(out, ids)
    return nll, {"acc": acc, "acc_std": acc_std}


def lm_accuracy_and_std(mc_logits: jax.Array, input_ids: jax.Array):
    """(next-token acc of the S-averaged logits, std of per-draw accs,
    mean predictive entropy of the S-averaged distribution)."""
    tgt = input_ids[:, 1:]
    mean_logits = bf.elbo.mc_logits_mean(mc_logits)[:, :-1]
    acc = jnp.mean((jnp.argmax(mean_logits, -1) == tgt).astype(jnp.float32))
    per_draw = jnp.mean(
        (jnp.argmax(mc_logits[:, :, :-1], -1) == tgt[None]).astype(jnp.float32),
        axis=(1, 2),
    )
    probs = jax.nn.softmax(mean_logits.astype(jnp.float32), -1)
    entropy = -jnp.mean(
        jnp.sum(probs * jnp.log(jnp.clip(probs, 1e-12)), axis=-1)
    )
    return acc, jnp.std(per_draw), entropy


def train(
    exp: str | None = None,
    model: str = "gpt2",
    logs: str = "logs",
    epochs: int = EPOCHS,
    b_epochs: int = B_EPOCHS,
    samples: int = SAMPLES,
    batch_size: int = BATCH_SIZE,
    seq: int = SEQ,
    n_train: int = 512,
    n_test: int = 128,
    lr: float = LR,
    delta: float = DELTA,
    order_frac: float = ORDER_FRAC,
    seed: int = 0,
    size: str = "base",
    estimator: str = "naive",
    limit_batches: int | None = None,
    bf16: bool = False,
    dp: int = 1,
    tp: int = 1,
    mc_chunk: int | None = None,
    independent_draws: bool = False,
    corpus: str | None = None,
    **config_overrides,
) -> dict[str, float]:
    exp = exp or f"{model}_lm"
    rng = np.random.default_rng(seed)
    # Multi-chip mesh: dp shards the batch (GSPMD in phase A, shard_map+psum
    # in phase D); tp Megatron-shards the projection kernels per the
    # family's rules (parallel/mesh.py::family_tp_fns). GPT-2's packed
    # c_attn is first permuted head-aligned (permute_gpt2_qkv) so the fused
    # tier's local q/k/v split lands on whole heads; the LLaMA-architecture
    # families (llama/mistral/gemma) have separate per-head-aligned q/k/v
    # projections and need no permutation.
    mesh = None
    tp_fused = False
    if dp != 1 or tp != 1:
        if dp <= 0:
            dp = len(jax.devices()) // tp
        if batch_size % dp:
            raise ValueError(f"batch_size {batch_size} must divide dp={dp}")
        # fused/antithetic ride shard_map (Pallas kernels are opaque to the
        # GSPMD partitioner) and need the head-aligned c_attn permutation;
        # the naive tier rides GSPMD, where sharding is layout-only and the
        # packed c_attn shards correctly without it
        tp_fused = tp > 1 and estimator in ("fused", "antithetic")
        mesh = mesh_lib.make_mesh(dp, tp)
        print(f"[{exp}] mesh dp={dp} tp={tp}")

    def shard(tree):
        return mesh_lib.shard_batch(tree, mesh) if mesh is not None else tree
    from bayeformers_tpu.models.bert import build_model

    corpus_split = None
    if corpus is not None:
        from bayeformers_tpu.utils.data import load_lm_corpus

        corpus_split = load_lm_corpus(corpus, seq, seed=seed)
        # the embedding/LM-head must cover the tokenizer's id space
        config_overrides.setdefault("vocab_size", corpus_split[2])

    bundle = build_model(
        model, size=size, seed=seed,
        dtype=jnp.bfloat16 if bf16 else jnp.float32, **config_overrides,
    )
    # GPT-2's packed c_attn needs the head-aligned permutation under fused
    # tp; the llama-architecture families do not
    needs_qkv_perm = model.startswith("gpt")
    vocab = bundle.config.vocab_size
    if corpus_split is not None:
        tr, te, tok_vocab, _ = corpus_split
        if tok_vocab > vocab:
            raise ValueError(
                f"tokenizer vocab {tok_vocab} exceeds model vocab {vocab}"
            )
        train_ids = jnp.asarray(tr[:n_train] if n_train else tr)
        test_ids = jnp.asarray(te[:n_test] if n_test else te)
        n_train, n_test = len(train_ids), len(test_ids)
        bayes_rate = None  # unknown for real text
    else:
        train_ids = gpt2_lib.synthetic_lm_batch(
            rng, n_train, seq, vocab, order_frac
        )["input_ids"]
        test_batch = gpt2_lib.synthetic_lm_batch(
            rng, n_test, seq, vocab, order_frac
        )
        test_ids = test_batch["input_ids"]
        bayes_rate = order_frac + (1 - order_frac) / vocab
    n_batches = max(1, n_train // batch_size)
    if limit_batches:
        n_batches = min(n_batches, limit_batches)
    n_tok = n_test * (seq - 1)

    writer = MetricsWriter(logs, run_name(exp, delta=delta))
    dumper = Dumper(f"{logs}/{run_name(exp, delta=delta)}.results")
    apply_fn, params = bundle.apply_fn, bundle.params

    # ---------------- Phase 1: frequentist train ---------------------------
    tx = optax.adamw(lr)
    opt_state = tx.init(params)

    @jax.jit
    def f_step(params, opt_state, ids):
        def loss_fn(p):
            return lm_nll_sum(apply_fn(p, ids), ids)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def f_eval(params, ids):
        logits = apply_fn(params, ids)
        nll = lm_nll_sum(logits, ids)
        acc = jnp.mean(
            (jnp.argmax(logits[:, :-1], -1) == ids[:, 1:]).astype(jnp.float32)
        )
        return nll, acc

    def epoch_batches(ep):
        order = np.random.default_rng(seed + ep).permutation(len(train_ids))
        for i in range(n_batches):
            yield train_ids[order[i * batch_size:(i + 1) * batch_size]]

    with dumper.section("frequentist_train"):
        for epoch in range(epochs):
            report = Report("nll")
            for ids in tqdm(epoch_batches(epoch), total=n_batches,
                            desc=f"freq train {epoch}"):
                # under a mesh the sharded batch makes plain jit
                # data-parallel (GSPMD inserts the gradient all-reduce)
                params, opt_state, loss = f_step(params, opt_state,
                                                 shard(jnp.asarray(ids)))
                report.update(nll=float(loss))
            nll, acc = f_eval(params, test_ids)
            metrics = {"nll": float(nll) / n_tok, "acc": float(acc)}
            if bayes_rate is not None:
                metrics["bayes_rate"] = bayes_rate
            writer.scalars("frequentist", metrics, epoch)
            dumper.record(**{f"epoch_{epoch}_{k}": v for k, v in metrics.items()})
            ceiling = (f" (bayes rate {bayes_rate:.4f})"
                       if bayes_rate is not None else "")
            print(f"[freq {epoch}] nll/tok={metrics['nll']:.4f} "
                  f"acc={metrics['acc']:.4f}{ceiling}")
    freq_acc = metrics["acc"]

    # ---------------- Phase 2: MOPED conversion ----------------------------
    bmodel, bparams = bf.to_bayesian(apply_fn, params, delta=delta, freeze=True)
    if mesh is not None:
        if tp_fused:
            # head-aligned packed-QKV layout (GPT-2 only), then Megatron shards
            if needs_qkv_perm:
                bparams = mesh_lib.permute_gpt2_qkv(bparams, tp)
            bparams = mesh_lib.shard_bayes_params(bparams, mesh)
        elif tp > 1:
            # GSPMD tier: plain specs, no permutation (layout-only)
            bparams = mesh_lib.shard_bayes_params(bparams, mesh)
        elif estimator != "naive":
            bparams = parallel_lib.replicate(bparams, mesh)

    # ---------------- Phase 3 & 4: Bayesian eval + ELBO train --------------
    mc = training.pick_mc(bmodel, fused=estimator != "naive",
                          estimator=estimator)

    def eval_view(bparams):
        """Single-device-layout params for the jitted eval: tp shards are
        gathered (one all-gather per eval) and the packed-QKV permutation
        undone so the stock attention split applies."""
        if tp_fused:
            full = parallel_lib.replicate(bparams, mesh)
            if needs_qkv_perm:
                full = mesh_lib.permute_gpt2_qkv(full, tp, inverse=True)
            return full
        return bparams

    @jax.jit
    def b_eval(bparams, key, ids):
        out, aux = mc(bparams, key, samples, ids)
        nll = lm_nll_sum(bf.elbo.mc_logits_mean(out), ids)
        acc, acc_std, entropy = lm_accuracy_and_std(out, ids)
        # next-token calibration inputs, reduced IN-jit to two flat vectors
        # (the full (B*L, V) predictive would be gigabytes at GPT-2 vocab)
        probs = jnp.mean(
            jax.nn.softmax(out[:, :, :-1].astype(jnp.float32), -1), axis=0
        )
        conf = jnp.max(probs, axis=-1).reshape(-1)
        correct = (jnp.argmax(probs, -1) == ids[:, 1:]).reshape(-1)
        return nll, acc, acc_std, entropy, (conf, correct), aux

    btx = masked_optimizer(optax.adamw(lr), bmodel.trainable_mask(bparams))
    b_opt_state = btx.init(bparams)

    if mesh is not None and estimator != "naive":
        _pstep = parallel_lib.make_train_step(
            bmodel, btx, samples, n_batches, mesh, loss_fn=lm_loss,
            input_keys=("input_ids",), estimator=estimator,
            mc_chunk=mc_chunk, independent_draws=independent_draws,
        )

        def b_step(bparams, opt_state, key, ids):
            bp2, opt2, m = _pstep(
                bparams, opt_state, key, shard({"input_ids": ids})
            )
            return bp2, opt2, m["loss"], m["nll"]
    else:
        @jax.jit
        def b_step(bparams, opt_state, key, ids):
            def loss_fn(bp):
                out, aux = mc(bp, key, samples, ids)
                nll = lm_nll_sum(bf.elbo.mc_logits_mean(out), ids)
                loss = bf.elbo.elbo_loss(
                    nll, aux["log_prior"], aux["log_variational_posterior"],
                    n_batches,
                )
                return loss, nll

            (loss, nll), grads = jax.value_and_grad(loss_fn, has_aux=True)(bparams)
            updates, opt_state = btx.update(grads, opt_state, bparams)
            return optax.apply_updates(bparams, updates), opt_state, loss, nll

    key = jax.random.key(seed + 1)
    with dumper.section("bayesian_eval"):
        key, k = jax.random.split(key)
        nll, acc, acc_std, entropy, cc, aux = b_eval(eval_view(bparams),
                                                     k, test_ids)
        metrics = {
            "nll": float(nll) / n_tok, "acc": float(acc),
            "acc_std": float(acc_std), "entropy": float(entropy),
            "ece": ece_from_confidence(*cc),
            "log_prior": float(jnp.mean(aux["log_prior"])),
            "log_variational_posterior": float(
                jnp.mean(aux["log_variational_posterior"])
            ),
        }
        writer.scalars("bayesian_eval", metrics, 0)
        dumper.record(**metrics)
        print(f"[baye eval] acc={metrics['acc']:.4f} "
              f"acc_std={metrics['acc_std']:.4f} H={metrics['entropy']:.4f}")
    moped_acc = metrics["acc"]

    with dumper.section("bayesian_train"):
        for epoch in range(b_epochs):
            report = Report("loss", "nll")
            for ids in tqdm(epoch_batches(100 + epoch), total=n_batches,
                            desc=f"baye train {epoch}"):
                key, k = jax.random.split(key)
                bparams, b_opt_state, loss, nll = b_step(
                    bparams, b_opt_state, k, shard(jnp.asarray(ids))
                )
                report.update(loss=float(loss), nll=float(nll))
            key, k = jax.random.split(key)
            nll, acc, acc_std, entropy, cc, aux = b_eval(
                eval_view(bparams), k, test_ids
            )
            metrics = {"nll": float(nll) / n_tok, "acc": float(acc),
                       "acc_std": float(acc_std), "entropy": float(entropy),
                       "ece": ece_from_confidence(*cc)}
            writer.scalars("bayesian", metrics, epoch)
            dumper.record(**{f"epoch_{epoch}_{k2}": v
                             for k2, v in metrics.items()})
            print(f"[baye {epoch}] acc={metrics['acc']:.4f} "
                  f"acc_std={metrics['acc_std']:.4f}")

    writer.close()
    dumper.flush()
    return {
        "freq_acc": freq_acc, "moped_acc": moped_acc,
        "bayesian_acc": metrics["acc"], "acc_std": metrics["acc_std"],
        **({"bayes_rate": bayes_rate} if bayes_rate is not None else {}),
    }


def main():
    parser = argparse.ArgumentParser(
        description="Bayesian causal LM (TPU): GPT-2 or a LLaMA-architecture "
                    "family (llama/mistral/gemma, models/llama.py)"
    )
    parser.add_argument("--model", default="gpt2",
                        choices=["gpt2", "llama", "mistral", "gemma"])
    parser.add_argument("--logs", default="logs")
    parser.add_argument("--epochs", type=int, default=EPOCHS)
    parser.add_argument("--b-epochs", type=int, default=B_EPOCHS)
    parser.add_argument("--samples", type=int, default=SAMPLES)
    parser.add_argument("--batch-size", type=int, default=BATCH_SIZE)
    parser.add_argument("--seq", type=int, default=SEQ)
    parser.add_argument("--n-train", type=int, default=512)
    parser.add_argument("--n-test", type=int, default=128)
    parser.add_argument("--lr", type=float, default=LR)
    parser.add_argument("--delta", type=float, default=DELTA)
    parser.add_argument("--order-frac", type=float, default=ORDER_FRAC)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--size", default="base", choices=["base", "tiny"])
    parser.add_argument("--estimator", default="naive",
                        choices=["naive", "fused", "flipout", "antithetic", "local"])
    parser.add_argument("--limit-batches", type=int, default=None)
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--dp", type=int, default=1,
                        help="data-parallel mesh size (0 = all devices / tp)")
    parser.add_argument("--tp", type=int, default=1,
                        help="Megatron tensor parallelism (fused tier; the "
                             "packed c_attn is head-align permuted)")
    parser.add_argument("--mc-chunk", type=int, default=None)
    parser.add_argument("--independent-draws", action="store_true")
    parser.add_argument("--corpus", default=None,
                        help="real-text corpus (.txt file or directory); "
                             "tokenized by the native GPT-2 BPE tier, "
                             "replaces the synthetic Markov language")
    args = parser.parse_args()
    t0 = time.time()
    results = train(
        model=args.model,
        logs=args.logs, epochs=args.epochs, b_epochs=args.b_epochs,
        samples=args.samples, batch_size=args.batch_size, seq=args.seq,
        n_train=args.n_train, n_test=args.n_test, lr=args.lr,
        delta=args.delta, order_frac=args.order_frac, seed=args.seed,
        size=args.size, estimator=args.estimator,
        limit_batches=args.limit_batches, bf16=args.bf16,
        dp=args.dp, tp=args.tp, mc_chunk=args.mc_chunk,
        independent_draws=args.independent_draws, corpus=args.corpus,
    )
    print(f"done in {time.time()-t0:.1f}s: {results}")


if __name__ == "__main__":
    main()
