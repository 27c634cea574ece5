"""MNIST MLP workload — TPU reproduction of `examples/mlp_mnist.py`.

Phase-for-phase parity with the reference script (SURVEY.md §3.3):

1. frequentist train (Adam lr=1e-3, NLL-sum on log-softmax outputs,
   EPOCHS=1, BATCH=64 — `examples/mlp_mnist.py:30-35`),
2. ``to_bayesian(model, delta=0.05)`` MOPED conversion (`mlp_mnist.py:78`),
3. Bayesian eval with S=10 MC samples,
4. Bayesian ELBO train.

Deliberate divergences from the reference (SURVEY.md quirks): the Bayesian
phase gets a *fresh* optimizer over the Bayesian parameters with proper
zero-grad semantics (the reference reuses the frequentist optimizer and
never steps the converted model, Q5), and the KL term is differentiable (Q1).
Data: real MNIST idx files under --data-dir if present, else a synthetic
stand-in (zero-egress environments).
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
from bayeformers_tpu.models.mlp import make_mlp
from bayeformers_tpu.utils import data as data_lib
from bayeformers_tpu.utils.dumper import Dumper
from bayeformers_tpu.utils.metrics import MetricsWriter, Report, run_name
from bayeformers_tpu.utils.optim import masked_optimizer

# Reference constants (`examples/mlp_mnist.py:30-35`)
EPOCHS = 1
B_EPOCHS = 1
SAMPLES = 10
BATCH_SIZE = 64
LR = 1e-3
DELTA = 0.05


def train(
    exp: str = "mlp_mnist",
    data_dir: str = "dataset/mnist",
    logs: str = "logs",
    epochs: int = EPOCHS,
    b_epochs: int = B_EPOCHS,
    samples: int = SAMPLES,
    batch_size: int = BATCH_SIZE,
    lr: float = LR,
    delta: float = DELTA,
    seed: int = 0,
    limit_batches: int | None = None,
    estimator: str = "naive",
) -> dict[str, float]:
    x_train, y_train, x_test, y_test, synthetic = data_lib.load_mnist(data_dir)
    if synthetic:
        print("[mlp_mnist] MNIST not found; using synthetic stand-in data")
    n_batches = data_lib.num_batches(len(x_train), batch_size)
    if limit_batches:
        n_batches = min(n_batches, limit_batches)

    writer = MetricsWriter(logs, run_name(exp, delta=delta))
    dumper = Dumper(f"{logs}/{run_name(exp, delta=delta)}.results")
    apply_fn, params = make_mlp(jax.random.key(seed), input_dim=x_train.shape[-1])

    # ---------------- Phase 1: frequentist train ---------------------------
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def f_step(params, opt_state, x, y):
        def loss_fn(p):
            log_probs = apply_fn(p, x)
            return bf.elbo.nll_sum_from_log_probs(log_probs, y)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def f_eval(params, x, y):
        log_probs = apply_fn(params, x)
        acc = jnp.mean((jnp.argmax(log_probs, -1) == y).astype(jnp.float32))
        return bf.elbo.nll_sum_from_log_probs(log_probs, y), acc

    with dumper.section("frequentist_train"):
        for epoch in range(epochs):
            report = Report("nll", "acc")
            pbar = tqdm(
                data_lib.batches(x_train, y_train, batch_size, seed=seed + epoch),
                total=n_batches, desc=f"freq train {epoch}",
            )
            for i, (x, y) in enumerate(pbar):
                if limit_batches and i >= limit_batches:
                    break
                params, opt_state, loss = f_step(params, opt_state, jnp.asarray(x), jnp.asarray(y))
                acc = None
                report.update(nll=float(loss), n=len(x))
            nll, acc = f_eval(params, jnp.asarray(x_test), jnp.asarray(y_test))
            metrics = {"nll": float(nll) / len(x_test), "acc": float(acc)}
            writer.scalars("frequentist", metrics, epoch)
            dumper.record(**{f"epoch_{epoch}_{k}": v for k, v in metrics.items()})
            print(f"[freq {epoch}] test nll={metrics['nll']:.4f} acc={metrics['acc']:.4f}")
    freq_acc = metrics["acc"]

    # ---------------- Phase 2: MOPED conversion ----------------------------
    bmodel, bparams = bf.to_bayesian(apply_fn, params, delta=delta)

    # ---------------- Phase 3 & 4: Bayesian eval + ELBO train --------------
    mc = training.pick_mc(bmodel, fused=False, estimator=estimator)

    @jax.jit
    def b_eval(bparams, key, x, y):
        out, aux = mc(bparams, key, samples, x)
        nll = bf.elbo.nll_sum_from_log_probs(bf.elbo.mc_logits_mean(out), y)
        acc, acc_std = bf.elbo.accuracy_and_std(out, y)
        return nll, acc, acc_std, aux

    btx = masked_optimizer(optax.adam(lr), bmodel.trainable_mask(bparams))
    b_opt_state = btx.init(bparams)

    @jax.jit
    def b_step(bparams, opt_state, key, x, y):
        def loss_fn(bp):
            out, aux = mc(bp, key, samples, x)
            nll = bf.elbo.nll_sum_from_log_probs(bf.elbo.mc_logits_mean(out), y)
            loss = bf.elbo.elbo_loss(
                nll, aux["log_prior"], aux["log_variational_posterior"], n_batches
            )
            return loss, (nll, aux)

        (loss, (nll, aux)), grads = jax.value_and_grad(loss_fn, has_aux=True)(bparams)
        updates, opt_state = btx.update(grads, opt_state, bparams)
        return optax.apply_updates(bparams, updates), opt_state, loss, nll, aux

    key = jax.random.key(seed + 1)
    with dumper.section("bayesian_eval"):
        key, k = jax.random.split(key)
        nll, acc, acc_std, aux = b_eval(bparams, k, jnp.asarray(x_test), jnp.asarray(y_test))
        metrics = {
            "nll": float(nll) / len(x_test), "acc": float(acc),
            "acc_std": float(acc_std),
            "log_prior": float(aux["log_prior"].mean()),
            "log_variational_posterior": float(aux["log_variational_posterior"].mean()),
        }
        writer.scalars("bayesian_eval", metrics, 0)
        dumper.record(**metrics)
        print(f"[baye eval] acc={metrics['acc']:.4f} acc_std={metrics['acc_std']:.4f}")
    moped_acc = metrics["acc"]

    with dumper.section("bayesian_train"):
        for epoch in range(b_epochs):
            report = Report("loss", "nll")
            pbar = tqdm(
                data_lib.batches(x_train, y_train, batch_size, seed=seed + 100 + epoch),
                total=n_batches, desc=f"baye train {epoch}",
            )
            for i, (x, y) in enumerate(pbar):
                if limit_batches and i >= limit_batches:
                    break
                key, k = jax.random.split(key)
                bparams, b_opt_state, loss, nll, aux = b_step(
                    bparams, b_opt_state, k, jnp.asarray(x), jnp.asarray(y)
                )
                report.update(loss=float(loss), nll=float(nll))
                pbar.set_postfix(loss=float(loss))
            key, k = jax.random.split(key)
            nll, acc, acc_std, aux = b_eval(bparams, k, jnp.asarray(x_test), jnp.asarray(y_test))
            metrics = {
                "nll": float(nll) / len(x_test), "acc": float(acc),
                "acc_std": float(acc_std),
            }
            writer.scalars("bayesian", metrics, epoch)
            dumper.record(**{f"epoch_{epoch}_{k}": v for k, v in metrics.items()})
            print(f"[baye {epoch}] test nll={metrics['nll']:.4f} acc={metrics['acc']:.4f} "
                  f"acc_std={metrics['acc_std']:.4f}")

    writer.close()
    dumper.flush()
    return {"freq_acc": freq_acc, "moped_acc": moped_acc, "bayesian_acc": metrics["acc"],
            "acc_std": metrics["acc_std"]}


def main():
    parser = argparse.ArgumentParser(description="Bayesian MLP on MNIST (TPU)")
    parser.add_argument("--data-dir", default="dataset/mnist")
    parser.add_argument("--logs", default="logs")
    parser.add_argument("--epochs", type=int, default=EPOCHS)
    parser.add_argument("--b-epochs", type=int, default=B_EPOCHS)
    parser.add_argument("--samples", type=int, default=SAMPLES)
    parser.add_argument("--batch-size", type=int, default=BATCH_SIZE)
    parser.add_argument("--lr", type=float, default=LR)
    parser.add_argument("--delta", type=float, default=DELTA)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--limit-batches", type=int, default=None)
    parser.add_argument("--estimator", default="naive",
                        choices=["naive", "fused", "flipout", "antithetic", "local"])
    args = parser.parse_args()
    t0 = time.time()
    results = train(
        data_dir=args.data_dir, logs=args.logs, epochs=args.epochs,
        b_epochs=args.b_epochs, samples=args.samples, batch_size=args.batch_size,
        lr=args.lr, delta=args.delta, seed=args.seed,
        limit_batches=args.limit_batches, estimator=args.estimator,
    )
    print(f"done in {time.time()-t0:.1f}s: {results}")


if __name__ == "__main__":
    main()
