"""Benchmark: BERT-base GLUE-shaped MC-10 ELBO training on one TPU chip.

Prints ONE JSON line:
  metric      bert_base_glue_mc10_elbo_steps_per_sec (fused Pallas path)
  vs_baseline speedup over the reference-style implementation expressed in
              JAX (tier-A: sample full weight matrices into HBM, then dense
              matmuls — the literal port of `bayeformers/nn/layers/linear.py:
              97-104` + the S-sample loop of `examples/bert_glue.py:56-73`)

Also measures the fused sampled-matmul vs dense matmul microbench ratio
(BASELINE.md gate: <= 1.3x dense) and reports it in "extra".

Config mirrors the reference GLUE recipe: S=10 MC samples, batch 8, seq 128,
AdamW lr=2e-5, MOPED delta=0.05 freeze=True (`examples/bert_glue.py:77-87`).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import bayeformers_tpu as bf
from bayeformers_tpu.models import bert as bert_lib
from bayeformers_tpu.ops import fused_linear as ops_fused
from bayeformers_tpu.utils.optim import masked_optimizer

S, B, L = 10, 8, 128
N_WARMUP, N_ITER = 3, 10


def timeit_chained(fn, state, n=N_ITER, warmup=N_WARMUP):
    """Time ``state, probe = fn(state, i)`` iterations.

    Two measurement traps on this runtime, both hit in earlier revisions:
    repeated IDENTICAL dispatches can be deduplicated (impossibly fast
    times), and block_until_ready on a large state pytree can return before
    the work is done. So the state is threaded through with a varying
    iteration index, and the sync point is the final step's scalar probe —
    whose value transitively requires every chained step to have executed.
    """
    for i in range(warmup):
        state, probe = fn(state, i)
    float(probe)  # host sync through the scalar
    t0 = time.perf_counter()
    for i in range(n):
        state, probe = fn(state, warmup + i)
    float(probe)
    return (time.perf_counter() - t0) / n


def make_step(bmodel, bparams, mode: str, n_samples: int = S):
    tx = masked_optimizer(optax.adamw(2e-5), bmodel.trainable_mask(bparams))
    opt_state = tx.init(bparams)

    @jax.jit
    def step(bparams, opt_state, key, inputs, labels):
        def loss_fn(bparams):
            mc = {
                "fused": bmodel.mc_apply_fused,
                "naive": bmodel.mc_apply,
                "flipout": bmodel.mc_apply_flipout,
            }[mode]
            out, aux = mc(bparams, key, n_samples, **inputs)
            nll = bf.elbo.cross_entropy_sum(bf.elbo.mc_logits_mean(out), labels)
            return bf.elbo.elbo_loss(
                nll, aux["log_prior"], aux["log_variational_posterior"], 100
            )

        loss, grads = jax.value_and_grad(loss_fn)(bparams)
        updates, opt_state = tx.update(grads, opt_state, bparams)
        return optax.apply_updates(bparams, updates), opt_state, loss

    return step, opt_state


def bench_train(bmodel, bparams, inputs, labels, mode: str, n_samples: int = S):
    step, opt_state = make_step(bmodel, bparams, mode, n_samples)
    key = jax.random.key(0)

    def run(state, i):
        bp, opt = state
        bp, opt, loss = step(bp, opt, jax.random.fold_in(key, i), inputs, labels)
        return (bp, opt), loss

    return timeit_chained(run, (bparams, opt_state))


def bench_matmul_ratio():
    """Fused sampled matmul (+ both KL terms) vs plain dense matmul.

    Averaged over the three BERT matmul shapes (QKV/attn-out square, FFN up,
    FFN down), weighted once each. The fused op also produces log_q/log_p —
    work the dense baseline does not do at all.
    """
    rng = np.random.default_rng(0)
    ratios = []
    t_s_total = t_d_total = 0.0
    for K, N in ((768, 768), (768, 3072), (3072, 768)):
        M = S * B * L
        x = jnp.asarray(rng.normal(size=(S, M // S, K)).astype(np.float32))
        mu = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.02)
        rho = jnp.asarray(rng.uniform(-5, -4, (K, N)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.02)
        seeds = jnp.arange(S, dtype=jnp.int32)

        # chained: each iteration's x depends (by +0) on the previous output,
        # so no two executions are identical and none can be deduplicated
        @jax.jit
        def sampled_step(x, mu, rho, s):
            y = ops_fused.bayes_linear(x, mu, rho, s, prior_on_mu=True)[0]
            m = jnp.mean(y)
            return x + 0.0 * m, m

        @jax.jit
        def dense_step(x, w, i):
            y = jax.lax.dot_general(x + 0.0 * i, w, (((2,), (0,)), ((), ())))
            m = jnp.mean(y)
            return x + 0.0 * m, m

        t_s = timeit_chained(
            lambda st, i: sampled_step(st, mu, rho, seeds + i), x, n=30, warmup=5
        )
        t_d = timeit_chained(
            lambda st, i: dense_step(st, w, jnp.float32(i)), x, n=30, warmup=5
        )
        ratios.append(t_s / t_d)
        t_s_total += t_s
        t_d_total += t_d
    return float(np.mean(ratios)), t_s_total, t_d_total


def main():
    backend = jax.default_backend()
    bundle = bert_lib.build_bert(task="classification", n_labels=2, size="base")
    bmodel, bparams = bf.to_bayesian(
        bundle.apply_fn, bundle.params, delta=0.05, freeze=True
    )
    batch = bert_lib.synthetic_batch(
        np.random.default_rng(0), B, L, bundle.config.vocab_size, 2
    )
    labels = batch.pop("labels")
    inputs = batch

    ratio, t_s, t_d = bench_matmul_ratio()
    t_fused = bench_train(bmodel, bparams, inputs, labels, "fused")
    t_naive = bench_train(bmodel, bparams, inputs, labels, "naive")
    # extension estimator: flipout at S=1 (per-example decorrelated
    # perturbations make one pass worth ~B quasi-samples; see PERF.md)
    t_flip = bench_train(bmodel, bparams, inputs, labels, "flipout", n_samples=1)
    # bf16 activations (f32 variational numerics — log-probs bit-identical)
    bundle16 = bert_lib.build_bert(
        task="classification", n_labels=2, size="base", dtype=jnp.bfloat16
    )
    bmodel16, bparams16 = bf.to_bayesian(
        bundle16.apply_fn, bundle16.params, delta=0.05, freeze=True
    )
    t_bf16 = bench_train(bmodel16, bparams16, inputs, labels, "fused")

    # Headline = the framework's TPU-native recipe: fused Pallas kernels with
    # bf16 activations (variational numerics stay f32; log-probs are
    # bit-identical to the f32 run). Baseline = the reference algorithm
    # ported verbatim to JAX in f32 (sample W into HBM, dense matmuls,
    # vmapped S loop).
    result = {
        "metric": "bert_base_glue_mc10_elbo_steps_per_sec",
        "value": round(1.0 / t_bf16, 4),
        "unit": "steps/sec",
        "vs_baseline": round(t_naive / t_bf16, 4),
        "extra": {
            "backend": backend,
            "naive_steps_per_sec": round(1.0 / t_naive, 4),
            "naive_step_ms": round(t_naive * 1e3, 2),
            "fused_bf16_step_ms": round(t_bf16 * 1e3, 2),
            "fused_f32_step_ms": round(t_fused * 1e3, 2),
            "flipout_s1_step_ms": round(t_flip * 1e3, 2),
            "flipout_speedup_vs_naive": round(t_naive / t_flip, 4),
            "sampled_vs_dense_matmul_ratio": round(ratio, 4),
            "sampled_matmul_ms": round(t_s * 1e3, 3),
            "dense_matmul_ms": round(t_d * 1e3, 3),
            "config": {"S": S, "B": B, "L": L, "model": "bert-base(random-init)"},
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
