"""Benchmark: BERT-base GLUE-shaped MC-10 ELBO training on one TPU chip.

Prints ONE JSON line:
  metric      bert_base_glue_mc10_elbo_steps_per_sec (fused Pallas path,
              bf16 activations — the framework's TPU recipe)
  vs_baseline speedup over the BEST reference-style configuration (tier-A:
              sample full weight matrices into HBM, then dense matmuls — the
              literal port of `bayeformers/nn/layers/linear.py:97-104` + the
              S-sample loop of `examples/bert_glue.py:56-73`), measured at
              BOTH f32 and bf16 activations and taking the faster one.

Measurement (this runtime has two traps, both previously hit — see PERF.md):
every timed region is a `lax.scan` of NSCAN full steps inside ONE jit, so
per-dispatch overhead (~28 ms on this tunneled runtime — large enough to
have dominated round-1's per-dispatch micro numbers) is amortized to <2%;
state (params, opt state, key) chains through the scan so no two steps are
identical and none can be deduplicated; the sync point is the final step's
scalar loss. Times are reported as min and median over N_OUTER scan runs.

Config mirrors the reference GLUE recipe: S=10 MC samples, batch 8, seq 128,
AdamW lr=2e-5, MOPED delta=0.05 freeze=True (`examples/bert_glue.py:77-87`).
"""
from __future__ import annotations

import json
import os
import signal
import statistics
import sys
import time

import jax

# Persistent compilation cache (round-4 hardening): compile cost over the
# tunnel is the entire bench-timeout risk (BENCH_r03 rc=124 was ~13 stages
# x 4-5 min/compile on a slow day). The cache is keyed on HLO + flags +
# jaxlib version, so a bench run warmed in an earlier session makes the
# driver's end-of-round run near-compile-free (verified cross-process on
# the axon backend: 1.65 s -> 0.28 s). Opt out: BAYEFORMERS_NO_COMPILE_CACHE.
if not os.environ.get("BAYEFORMERS_NO_COMPILE_CACHE"):
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
import optax

import bayeformers_tpu as bf
from bayeformers_tpu.models import bert as bert_lib
from bayeformers_tpu.ops import fused_linear as ops_fused
from bayeformers_tpu.utils.optim import masked_optimizer

S, B, L = 10, 8, 128
NSCAN, N_OUTER = 10, 4
# micro ops are ~0.05-0.7 ms: scan enough iterations that the scanned body
# dwarfs the per-dispatch floor, whose run-to-run drift (27-37 ms measured)
# otherwise dominates after subtraction and produced nonsense ratios once
MICRO_NSCAN, MICRO_OUTER = 400, 4

# --- wall-clock budget (round-4 fix: BENCH_r03 timed out, rc=124) ---------
# The driver runs `python bench.py` under a hard timeout; round 3 grew to
# ~13 jit-compiled configs and never printed its JSON. Compile cost over
# the tunnel is VOLATILE (20-40 s/program on a good day, 4-5 MINUTES when
# the tunnel is slow — measured 2026-08-19), so the REQUIRED tier is only
# the 3 compiles the headline metric needs (antithetic, fused, naive bf16:
# value + vs_baseline); EVERYTHING else (f32 pair, floor, micro ratio,
# SQuAD, GPT-2, serving, local/flipout) runs only if the remaining budget
# covers that stage's worst-case cost, and skipped stages are named in
# extra["skipped"]. Budget via BAYEFORMERS_BENCH_BUDGET_S; worst-case
# total ~= required (3 compiles) + budget.
BUDGET_S = float(os.environ.get("BAYEFORMERS_BENCH_BUDGET_S", "420"))
_T0 = time.monotonic()


def _budget_left() -> float:
    return BUDGET_S - (time.monotonic() - _T0)


# --- hard wall-clock cap (round-4 hardening, second layer) ----------------
# If the process is still alive at HARD_S, emit the best result assembled so
# far and exit 0 instead of letting the driver's outer `timeout` kill us
# with nothing on stdout (the BENCH_r03 rc=124 failure mode). Python only
# delivers SIGALRM between bytecodes, so an in-flight native XLA compile
# finishes first — the true worst case is HARD_S + one compile, still far
# inside the ~20 min the driver demonstrably allows (BENCH_r02 passed with
# a full ~13-stage run).
HARD_S = float(os.environ.get("BAYEFORMERS_BENCH_HARD_S", "840"))
_PROVISIONAL = None


def _emit_best_and_exit(signum=None, frame=None):
    out = _PROVISIONAL or {
        "metric": "bert_base_glue_mc10_elbo_steps_per_sec",
        "value": 0.0,
        "unit": "steps/sec",
        "vs_baseline": 0.0,
        "extra": {
            "error": f"hard cap {HARD_S}s hit before any stage completed",
            "bench_elapsed_s": round(time.monotonic() - _T0, 1),
        },
    }
    print(json.dumps(out), flush=True)
    os._exit(0)


_DISPATCH_FLOOR = None


def dispatch_floor() -> float:
    """Fixed per-jit-dispatch latency of this runtime (measured ~28 ms on
    the tunneled axon setup — an environment cost, not framework work).
    Measured once via an empty scan; subtracted per-iteration from every
    reported time so numbers reflect device execution."""
    global _DISPATCH_FLOOR
    if _DISPATCH_FLOOR is None:
        import statistics as _st

        @jax.jit
        def empty(x):
            def body(c, i):
                return (c[0], c[1] + 0.0 * i), None
            (x, acc), _ = jax.lax.scan(body, (x, jnp.float32(0.0)),
                                       jnp.arange(4))
            return x, acc

        x = jnp.zeros((8, 128), jnp.float32)
        x, acc = empty(x)
        float(acc)
        times = []
        for _ in range(6):
            t0 = time.perf_counter()
            x, acc = empty(x)
            float(acc)
            times.append(time.perf_counter() - t0)
        _DISPATCH_FLOOR = _st.median(times)
    return _DISPATCH_FLOOR


def timeit_scan(step_fn, state, nscan=NSCAN, n_outer=N_OUTER):
    """Per-iteration seconds (min, median) of ``state = step_fn(state, i)``
    scanned ``nscan`` times inside one jit, minus the per-dispatch floor;
    syncs on a scalar probe."""

    @jax.jit
    def run(state):
        def body(carry, i):
            state, _ = carry
            state, probe = step_fn(state, i)
            return (state, probe), None

        (state, probe), _ = jax.lax.scan(
            body, (state, jnp.float32(0.0)), jnp.arange(nscan)
        )
        return state, probe

    state, probe = run(state)  # compile + warm
    float(probe)
    floor = dispatch_floor()
    times = []
    for _ in range(n_outer):
        t0 = time.perf_counter()
        state, probe = run(state)
        float(probe)
        times.append(max(time.perf_counter() - t0 - floor, 1e-9) / nscan)
    return min(times), statistics.median(times)


def build(mode_dtype):
    bundle = bert_lib.build_bert(
        task="classification", n_labels=2, size="base", dtype=mode_dtype
    )
    return bf.to_bayesian(bundle.apply_fn, bundle.params, delta=0.05, freeze=True)


def bench_train(bmodel, bparams, inputs, labels, mode, n_samples=S):
    tx = masked_optimizer(optax.adamw(2e-5), bmodel.trainable_mask(bparams))
    opt_state = tx.init(bparams)
    import functools

    mc = {
        "fused": bmodel.mc_apply_fused,
        "naive": bmodel.mc_apply,
        "flipout": bmodel.mc_apply_flipout,
        "antithetic": functools.partial(bmodel.mc_apply_fused, antithetic=True),
        "local": bmodel.mc_apply_lrt,
    }[mode]

    def step(state, i):
        bparams, opt_state = state
        key = jax.random.fold_in(jax.random.key(0), i)

        def loss_fn(bparams):
            out, aux = mc(bparams, key, n_samples, **inputs)
            nll = bf.elbo.cross_entropy_sum(bf.elbo.mc_logits_mean(out), labels)
            return bf.elbo.elbo_loss(
                nll, aux["log_prior"], aux["log_variational_posterior"], 100
            )

        loss, grads = jax.value_and_grad(loss_fn)(bparams)
        updates, opt_state = tx.update(grads, opt_state, bparams)
        return (optax.apply_updates(bparams, updates), opt_state), loss

    return timeit_scan(step, (bparams, opt_state))


def bench_squad_chunked():
    """The reference SQuAD recipe (S=10, batch 13, seq 384 —
    `examples/bert_squad.py:216-234`) through the chunked fused step
    (``mc_chunk=2``): S-major exceeds one chip's HBM, chunked it fits.
    Driver-recorded evidence for the full-recipe claim (VERDICT r2 #4)."""
    from bayeformers_tpu import training

    S_q, B_q, L_q = 10, 13, 384
    bundle = bert_lib.build_bert(task="qa", size="base", dtype=jnp.bfloat16)
    bmodel, bparams = bf.to_bayesian(
        bundle.apply_fn, bundle.params, delta=0.05, freeze=True
    )
    rng = np.random.default_rng(0)
    batch = bert_lib.synthetic_batch(rng, B_q, L_q, bundle.config.vocab_size, 2)
    batch.pop("labels")
    batch["start_positions"] = jnp.asarray(rng.integers(0, L_q, B_q))
    batch["end_positions"] = jnp.asarray(rng.integers(0, L_q, B_q))

    tx = masked_optimizer(optax.adamw(3e-5), bmodel.trainable_mask(bparams))
    train_step = training.make_elbo_train_step(
        bmodel, tx, S_q, 100, loss_fn=training.qa_span_loss, mc_chunk=2,
    )
    opt_state = tx.init(bparams)

    def step(state, i):
        bparams, opt_state = state
        key = jax.random.fold_in(jax.random.key(1), i)
        bparams, opt_state, m = train_step(bparams, opt_state, key, batch)
        return (bparams, opt_state), m["loss"]

    return timeit_scan(step, (bparams, opt_state), nscan=4, n_outer=2)


def bench_gpt2():
    """GPT-2-base causal-LM MC-10 ELBO step (decoder-family extension):
    packed c_attn Conv1D interception + in-kernel causal mha, antithetic
    estimator, bf16 activations — the gpt2_lm workload's TPU recipe."""
    from bayeformers_tpu.models import gpt2 as gpt2_lib
    from bayeformers_tpu.workloads.gpt2_lm import lm_nll_sum

    bundle = gpt2_lib.build_gpt2(size="base", dtype=jnp.bfloat16)
    bmodel, bparams = bf.to_bayesian(
        bundle.apply_fn, bundle.params, delta=0.05, freeze=True
    )
    ids = gpt2_lib.synthetic_lm_batch(
        np.random.default_rng(3), B, L, bundle.config.vocab_size
    )["input_ids"]
    tx = masked_optimizer(optax.adamw(5e-5), bmodel.trainable_mask(bparams))
    opt_state = tx.init(bparams)

    def step(state, i):
        bparams, opt_state = state
        key = jax.random.fold_in(jax.random.key(2), i)

        def loss_fn(bparams):
            out, aux = bmodel.mc_apply_fused(
                bparams, key, S, ids, antithetic=True
            )
            nll = lm_nll_sum(bf.elbo.mc_logits_mean(out), ids)
            return bf.elbo.elbo_loss(
                nll, aux["log_prior"], aux["log_variational_posterior"], 100
            )

        loss, grads = jax.value_and_grad(loss_fn)(bparams)
        updates, opt_state = tx.update(grads, opt_state, bparams)
        return (optax.apply_updates(bparams, updates), opt_state), loss

    return timeit_scan(step, (bparams, opt_state), nscan=4, n_outer=2)


def bench_serving():
    """Posterior-predictive serving throughput at a compiled bucket
    (requests/s, wall-clock incl. the per-dispatch tunnel floor)."""
    from bayeformers_tpu.serving import Predictor

    bundle = bert_lib.build_bert(
        task="classification", n_labels=2, size="base", dtype=jnp.bfloat16
    )
    bmodel, bparams = bf.to_bayesian(
        bundle.apply_fn, bundle.params, delta=0.05, freeze=True
    )
    pred = Predictor(
        bmodel, bparams, n_samples=S, batch_sizes=(8,), seq_lens=(L,)
    )
    batch = bert_lib.synthetic_batch(
        np.random.default_rng(2), 8, L, bundle.config.vocab_size, 2
    )
    batch.pop("labels")
    batch = {k: np.asarray(v) for k, v in batch.items()}
    pred(batch, seed=0)  # compile the bucket
    times = []
    for i in range(8):
        t0 = time.perf_counter()
        pred(batch, seed=i + 1)
        times.append(time.perf_counter() - t0)
    t = statistics.median(times)
    return 8.0 / t, t


# BERT-base training-step model FLOPs (fwd + 2x bwd), matmuls only:
# per token per layer 2*(12 H^2) for QKV/O/MLP + 2*(2 L H) for QK^T and PV.
def _train_flops(n_layers=12, h=768, s=S, b=B, length=L) -> float:
    tokens = s * b * length
    per_token_layer = 24 * h * h + 4 * length * h
    return 3.0 * tokens * n_layers * per_token_layer


# v5e bf16 peak; override for other chips via BAYEFORMERS_PEAK_TFLOPS.
PEAK_TFLOPS = 197.0


def bench_frequentist_floor(inputs, labels):
    """Same matmul/attention/optimizer work on the S*B super-batch with
    shared deterministic weights — the speed-of-light reference."""
    bundle = bert_lib.build_bert(
        task="classification", n_labels=2, size="base", dtype=jnp.bfloat16
    )
    tx = optax.adamw(2e-5)
    params = bundle.params
    opt_state = tx.init(params)
    big_inputs = {k: jnp.concatenate([v] * S, 0) for k, v in inputs.items()}
    big_labels = jnp.concatenate([labels] * S, 0)

    def step(state, i):
        params, opt_state = state

        def loss_fn(p):
            logits = bundle.apply_fn(p, **big_inputs)
            return bf.elbo.cross_entropy_sum(logits, big_labels) + 0.0 * i

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), loss

    return timeit_scan(step, (params, opt_state))


def bench_matmul_ratio():
    """Fused sampled-matmul (+ both KL terms) vs plain dense matmul, per-op
    device time (in-jit scan), averaged over the three BERT matmul shapes.

    The fused op also produces log_q/log_p — work the dense baseline does
    not do at all. Reported for both f32 and bf16 activations.
    """
    rng = np.random.default_rng(0)
    out = {}
    for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        ratios, t_s_tot, t_d_tot = [], 0.0, 0.0
        for K, N in ((768, 768), (768, 3072), (3072, 768)):
            M = B * L
            x0 = jnp.asarray(rng.normal(size=(S, M, K)), dtype=dtype)
            mu = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.02)
            rho = jnp.asarray(rng.uniform(-5, -4, (K, N)).astype(np.float32))
            w = jnp.asarray(rng.normal(size=(K, N)) * 0.02, dtype=dtype)
            seeds = jnp.arange(S, dtype=jnp.int32)

            def sampled(x, i):
                y, lq, lp = ops_fused.bayes_linear(
                    x, mu, rho, seeds + i, prior_on_mu=True, save_weights=False
                )
                m = jnp.mean(y).astype(jnp.float32) + jnp.sum(lq) + jnp.sum(lp)
                return x + jnp.array(0.0, x.dtype) * m.astype(x.dtype), m

            def dense(x, i):
                y = jax.lax.dot_general(
                    x + jnp.array(0, x.dtype) * i.astype(x.dtype), w,
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                m = jnp.mean(y)
                return x + jnp.array(0.0, x.dtype) * m.astype(x.dtype), m

            t_s, _ = timeit_scan(sampled, x0, MICRO_NSCAN, MICRO_OUTER)
            t_d, _ = timeit_scan(dense, x0, MICRO_NSCAN, MICRO_OUTER)
            ratios.append(t_s / t_d)
            t_s_tot += t_s
            t_d_tot += t_d
        out[tag] = (float(np.mean(ratios)), t_s_tot, t_d_tot)
    return out


def _preflight():
    """Chip-health probe before any model build. A predecessor process that
    crashed mid-allocation can leave the chip RESOURCE_EXHAUSTED for minutes
    (observed 2026-08-19: a run started 10 min after an OOM crash failed its
    very first cache read and every extra stage after it). Retry a tiny
    allocation for a bounded window so a transient poisoned chip delays the
    bench instead of zeroing it; when healthy this costs one trivial compile
    that doubles as tunnel warm-up."""
    deadline = time.monotonic() + float(
        os.environ.get("BAYEFORMERS_BENCH_PREFLIGHT_S", "180")
    )
    while True:
        try:
            x = jnp.ones((256, 256), jnp.float32)
            float((x @ x).sum())
            return
        except Exception as e:  # noqa: BLE001 — retry any backend error
            if time.monotonic() >= deadline:
                print(f"preflight: chip still unhealthy ({type(e).__name__}); "
                      "proceeding — stage isolation will record failures",
                      file=sys.stderr, flush=True)
                return
            jax.clear_caches()
            time.sleep(20.0)


def main():
    backend = jax.default_backend()
    _preflight()
    bundle = bert_lib.build_bert(task="classification", n_labels=2, size="base")
    batch = bert_lib.synthetic_batch(
        np.random.default_rng(0), B, L, bundle.config.vocab_size, 2
    )
    labels = batch.pop("labels")
    inputs = batch

    results = {}
    skipped = []
    stage_s = {}

    def compile_scale() -> float:
        """Observed-compile-speed multiplier for the extras' worst-case
        estimates: the nominal numbers assume ~40 s/compile stages; on a
        slow-tunnel day the required tier's measured cost reveals the true
        rate (e.g. 560 s for 3 stages -> scale ~3), so a stage whose
        compile would blow far past its estimate is skipped instead of
        overrunning the driver timeout."""
        done = [v for k, v in stage_s.items() if not k.startswith("micro")]
        if not done:
            return 1.0
        return max(1.0, (sum(done) / len(done)) / 60.0)

    def stage(name, worst_case_s, fn, required=False):
        """Run a bench stage if the remaining budget covers its worst-case
        cost (compile + runs, scaled by the observed compile speed).
        Headline stages are `required` and always run; extras record
        themselves in `skipped` instead of starving the final JSON line
        the driver parses."""
        if not required and _budget_left() < worst_case_s * compile_scale():
            skipped.append(name)
            return None
        t0 = time.monotonic()
        try:
            out = fn()
        except Exception as e:  # noqa: BLE001 — any stage failure is survivable
            # A failing stage must never cost the driver its JSON line
            # (observed: fused_f32 RESOURCE_EXHAUSTED after the bf16 tier's
            # executables filled HBM). Extras record the error and continue
            # after dropping whatever the failure left behind; a required
            # stage emits the best provisional result assembled so far.
            if required:
                _emit_best_and_exit()
            skipped.append(f"{name}:error:{type(e).__name__}")
            jax.clear_caches()
            return None
        stage_s[name] = round(time.monotonic() - t0, 1)
        return out

    def _update_provisional():
        """Refresh the hard-cap fallback line after each required stage so a
        capped run still reports every measurement it actually made. When
        the cap lands before the naive stage, vs_baseline falls back to the
        last DRIVER-captured naive (BENCH_r02: 131.77 ms bf16) and says so —
        naive bf16 has measured 131-132 ms in every round, and the fallback
        can only be conservative if the chip got faster."""
        global _PROVISIONAL
        done = {k: v for k, v in results.items() if v is not None}
        cands = [
            v[0] for k, v in done.items()
            if k in ("antithetic_bf16", "fused_bf16")
        ]
        if not cands:
            return
        t_head = min(cands)
        naive = [v[0] for k, v in done.items() if k.startswith("naive_")]
        if naive:
            t_nv, src = min(naive), "measured this run"
        else:
            t_nv, src = 131.77e-3, "BENCH_r02 driver-captured naive_bf16"
        _PROVISIONAL = {
            "metric": "bert_base_glue_mc10_elbo_steps_per_sec",
            "value": round(1.0 / t_head, 4),
            "unit": "steps/sec",
            "vs_baseline": round(t_nv / t_head, 4),
            "extra": {
                "backend": backend,
                "provisional": True,
                "naive_baseline_source": src,
                **{f"{k}_step_ms": round(v[0] * 1e3, 2)
                   for k, v in done.items()},
                "stage_seconds": dict(stage_s),
                "bench_elapsed_s": round(time.monotonic() - _T0, 1),
            },
        }

    # --- required tier: exactly the 3 compiles the headline needs -------
    bmodel16, bparams16 = build(jnp.bfloat16)
    results["antithetic_bf16"] = stage(
        "antithetic_bf16", 60,
        lambda: bench_train(bmodel16, bparams16, inputs, labels, "antithetic"),
        required=True,
    )
    _update_provisional()
    results["fused_bf16"] = stage(
        "fused_bf16", 60,
        lambda: bench_train(bmodel16, bparams16, inputs, labels, "fused"),
        required=True,
    )
    _update_provisional()
    results["naive_bf16"] = stage(
        "naive_bf16", 60,
        lambda: bench_train(bmodel16, bparams16, inputs, labels, "naive"),
        required=True,
    )
    _update_provisional()

    # --- extras, budget permitting (each marks itself skipped) ----------
    results["frequentist_floor_bf16"] = stage(
        "frequentist_floor_bf16", 60,
        lambda: bench_frequentist_floor(inputs, labels),
    )
    micro = stage("micro_matmul_ratio", 120, bench_matmul_ratio)
    bmodel32 = bparams32 = None
    if _budget_left() >= 120:  # the f32 pair shares one model build
        # Drop the bf16 tier's cached executables first: their embedded
        # constants pin HBM, and the fused f32 leg (S=10 f32 W residuals,
        # ~4.4 GB live) has OOMed with them resident. Later bf16 extras
        # (flipout/local) compile fresh programs anyway.
        jax.clear_caches()
        bmodel32, bparams32 = build(jnp.float32)
        # heavier leg first, while memory is cleanest
        results["fused_f32"] = stage(
            "fused_f32", 60,
            lambda: bench_train(bmodel32, bparams32, inputs, labels, "fused"),
        )
        results["naive_f32"] = stage(
            "naive_f32", 60,
            lambda: bench_train(bmodel32, bparams32, inputs, labels, "naive"),
        )
        del bmodel32, bparams32
        jax.clear_caches()
    else:
        skipped.extend(["naive_f32", "fused_f32"])
    squad = stage("squad", 120, bench_squad_chunked)
    gpt2 = stage("gpt2", 120, bench_gpt2)
    serving = stage("serving", 90, bench_serving)
    results["flipout_s1_bf16"] = stage(
        "flipout_s1_bf16", 60,
        lambda: bench_train(
            bmodel16, bparams16, inputs, labels, "flipout", n_samples=1
        ),
    )
    # local reparameterization (Kingma et al. 2015, nn/lrt.py): activation-
    # space sampling — S=10 for the like-for-like step cost, S=1 for the
    # regime the paper targets (LRT variance at S=1 ~ BBB at S>>1)
    results["local_bf16"] = stage(
        "local_bf16", 60,
        lambda: bench_train(bmodel16, bparams16, inputs, labels, "local"),
    )
    results["local_s1_bf16"] = stage(
        "local_s1_bf16", 60,
        lambda: bench_train(
            bmodel16, bparams16, inputs, labels, "local", n_samples=1
        ),
    )
    results = {k: v for k, v in results.items() if v is not None}

    # The framework's default recipe is the antithetic estimator for even S
    # (strictly better: lower variance + half the noise generation); the
    # plain fused number is reported alongside.
    t_fused = min(results["fused_bf16"][0], results["antithetic_bf16"][0])
    headline_est = (
        "antithetic"
        if results["antithetic_bf16"][0] <= results["fused_bf16"][0]
        else "fused"
    )
    # honest baseline: the best configuration of the reference-style tier
    # that RAN (bf16 naive measured faster than f32 naive in every round —
    # BENCH_r02 131.77 vs 143.88 ms — so a skipped f32 leg can only make
    # vs_baseline CONSERVATIVE, never inflated)
    t_naive_best = min(
        v[0] for k, v in results.items() if k.startswith("naive_")
    )

    peak = float(os.environ.get("BAYEFORMERS_PEAK_TFLOPS", PEAK_TFLOPS))
    extra = {
        "backend": backend,
        # min / median per mode, milliseconds
        **{
            f"{k}_step_ms": round(v[0] * 1e3, 2) for k, v in results.items()
        },
        **{
            f"{k}_step_ms_median": round(v[1] * 1e3, 2)
            for k, v in results.items()
        },
        "naive_best_step_ms": round(t_naive_best * 1e3, 2),
        "fused_vs_naive_same_dtype_bf16": round(
            results["naive_bf16"][0] / results["fused_bf16"][0], 4
        ),
        "dispatch_floor_ms": round(dispatch_floor() * 1e3, 2),
        "headline_estimator": headline_est,
        # MFU of the headline Bayesian step and of its frequentist floor
        # (matmul FLOPs only, v5e bf16 peak unless overridden)
        "mfu_headline_pct": round(
            _train_flops() / (t_fused * peak * 1e12) * 100, 2
        ),
        "peak_tflops_assumed": peak,
        "bench_budget_s": BUDGET_S,
        "bench_elapsed_s": round(time.monotonic() - _T0, 1),
        "stage_seconds": stage_s,
        "skipped": skipped,
        "config": {"S": S, "B": B, "L": L, "model": "bert-base(random-init)",
                   "timing": f"lax.scan x{NSCAN} in-jit, min of {N_OUTER}, "
                             "per-dispatch floor subtracted"},
    }
    if micro is not None:
        extra.update({
            "sampled_vs_dense_matmul_ratio_f32": round(micro["f32"][0], 4),
            "sampled_vs_dense_matmul_ratio_bf16": round(micro["bf16"][0], 4),
            "sampled_matmul_ms_f32": round(micro["f32"][1] * 1e3, 3),
            "dense_matmul_ms_f32": round(micro["f32"][2] * 1e3, 3),
            "sampled_matmul_ms_bf16": round(micro["bf16"][1] * 1e3, 3),
            "dense_matmul_ms_bf16": round(micro["bf16"][2] * 1e3, 3),
        })
    if "frequentist_floor_bf16" in results:
        extra["mfu_frequentist_floor_pct"] = round(
            _train_flops() / (
                results["frequentist_floor_bf16"][0] * peak * 1e12
            ) * 100, 2
        )
    if "fused_f32" in results and "naive_f32" in results:
        extra["fused_vs_naive_same_dtype_f32"] = round(
            results["naive_f32"][0] / results["fused_f32"][0], 4
        )
    if "local_bf16" in results:
        # activation-space estimator vs the reference-style weight-space
        # tier at the same S and dtype (different estimator class — see
        # nn/lrt.py; reported alongside, never as the headline)
        extra["local_vs_naive_same_dtype_bf16"] = round(
            results["naive_bf16"][0] / results["local_bf16"][0], 4
        )
    if squad is not None:
        # full reference SQuAD recipe, chunked to fit one chip (VERDICT r2 #4)
        extra["squad_mc10_b13_l384_step_ms"] = round(squad[0] * 1e3, 2)
        extra["squad_mc10_b13_l384_step_ms_median"] = round(squad[1] * 1e3, 2)
    if gpt2 is not None:
        # GPT-2-base causal-LM recipe (decoder-family extension)
        extra["gpt2_mc10_b8_l128_step_ms"] = round(gpt2[0] * 1e3, 2)
        extra["gpt2_mc10_b8_l128_step_ms_median"] = round(gpt2[1] * 1e3, 2)
    if serving is not None:
        # serving tier: posterior-predictive requests/s at the (8, 128)
        # bucket, wall-clock per call (includes the per-dispatch floor)
        extra["serving_requests_per_sec"] = round(serving[0], 2)
        extra["serving_batch8_ms"] = round(serving[1] * 1e3, 2)
    result = {
        "metric": "bert_base_glue_mc10_elbo_steps_per_sec",
        "value": round(1.0 / t_fused, 4),
        "unit": "steps/sec",
        "vs_baseline": round(t_naive_best / t_fused, 4),
        "extra": extra,
    }
    signal.alarm(0)  # full run completed; the fallback line must not fire
    print(json.dumps(result))


if __name__ == "__main__":
    # Alarm only when run as the bench proper: importers (mha_microbench,
    # perf probes) borrow timeit_scan and must not inherit a kill timer.
    signal.signal(signal.SIGALRM, _emit_best_and_exit)
    signal.alarm(int(HARD_S))
    main()
