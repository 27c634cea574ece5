"""End-to-end workload smoke tests (tiny configs, synthetic data, CPU).

The reference's examples are its de-facto integration tests (SURVEY.md §4);
here they are actual tests: each workload must run its full phase sequence
and return sane metrics.
"""
import numpy as np
import pytest

from bayeformers_tpu.workloads import mlp_mnist


def test_mlp_mnist_workload(tmp_path):
    results = mlp_mnist.train(
        data_dir=str(tmp_path / "nodata"),  # forces the synthetic fallback
        logs=str(tmp_path / "logs"),
        epochs=1, b_epochs=1, samples=3, batch_size=32,
        limit_batches=6, seed=0,
    )
    assert set(results) == {"freq_acc", "moped_acc", "bayesian_acc", "acc_std"}
    for v in results.values():
        assert np.isfinite(v)
    # MOPED conversion must not destroy the frequentist model's accuracy
    assert results["moped_acc"] >= results["freq_acc"] - 0.15
    # artifacts written
    logs = list((tmp_path / "logs").iterdir())
    assert any(p.suffix == ".jsonl" for p in logs)
    assert any(p.name.endswith(".results.json") for p in logs)


@pytest.mark.slow
def test_bert_glue_workload_tiny(tmp_path):
    from bayeformers_tpu.workloads import bert_glue

    acc = bert_glue.train(
        exp="t", model_name="bert", delta=0.05, weight_decay=1e-4,
        logs=str(tmp_path / "logs"), epochs=1, b_epochs=1, samples=2,
        batch_size=4, size="tiny", limit_batches=3, seed=0,
        save_dir=str(tmp_path / "ckpt"),
    )
    assert 0.0 <= acc <= 1.0
    # checkpoint written and resumable
    from bayeformers_tpu.utils import checkpoint as ckpt_lib
    assert ckpt_lib.latest_step(str(tmp_path / "ckpt")) == 1


@pytest.mark.slow
def test_bert_squad_workload_tiny_with_resume(tmp_path):
    from bayeformers_tpu.workloads import bert_squad
    from bayeformers_tpu.utils import checkpoint as ckpt_lib

    kwargs = dict(
        exp="t-squad", data_dir=str(tmp_path / "nodata"), delta=0.05,
        weight_decay=0.0, logs=str(tmp_path / "logs"), epochs=1, samples=2,
        batch_size=4, max_seq=64, size="tiny", limit_batches=2, seed=0,
        save_dir=str(tmp_path / "ckpt"),
    )
    score = bert_squad.train(b_epochs=1, **kwargs)
    assert np.isfinite(score)
    assert ckpt_lib.latest_step(str(tmp_path / "ckpt")) == 1
    # resume continues from epoch 1 and saves epoch 2
    score2 = bert_squad.train(b_epochs=2, resume=True, **kwargs)
    assert np.isfinite(score2)
    assert ckpt_lib.latest_step(str(tmp_path / "ckpt")) == 2


@pytest.mark.slow
def test_roberta_squad_workload_tiny(tmp_path):
    """Family-aware SQuAD: roberta takes no token_type_ids (reference input
    pruning, `examples/bert_squad.py:184-185`) and offsets position ids."""
    from bayeformers_tpu.workloads import bert_squad

    score = bert_squad.train(
        exp="t-squad-rob", model="roberta-base",
        data_dir=str(tmp_path / "nodata"), delta=0.05, weight_decay=0.0,
        logs=str(tmp_path / "logs"), epochs=1, b_epochs=1, samples=2,
        batch_size=4, max_seq=64, size="tiny", limit_batches=2, seed=0,
    )
    assert np.isfinite(score)


@pytest.mark.slow
def test_bert_glue_dp_shard_map_tiny(tmp_path):
    """--dp on the fused tier: shard_map data parallelism over the CPU mesh."""
    from bayeformers_tpu.workloads import bert_glue

    acc = bert_glue.train(
        exp="t-dp", model_name="bert", delta=0.05, weight_decay=0.0,
        logs=str(tmp_path / "logs"), epochs=1, b_epochs=1, samples=2,
        batch_size=4, size="tiny", limit_batches=2, seed=0, dp=2,
    )
    assert 0.0 <= acc <= 1.0


@pytest.mark.slow
def test_bert_glue_dp_tp_fused_tiny(tmp_path):
    """--dp x --tp on the FUSED tier: Megatron-sharded weights inside
    shard_map (round-3 lift of the 'tp>1 requires the GSPMD tier' guard),
    including sharded-aware clipping and the eval-side all-gather."""
    from bayeformers_tpu.workloads import bert_glue

    acc = bert_glue.train(
        exp="t-dptpf", model_name="bert", delta=0.05, weight_decay=0.0,
        logs=str(tmp_path / "logs"), epochs=1, b_epochs=1, samples=2,
        batch_size=4, size="tiny", limit_batches=2, seed=0, dp=2, tp=2,
        estimator="fused",
    )
    assert 0.0 <= acc <= 1.0


@pytest.mark.slow
def test_bert_glue_dp_tp_gspmd_tiny(tmp_path):
    """--dp x --tp on the GSPMD tier (fused=False): Megatron tp rules."""
    from bayeformers_tpu.workloads import bert_glue

    acc = bert_glue.train(
        exp="t-dptp", model_name="bert", delta=0.05, weight_decay=0.0,
        logs=str(tmp_path / "logs"), epochs=1, b_epochs=1, samples=2,
        batch_size=4, size="tiny", limit_batches=2, seed=0, dp=2, tp=2,
        fused=False,
    )
    assert 0.0 <= acc <= 1.0


@pytest.mark.slow
def test_bert_squad_dp_tiny(tmp_path):
    from bayeformers_tpu.workloads import bert_squad

    score = bert_squad.train(
        exp="t-squad-dp", data_dir=str(tmp_path / "nodata"), delta=0.05,
        weight_decay=0.0, logs=str(tmp_path / "logs"), epochs=1, b_epochs=1,
        samples=2, batch_size=4, max_seq=64, size="tiny", limit_batches=2,
        seed=0, dp=2,
    )
    assert np.isfinite(score)


@pytest.mark.slow
def test_bert_glue_antithetic_estimator_tiny(tmp_path):
    from bayeformers_tpu.workloads import bert_glue

    acc = bert_glue.train(
        exp="t-anti", model_name="bert", delta=0.05, weight_decay=0.0,
        logs=str(tmp_path / "logs"), epochs=1, b_epochs=1, samples=2,
        batch_size=4, size="tiny", limit_batches=3, seed=0,
        estimator="antithetic",
    )
    assert 0.0 <= acc <= 1.0


@pytest.mark.slow
def test_bert_glue_mc_chunked_step_tiny(tmp_path):
    """--mc-chunk gradient accumulation: the chunked step must train and
    return the same metric keys as the single-pass step."""
    from bayeformers_tpu.workloads import bert_glue

    acc = bert_glue.train(
        exp="t-chunk", model_name="bert", delta=0.05, weight_decay=0.0,
        logs=str(tmp_path / "logs"), epochs=1, b_epochs=1, samples=4,
        batch_size=4, size="tiny", limit_batches=3, seed=0, mc_chunk=2,
    )
    assert 0.0 <= acc <= 1.0


def test_gpt2_lm_tiny(tmp_path):
    """The GPT-2 causal-LM workload (decoder-family extension) end to end:
    4 phases on a tiny config, antithetic estimator through the Conv1D
    interception. MOPED eval must stay near the frequentist accuracy (the
    phase-A training moves every bias off exactly-zero, so delta-scaled
    sigmas are genuinely small)."""
    from bayeformers_tpu.workloads import gpt2_lm

    results = gpt2_lm.train(
        logs=str(tmp_path), size="tiny", batch_size=4, seq=32, n_train=64,
        n_test=32, samples=2, delta=0.01, estimator="antithetic",
        limit_batches=4,
    )
    for k, v in results.items():
        assert np.isfinite(v), (k, v)
    assert abs(results["moped_acc"] - results["freq_acc"]) < 0.1
    # artifacts written (JSONL + dumper results like the other workloads)
    assert any(p.suffix == ".json" for p in tmp_path.iterdir())


@pytest.mark.slow
def test_gpt2_lm_dp_tp_fused_tiny(tmp_path):
    """The GPT-2 workload end to end on a dp=2 x tp=2 mesh with the fused
    estimator: packed-QKV permutation + Megatron sharding + shard_map step,
    with evals riding the gathered+unpermuted single-device view."""
    from bayeformers_tpu.workloads import gpt2_lm

    results = gpt2_lm.train(
        logs=str(tmp_path), size="tiny", batch_size=4, seq=32, n_train=64,
        n_test=32, samples=2, delta=0.01, estimator="fused",
        limit_batches=3, dp=2, tp=2,
    )
    for k, v in results.items():
        assert np.isfinite(v), (k, v)
    assert abs(results["moped_acc"] - results["freq_acc"]) < 0.1


@pytest.mark.slow
def test_llama_lm_dp_tp_fused_tiny(tmp_path):
    """The causal-LM workload driving a LLaMA-architecture family end to
    end on a dp=2 x tp=2 mesh with the fused estimator: separate q/k/v
    projections (no QKV permutation), GQA local head counts, rotary inside
    the fused attention handler, Megatron llama_param_spec sharding."""
    from bayeformers_tpu.workloads import gpt2_lm

    results = gpt2_lm.train(
        model="llama",
        logs=str(tmp_path), size="tiny", batch_size=4, seq=32, n_train=64,
        n_test=32, samples=2, delta=0.01, estimator="fused",
        limit_batches=3, dp=2, tp=2,
    )
    for k, v in results.items():
        assert np.isfinite(v), (k, v)
    assert abs(results["moped_acc"] - results["freq_acc"]) < 0.1


def test_gpt2_lm_real_corpus_tiny(tmp_path):
    """The causal-LM workload on a REAL text corpus through the native BPE
    tokenizer (utils/data.py::load_lm_corpus): the model vocab is taken
    from the tokenizer, bayes_rate (a synthetic-language notion) is
    omitted, and all 4 phases run end to end."""
    from test_utils import _write_bpe_corpus
    from bayeformers_tpu.workloads import gpt2_lm

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    vocab_size = _write_bpe_corpus(corpus, reps=400)
    results = gpt2_lm.train(
        logs=str(tmp_path), size="tiny", batch_size=4, seq=32, n_train=48,
        n_test=16, samples=2, delta=0.01, estimator="antithetic",
        limit_batches=3, corpus=str(corpus),
    )
    assert "bayes_rate" not in results
    for k, v in results.items():
        assert np.isfinite(v), (k, v)
    # real text has exploitable structure; the MOPED model must keep the
    # frequentist accuracy (same gate as the synthetic test)
    assert abs(results["moped_acc"] - results["freq_acc"]) < 0.1


def test_stack_lm_pp_workload(tmp_path):
    """The pp training mode is drivable end to end from the workload CLI
    (VERDICT r3 #6): 2 pipeline stages on the CPU mesh, loss decreasing,
    accuracy above chance, JSONL artifact written."""
    import argparse
    import json

    from bayeformers_tpu.workloads import stack_lm

    args = argparse.Namespace(
        pp=2, ep=1, blocks=4, experts=0, features=32, ffn=0,
        microbatches=4, steps=40, samples=2, batch_size=64,
        n_examples=256, lr=5e-3, eval_every=5, seed=0,
        logs=str(tmp_path / "logs"),
    )
    last = stack_lm.run(args)
    assert last["mode"] == "pp" and last["n_dev"] == 2
    assert np.isfinite(last["loss"])
    assert last["acc"] > 0.7  # separable task: well above chance by step 40
    lines = [
        json.loads(l)
        for l in (tmp_path / "logs" / "stack_lm.jsonl").read_text().splitlines()
    ]
    assert lines[-1]["loss"] < lines[0]["loss"]


def test_stack_lm_ep_workload(tmp_path):
    """The ep training mode is drivable end to end from the workload CLI
    (VERDICT r3 #6): 2 expert-parallel devices, 4 experts."""
    import argparse

    from bayeformers_tpu.workloads import stack_lm

    args = argparse.Namespace(
        pp=1, ep=2, blocks=0, experts=4, features=32, ffn=64,
        microbatches=1, steps=40, samples=2, batch_size=64,
        n_examples=256, lr=5e-3, eval_every=10, seed=0,
        logs=str(tmp_path / "logs"),
    )
    last = stack_lm.run(args)
    assert last["mode"] == "ep" and last["n_dev"] == 2
    assert np.isfinite(last["loss"])
    assert last["acc"] > 0.7


def test_stack_lm_transformer_pp_workload(tmp_path):
    """--arch transformer --pp 2: the depth-stacked Bayesian transformer LM
    trains as a 2-stage pipeline from the workload CLI; the repeated-half
    copy task's predictable positions rise above chance (1/V)."""
    import argparse
    import json

    from bayeformers_tpu.workloads import stack_lm

    args = argparse.Namespace(
        arch="transformer", pp=2, ep=1, blocks=2, experts=0, features=16,
        heads=2, ffn=32, seq_len=8, vocab=17, microbatches=2, steps=120,
        samples=1, batch_size=32, n_examples=256, lr=3e-3, eval_every=20,
        seed=0, logs=str(tmp_path / "logs"),
    )
    last = stack_lm.run(args)
    assert last["mode"] == "pp" and last["arch"] == "transformer"
    assert np.isfinite(last["loss"])
    assert last["copy_acc"] > 0.3  # chance ~ 0.06
    lines = [
        json.loads(l)
        for l in (tmp_path / "logs" / "stack_lm.jsonl").read_text().splitlines()
    ]
    assert lines[-1]["loss"] < lines[0]["loss"]


def test_stack_lm_transformer_ep_workload(tmp_path):
    """--arch transformer --ep 2: MoE-FFN transformer LM with the expert
    axis sharded over 2 devices, drivable from the workload CLI."""
    import argparse

    from bayeformers_tpu.workloads import stack_lm

    args = argparse.Namespace(
        arch="transformer", pp=1, ep=2, blocks=2, experts=4, features=16,
        heads=2, ffn=32, seq_len=8, vocab=17, microbatches=1, steps=60,
        samples=1, batch_size=32, n_examples=256, lr=3e-3, eval_every=20,
        seed=0, logs=str(tmp_path / "logs"),
    )
    last = stack_lm.run(args)
    assert last["mode"] == "ep" and last["arch"] == "transformer"
    assert np.isfinite(last["loss"])
    assert last["copy_acc"] > 0.15  # chance ~ 0.06; 60 steps is early


@pytest.mark.slow
def test_llama_lm_unigram_corpus_tiny(tmp_path):
    """The LLaMA-family causal-LM workload on a REAL text corpus through
    the native Unigram tokenizer (tokenizer.json resolution in
    utils/data.py::load_lm_corpus) — the SentencePiece-vocabulary
    counterpart of the GPT-2/BPE corpus test."""
    from test_utils import _write_unigram_corpus
    from bayeformers_tpu.workloads import gpt2_lm

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    _write_unigram_corpus(corpus, reps=300)
    results = gpt2_lm.train(
        model="llama", logs=str(tmp_path), size="tiny", batch_size=4,
        seq=32, n_train=48, n_test=16, samples=2, delta=0.01,
        estimator="fused", limit_batches=3, corpus=str(corpus),
    )
    assert "bayes_rate" not in results
    for k, v in results.items():
        assert np.isfinite(v), (k, v)
    assert abs(results["moped_acc"] - results["freq_acc"]) < 0.1


def test_hypersearch_shares_compiles_across_trials(tmp_path):
    """One-compile hypersearch (VERDICT r4 #4): trials vary only delta
    (init-only) and weight_decay (injected optimizer state,
    `training.adamw_with_decay_groups`), so a _shared dict makes every
    trial after the first reuse the first trial's jitted steps — ZERO new
    compile requests. The reference re-trains 10 times with the same
    wasteful-but-cheap torch graphs (`examples/hypersearch.py:42-58`); at
    BERT-base on the tunneled TPU each avoided recompile is ~2-4 min."""
    import jax

    from bayeformers_tpu.workloads import bert_glue

    requests = []
    jax.monitoring.register_event_listener(
        lambda name, **kw: requests.append(name)
        if name == "/jax/compilation_cache/compile_requests_use_cache"
        else None
    )
    shared = {}
    kwargs = dict(
        exp="hs", model_name="bert", logs=str(tmp_path / "logs"),
        epochs=1, b_epochs=1, samples=2, batch_size=4, size="tiny",
        limit_batches=2, seed=0, _shared=shared,
    )
    counts = []
    scores = []
    for trial, (delta, wd) in enumerate(
        [(0.05, 1e-4), (0.02, 5e-4), (0.08, 0.0)]
    ):
        n0 = len(requests)
        scores.append(bert_glue.train(delta=delta, weight_decay=wd, **kwargs))
        counts.append(len(requests) - n0)
    assert all(np.isfinite(s) for s in scores)
    # trial 1 compiles everything; trials 2-3 must reuse it all (allow a
    # couple of stray eager-op compiles the first reuse may still warm)
    assert counts[0] > 5, counts
    assert counts[1] <= 2, counts
    assert counts[2] == 0, counts


@pytest.mark.slow
def test_bert_squad_span_uncertainty_real_data_path(tmp_path):
    """The real-data SQuAD eval reports span-level uncertainty (VERDICT r4
    #5): per-draw EM/F1 stats and span_agreement land in the phase records
    alongside EM/F1, through the same official-format JSON + vocab +
    doc-stride path the artifact uses."""
    import json as json_lib
    import sys

    sys.path.insert(0, ".")
    import artifact_squad as art

    from bayeformers_tpu.workloads import bert_squad

    rng = np.random.default_rng(0)
    root = tmp_path / "squad"
    root.mkdir()
    art.build_vocab(str(root / "vocab.txt"))
    art.write_squad_json(str(root / "train-v1.1.json"),
                         [art.gen_example(rng, f"tr{i}") for i in range(24)])
    art.write_squad_json(str(root / "dev-v1.1.json"),
                         [art.gen_example(rng, f"dev{i}") for i in range(8)])

    bert_squad.train(
        exp="span-unc", data_dir=str(root),
        tokenizer=str(root / "vocab.txt"), size="tiny", max_seq=64,
        logs=str(tmp_path / "logs"), epochs=1, b_epochs=1, samples=4,
        batch_size=4, limit_batches=2, seed=0, delta=0.2,
    )
    results = json_lib.load(open(next(
        (tmp_path / "logs").glob("*.results.json")
    )))
    evals = results["bayesian_eval"]
    for k in ("span_agreement", "em_std_of_draws", "f1_std_of_draws",
              "em_mean_of_draws", "exact_match", "f1"):
        assert k in evals, (k, sorted(evals))
    assert 0.0 < evals["span_agreement"] <= 1.0
    # a delta=0.2 random-ish tiny model must actually disagree across draws
    assert evals["span_agreement"] < 1.0 or evals["em_std_of_draws"] > 0.0
