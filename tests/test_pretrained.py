"""Pretrained round-trip: save → from_pretrained → MOPED → accuracy held.

The reference's whole point is converting *pretrained* HF checkpoints
(`examples/bert_glue.py:48-53`) with MOPED init, which Krishnan et al. show
preserves the pretrained accuracy (cited at reference
`bayeformers/__init__.py:42-44`). Zero-egress means no hub downloads, so
this exercises the ``build_bert(pretrained=<local path>)`` code path with a
locally-saved checkpoint: fine-tune tiny BERT on separable synthetic data,
save, reload through from_pretrained, convert, and require Bayesian MC eval
to match the frequentist accuracy.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import bayeformers_tpu as bf
from bayeformers_tpu.models import bert as bert_lib


@pytest.mark.slow
def test_pretrained_roundtrip_moped_preserves_accuracy(tmp_path):
    bundle = bert_lib.build_bert(
        task="classification", n_labels=2, size="tiny", seed=0
    )
    rng = np.random.default_rng(0)
    batch = bert_lib.synthetic_batch(rng, 32, 16, bundle.config.vocab_size, 2)
    labels = batch.pop("labels")
    # plant a deterministic label token so the task is learnable
    ids = np.array(batch["input_ids"])
    ids[:, 1] = 4 + np.asarray(labels) * 7
    batch["input_ids"] = jnp.asarray(ids)

    tx = optax.adam(1e-3)
    params = bundle.params
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = bundle.apply_fn(p, **batch)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(40):
        params, opt_state, loss = step(params, opt_state)
    logits = bundle.apply_fn(params, **batch)
    freq_acc = float(jnp.mean(jnp.argmax(logits, -1) == labels))
    assert freq_acc >= 0.9, freq_acc

    # save the fine-tuned checkpoint locally, reload via from_pretrained
    bundle.hf_model.params = params
    ckpt_dir = tmp_path / "tiny-bert"
    bundle.hf_model.save_pretrained(str(ckpt_dir))
    reloaded = bert_lib.build_bert(
        task="classification", n_labels=2, pretrained=str(ckpt_dir)
    )
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(reloaded.params),
    ):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # MOPED conversion of the RELOADED model preserves accuracy
    bmodel, bparams = bf.to_bayesian(
        reloaded.apply_fn, reloaded.params, delta=0.05, freeze=True
    )
    out, _ = bmodel.mc_apply(bparams, jax.random.key(1), 8, **batch)
    bayes_acc, acc_std = bf.elbo.accuracy_and_std(out, labels)
    assert abs(float(bayes_acc) - freq_acc) <= 0.1, (float(bayes_acc), freq_acc)
    assert np.isfinite(float(acc_std))


@pytest.mark.slow
def test_pretrained_roundtrip_fused_and_qa(tmp_path):
    """The reloaded-checkpoint MOPED path through the FUSED estimator and
    the QA (span) head: from_pretrained → to_bayesian → mc_apply_fused must
    agree with the naive tier, and the QA head must produce both span logits
    with finite KL terms (VERDICT r2 'next' #5 test extension)."""
    # classification: fused vs naive on the reloaded checkpoint
    bundle = bert_lib.build_bert(
        task="classification", n_labels=2, size="tiny", seed=0
    )
    ckpt_dir = tmp_path / "tiny-bert-f"
    bundle.hf_model.save_pretrained(str(ckpt_dir))
    reloaded = bert_lib.build_bert(
        task="classification", n_labels=2, pretrained=str(ckpt_dir)
    )
    bmodel, bp = bf.to_bayesian(
        reloaded.apply_fn, reloaded.params, delta=0.05, freeze=True
    )
    rng = np.random.default_rng(1)
    batch = bert_lib.synthetic_batch(rng, 8, 16, bundle.config.vocab_size, 2)
    batch.pop("labels")
    out_f, aux_f = bmodel.mc_apply_fused(bp, jax.random.key(2), 4, **batch)
    assert out_f.shape[:2] == (4, 8)
    assert np.isfinite(np.asarray(out_f, np.float32)).all()
    assert np.isfinite(np.asarray(aux_f["log_variational_posterior"])).all()
    # naive tier runs on the same reloaded params (numeric fused-vs-manual
    # parity is covered by tests/test_fused.py; cross-tier MC means use
    # different eps streams and only agree in distribution)
    out_n, _ = bmodel.mc_apply(bp, jax.random.key(2), 4, **batch)
    assert out_n.shape == out_f.shape
    assert np.isfinite(np.asarray(out_n, np.float32)).all()

    # QA head through the same from_pretrained path
    qa = bert_lib.build_bert(task="qa", size="tiny", seed=0)
    qa_dir = tmp_path / "tiny-bert-qa"
    qa.hf_model.save_pretrained(str(qa_dir))
    qa_re = bert_lib.build_bert(task="qa", pretrained=str(qa_dir))
    bm_qa, bp_qa = bf.to_bayesian(
        qa_re.apply_fn, qa_re.params, delta=0.05, freeze=True
    )
    (s_log, e_log), aux = bm_qa.mc_apply_fused(
        bp_qa, jax.random.key(3), 4, **batch
    )
    assert s_log.shape == (4, 8, 16) and e_log.shape == (4, 8, 16)
    assert np.isfinite(np.asarray(s_log, np.float32)).all()
    assert np.isfinite(np.asarray(aux["log_prior"])).all()


@pytest.mark.slow
def test_pretrained_roundtrip_gpt2(tmp_path):
    """The local save -> from_pretrained -> MOPED path for the decoder
    family: a briefly-trained tiny GPT-2 reloads through
    build_gpt2(pretrained=<local path>) and its MOPED posterior predictive
    preserves the frequentist next-token accuracy (fused tier)."""
    from bayeformers_tpu.models import gpt2 as gpt2_lib
    from bayeformers_tpu.workloads.gpt2_lm import lm_nll_sum

    bundle = gpt2_lib.build_gpt2(size="tiny", seed=0)
    ids = gpt2_lib.synthetic_lm_batch(
        np.random.default_rng(0), 32, 24, bundle.config.vocab_size,
        order_frac=1.0,  # fully deterministic successor language: learnable
    )["input_ids"]

    tx = optax.adam(2e-3)
    params, opt_state = bundle.params, None
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(
            lambda p: lm_nll_sum(bundle.apply_fn(p, ids), ids)
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(60):
        params, opt_state, loss = step(params, opt_state)
    logits = bundle.apply_fn(params, ids)
    freq_acc = float(jnp.mean(jnp.argmax(logits[:, :-1], -1) == ids[:, 1:]))
    assert freq_acc >= 0.5, freq_acc

    bundle.hf_model.params = params
    ckpt = tmp_path / "tiny-gpt2"
    bundle.hf_model.save_pretrained(str(ckpt))
    reloaded = gpt2_lib.build_gpt2(pretrained=str(ckpt))
    bmodel, bp = bf.to_bayesian(
        reloaded.apply_fn, reloaded.params, delta=0.01, freeze=True
    )
    out, _ = bmodel.mc_apply_fused(bp, jax.random.key(1), 4, ids)
    mean = bf.elbo.mc_logits_mean(out)
    moped_acc = float(jnp.mean(jnp.argmax(mean[:, :-1], -1) == ids[:, 1:]))
    assert abs(moped_acc - freq_acc) < 0.05, (moped_acc, freq_acc)


@pytest.mark.slow
def test_pretrained_gpt2_corpus_workload(tmp_path):
    """The gpt2 corpus WORKLOAD through a reloaded local checkpoint
    (VERDICT r3 #9): save_pretrained → train(pretrained=<path>,
    corpus=<dir>) runs all 4 phases on real text through from_pretrained —
    the exact invocation a user with real GPT-2 weights runs
    (reference from_pretrained usage, `examples/bert_glue.py:46-53`)."""
    from test_utils import _write_bpe_corpus
    from bayeformers_tpu.models import gpt2 as gpt2_lib
    from bayeformers_tpu.workloads import gpt2_lm

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    _write_bpe_corpus(corpus, reps=400)
    bundle = gpt2_lib.build_gpt2(size="tiny", seed=0)
    ckpt = tmp_path / "gpt2-ckpt"
    bundle.hf_model.save_pretrained(str(ckpt))

    results = gpt2_lm.train(
        logs=str(tmp_path), batch_size=4, seq=32, n_train=48, n_test=16,
        samples=2, delta=0.01, estimator="fused", limit_batches=3,
        corpus=str(corpus), pretrained=str(ckpt),
    )
    assert "bayes_rate" not in results
    for k, v in results.items():
        assert np.isfinite(v), (k, v)
    assert abs(results["moped_acc"] - results["freq_acc"]) < 0.1


def _elbo_steps(bmodel, bp, loss_of_logits, inputs, n_steps=6, samples=2):
    """MOPED → short ELBO run: returns (losses, trained bp)."""
    from bayeformers_tpu.utils.optim import masked_optimizer

    btx = masked_optimizer(optax.adam(1e-3), bmodel.trainable_mask(bp))
    bopt = btx.init(bp)

    @jax.jit
    def step(bp, bopt, key):
        def loss(bp):
            out, aux = bmodel.mc_apply_fused(bp, key, samples, **inputs)
            return bf.elbo.elbo_loss(
                loss_of_logits(bf.elbo.mc_logits_mean(out)),
                aux["log_prior"], aux["log_variational_posterior"], 1,
            )
        l, g = jax.value_and_grad(loss)(bp)
        u, bopt = btx.update(g, bopt, bp)
        return optax.apply_updates(bp, u), bopt, l

    losses = []
    key = jax.random.key(7)
    for i in range(n_steps):
        key, k = jax.random.split(key)
        bp, bopt, l = step(bp, bopt, k)
        losses.append(float(l))
    return losses, bp


@pytest.mark.slow
def test_pretrained_roundtrip_llama_elbo(tmp_path):
    """LLaMA family: save → from_pretrained → MOPED → short ELBO run
    (VERDICT r3 #9) — loss decreases, frozen mu leaves bit-identical."""
    from bayeformers_tpu.models import llama as llama_lib

    bundle = llama_lib.build_llama(size="tiny", seed=0)
    ckpt = tmp_path / "llama-ckpt"
    bundle.hf_model.save_pretrained(str(ckpt))
    re = llama_lib.build_llama(pretrained=str(ckpt))
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(bundle.params),
        jax.tree_util.tree_leaves_with_path(re.params),
    ):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    bm, bp = bf.to_bayesian(re.apply_fn, re.params, delta=0.05, freeze=True)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(1, re.config.vocab_size, (4, 16)),
        jnp.int32,
    )
    mu_path = next(p for p in bm.spec.paths if p.endswith("kernel"))
    mu_before = np.asarray(_leaf_by_path(bp.params, mu_path)).copy()

    def lm_loss(mean_logits):
        return bf.elbo.cross_entropy_sum(
            mean_logits[:, :-1].reshape(-1, mean_logits.shape[-1]),
            ids[:, 1:].reshape(-1),
        )

    losses, bp2 = _elbo_steps(bm, bp, lm_loss, {"input_ids": ids})
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    np.testing.assert_array_equal(
        np.asarray(_leaf_by_path(bp2.params, mu_path)), mu_before
    )


@pytest.mark.slow
def test_pretrained_roundtrip_t5_elbo(tmp_path):
    """T5 (encoder-decoder): save → from_pretrained → MOPED → short ELBO
    run (VERDICT r3 #9)."""
    from bayeformers_tpu.models import t5 as t5_lib

    bundle = t5_lib.build_t5(size="tiny", seed=0)
    ckpt = tmp_path / "t5-ckpt"
    bundle.hf_model.save_pretrained(str(ckpt))
    re = t5_lib.build_t5(pretrained=str(ckpt))
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(bundle.params),
        jax.tree_util.tree_leaves_with_path(re.params),
    ):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    bm, bp = bf.to_bayesian(re.apply_fn, re.params, delta=0.05, freeze=True)
    rng = np.random.default_rng(1)
    enc = jnp.asarray(rng.integers(1, re.config.vocab_size, (4, 12)), jnp.int32)
    labels = jnp.asarray(rng.integers(1, re.config.vocab_size, (4, 8)), jnp.int32)

    def seq2seq_loss(mean_logits):
        return bf.elbo.cross_entropy_sum(
            mean_logits.reshape(-1, mean_logits.shape[-1]),
            labels.reshape(-1),
        )

    losses, _ = _elbo_steps(
        bm, bp, seq2seq_loss, {"input_ids": enc, "labels": labels}
    )
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def _leaf_by_path(tree, path: str):
    node = tree
    for part in path.split("/"):
        node = node[part]
    return node
