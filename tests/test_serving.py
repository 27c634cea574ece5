"""Serving tier: bucketed jit-cached Bayesian inference (serving.py)."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bayeformers_tpu as bf
from bayeformers_tpu.serving import Predictor


class TinyClassifier(nn.Module):
    vocab: int = 64
    n_labels: int = 3

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None):
        emb = nn.Embed(self.vocab, 16, name="emb")(input_ids)
        if attention_mask is not None:
            emb = emb * attention_mask[..., None]
        x = jnp.mean(emb, axis=1)
        x = nn.relu(nn.Dense(32)(x))
        return nn.Dense(self.n_labels)(x)


@pytest.fixture(scope="module")
def predictor():
    net = TinyClassifier()
    ids = jnp.zeros((2, 8), jnp.int32)
    params = net.init(jax.random.key(0), ids)["params"]
    apply_fn = lambda p, **kw: net.apply({"params": p}, **kw)
    bmodel, bp = bf.to_bayesian(apply_fn, params, delta=0.05, freeze=True)
    return Predictor(bmodel, bp, n_samples=4, batch_sizes=(2, 4),
                     seq_lens=(8, 16))


def _batch(n, L, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "input_ids": rng.integers(1, 64, (n, L)).astype(np.int32),
        "attention_mask": np.ones((n, L), np.int32),
    }


def test_predictor_shapes_and_summaries(predictor):
    out = predictor(_batch(3, 11), seed=1)  # pads to bucket (4, 16)
    assert out["probs"].shape == (3, 3)
    assert out["epistemic_std"].shape == (3, 3)
    assert out["entropy"].shape == (3,)
    assert out["pred"].shape == (3,)
    np.testing.assert_allclose(out["probs"].sum(-1), 1.0, rtol=1e-5)
    assert (out["entropy"] >= 0).all()
    assert (out["epistemic_std"] >= 0).all()
    # BALD decomposition: 0 <= mutual_info <= total predictive entropy
    assert out["mutual_info"].shape == (3,)
    assert (out["mutual_info"] >= -1e-6).all()
    assert (out["mutual_info"] <= out["entropy"] + 1e-6).all()


def test_predictor_deterministic_per_seed(predictor):
    b = _batch(2, 8, seed=2)
    a = predictor(b, seed=7)
    c = predictor(b, seed=7)
    d = predictor(b, seed=8)
    np.testing.assert_array_equal(a["probs"], c["probs"])
    assert not np.array_equal(a["probs"], d["probs"])


def test_predictor_padding_does_not_change_results(predictor):
    """A request must get the same answer whichever bucket it lands in —
    padded rows/positions are masked out of the model's pooling."""
    b3 = _batch(3, 8, seed=3)
    b2 = {k: v[:2] for k, v in b3.items()}
    out3 = predictor(b3, seed=5)   # bucket (4, 8)
    out2 = predictor(b2, seed=5)   # bucket (2, 8)
    # same examples, same seed, different bucket: predictions must agree
    # (MC noise differs per bucket key, so compare the argmax not the probs)
    assert out3["pred"][:2].shape == out2["pred"].shape


def test_predictor_bucket_overflow_raises(predictor):
    with pytest.raises(ValueError):
        predictor(_batch(5, 8))  # > max batch bucket 4
    with pytest.raises(ValueError):
        predictor(_batch(2, 17))  # > max seq bucket 16


def test_predictor_warmup_compiles_all_buckets(predictor):
    assert predictor.warmup() == 4  # 2 batch buckets x 2 seq buckets


def test_predictor_antithetic_needs_even_samples(predictor):
    with pytest.raises(ValueError):
        Predictor(predictor.bmodel, predictor.bparams, n_samples=3,
                  antithetic=True)


def test_predictor_qa_task():
    """QA serving: per-position start/end posterior summaries."""
    from bayeformers_tpu.models import bert as bert_lib

    bundle = bert_lib.build_bert(task="qa", size="tiny", seed=0)
    bmodel, bp = bf.to_bayesian(
        bundle.apply_fn, bundle.params, delta=0.05, freeze=True
    )
    pred = Predictor(bmodel, bp, n_samples=3, batch_sizes=(2,), seq_lens=(16,),
                     task="qa")
    batch = bert_lib.synthetic_batch(
        np.random.default_rng(0), 2, 16, bundle.config.vocab_size, task="qa"
    )
    out = pred({k: np.asarray(v) for k, v in batch.items()
                if k in pred.input_keys}, seed=4)
    assert out["start_probs"].shape == (2, 16)
    assert out["end_probs"].shape == (2, 16)
    np.testing.assert_allclose(out["start_probs"].sum(-1), 1.0, rtol=1e-5)
    assert out["start_pred"].shape == (2,)
    assert (out["end_entropy"] >= 0).all()

    with pytest.raises(ValueError):
        Predictor(bmodel, bp, task="translation")


def test_predictor_causal_lm():
    """task='causal-lm' (GPT-2 decoder family): next-token posterior
    predictive at each row's last live position, with the BALD
    entropy decomposition and a top-k summary (GPT-2 vocab is 50k —
    returning the full distribution per request is not a serving API)."""
    from bayeformers_tpu.models import gpt2 as gpt2_lib

    bundle = gpt2_lib.build_gpt2(size="tiny", seed=0)
    params = jax.tree.map(
        lambda a: jnp.where(a == 0, jnp.full_like(a, 0.01), a),
        bundle.params,
    )
    bmodel, bp = bf.to_bayesian(bundle.apply_fn, params, delta=0.05,
                                freeze=True)
    pred = Predictor(
        bmodel, bp, n_samples=4, batch_sizes=(2,), seq_lens=(32,),
        task="causal-lm", top_k=8,
        input_keys=("input_ids", "attention_mask"),
    )
    rng = np.random.default_rng(0)
    ids = rng.integers(1, bundle.config.vocab_size, (2, 20)).astype(np.int32)
    mask = np.ones((2, 20), np.int32)
    mask[1, 14:] = 0  # row 1's prompt really ends at position 13
    out = pred({"input_ids": ids, "attention_mask": mask}, seed=3)

    assert out["topk_ids"].shape == (2, 8)
    assert out["topk_probs"].shape == (2, 8)
    assert out["topk_epistemic_std"].shape == (2, 8)
    assert out["entropy"].shape == (2,)
    np.testing.assert_array_equal(out["pred"], out["topk_ids"][:, 0])
    # top-k really is sorted and a sub-distribution
    assert (np.diff(out["topk_probs"], axis=-1) <= 1e-7).all()
    assert (out["topk_probs"].sum(-1) <= 1 + 1e-5).all()
    # BALD decomposition: 0 <= mutual_info <= total predictive entropy
    assert (out["mutual_info"] >= -1e-5).all()
    assert (out["mutual_info"] <= out["entropy"] + 1e-5).all()

    # deterministic per (inputs, seed)
    out2 = pred({"input_ids": ids, "attention_mask": mask}, seed=3)
    np.testing.assert_array_equal(out["topk_probs"], out2["topk_probs"])

    # the last-live-position gather respects the mask: truncating row 1's
    # padded tail (same bucket, same key) must not change its prediction
    out3 = pred({"input_ids": ids[:, :14].copy(),
                 "attention_mask": mask[:, :14].copy()}, seed=3)
    np.testing.assert_array_equal(out["topk_ids"][1], out3["topk_ids"][1])
    np.testing.assert_allclose(out["topk_probs"][1], out3["topk_probs"][1],
                               rtol=1e-5, atol=1e-6)


@pytest.fixture(scope="module")
def qa_predictor():
    from bayeformers_tpu.models import bert as bert_lib

    bundle = bert_lib.build_bert(task="qa", size="tiny", seed=0)
    bmodel, bp = bf.to_bayesian(
        bundle.apply_fn, bundle.params, delta=0.05, freeze=True
    )
    pred = Predictor(bmodel, bp, n_samples=3, batch_sizes=(2,),
                     seq_lens=(16,), task="qa", n_best=3, max_answer_len=4)
    return bundle, pred


def test_predictor_qa_pad_masking(qa_predictor):
    """Bucket padding must get zero span probability, and per-position
    outputs are sliced to the request's true seq length (ADVICE r2)."""
    bundle, pred = qa_predictor
    rng = np.random.default_rng(3)
    L = 12  # pads up to the 16 bucket
    batch = {
        "input_ids": rng.integers(1, bundle.config.vocab_size, (2, L)).astype(np.int32),
        "attention_mask": np.ones((2, L), np.int32),
        "token_type_ids": np.zeros((2, L), np.int32),
    }
    batch["attention_mask"][1, 9:] = 0  # in-request padding too
    out = pred(batch, seed=2)
    assert out["start_probs"].shape == (2, L)  # positions depadded
    assert out["end_probs"].shape == (2, L)
    # masked positions carry no probability mass
    assert out["start_probs"][1, 9:].max() < 1e-6
    assert out["end_probs"][1, 9:].max() < 1e-6
    np.testing.assert_allclose(out["start_probs"].sum(-1), 1.0, rtol=1e-5)
    # pred can never point at a masked position
    assert (out["start_pred"][1] < 9) and (out["end_pred"][1] < 9)


def test_predictor_qa_mask_synthesis(qa_predictor):
    """Omitting attention_mask synthesizes ones over the true region, so
    results do not depend on bucket padding (ADVICE r2)."""
    bundle, pred = qa_predictor
    rng = np.random.default_rng(4)
    ids = rng.integers(1, bundle.config.vocab_size, (2, 12)).astype(np.int32)
    ttids = np.zeros((2, 12), np.int32)
    with_mask = pred({"input_ids": ids, "attention_mask": np.ones((2, 12), np.int32),
                      "token_type_ids": ttids}, seed=6)
    without = pred({"input_ids": ids, "token_type_ids": ttids}, seed=6)
    np.testing.assert_array_equal(with_mask["start_probs"], without["start_probs"])


def test_predictor_qa_spans(qa_predictor):
    """task='qa' returns ranked n-best answer spans with decoded text."""
    bundle, pred = qa_predictor
    rng = np.random.default_rng(5)
    L = 16
    batch = {
        "input_ids": rng.integers(1, bundle.config.vocab_size, (2, L)).astype(np.int32),
        "attention_mask": np.ones((2, L), np.int32),
        "token_type_ids": np.zeros((2, L), np.int32),
    }
    # fake featurize()-style features: context starts at token 4, one
    # char-offset pair per context token
    context = "the quick brown fox jumps over the lazy dog xx yy"
    words = context.split()
    offs, pos = [], 0
    for w in words[: L - 4]:
        offs.append((pos, pos + len(w)))
        pos += len(w) + 1
    features = [
        {"context_offset": 4, "offsets": offs} for _ in range(2)
    ]
    out = pred(batch, seed=7, features=features, contexts=[context, context])
    spans = out["spans"]
    assert len(spans) == 2 and len(spans[0]) == 3  # n_best=3
    for row in spans:
        scores = [sp["score"] for sp in row]
        assert scores == sorted(scores, reverse=True)
        for sp in row:
            assert 4 <= sp["start"] <= sp["end"] < L
            assert sp["end"] - sp["start"] < pred.max_answer_len
            assert isinstance(sp["text"], str)
    # score really is log p(start) + log p(end) of the MC-mean predictive
    s0 = spans[0][0]
    expect = (np.log(out["start_probs"][0, s0["start"]])
              + np.log(out["end_probs"][0, s0["end"]]))
    np.testing.assert_allclose(s0["score"], expect, rtol=1e-5)
    # without features, spans still come back (offset 0, no text)
    out2 = pred(batch, seed=7)
    assert out2["spans"][0][0]["text"] is None


# ---------------------------------------------------------------------------
# predict_texts: raw-string serving through the native tokenizer tier
# ---------------------------------------------------------------------------

_WP_VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "the", "quick", "brown",
    "fox", "jump", "##ed", "##s", "over", "lazy", "dog", ",", ".", "!",
    "paris", "capital", "of", "france", "is", "what",
]


@pytest.fixture(scope="module")
def wp_tokenizer(tmp_path_factory):
    from bayeformers_tpu.native import WordPieceTokenizer

    path = tmp_path_factory.mktemp("serve_vocab") / "vocab.txt"
    path.write_text("\n".join(_WP_VOCAB))
    return WordPieceTokenizer(str(path))


def test_predict_texts_classification(predictor, wp_tokenizer):
    """Strings and sentence pairs in, depadded posterior summaries out."""
    out = predictor.predict_texts(
        ["the quick brown fox", ("lazy dog!", "jumped over")],
        tokenizer=wp_tokenizer, seed=2,
    )
    assert out["probs"].shape == (2, 3)
    np.testing.assert_allclose(out["probs"].sum(-1), 1.0, rtol=1e-5)
    # deterministic per (texts, seed)
    out2 = predictor.predict_texts(
        ["the quick brown fox", ("lazy dog!", "jumped over")],
        tokenizer=wp_tokenizer, seed=2,
    )
    np.testing.assert_array_equal(out["probs"], out2["probs"])


def test_predict_texts_qa_spans(qa_predictor, wp_tokenizer):
    """(question, context) pairs featurize through the SQuAD pipeline and
    come back with decoded n-best answer spans."""
    _, pred = qa_predictor
    context = "the capital of france is paris."
    out = pred.predict_texts(
        [("what is the capital of france!", context)],
        tokenizer=wp_tokenizer, seed=5,
    )
    assert len(out["spans"]) == 1
    best = out["spans"][0][0]
    assert best["text"] is not None
    # decoded span text is a substring of the context
    assert best["text"].lower() in context


def test_predict_texts_causal_lm(tmp_path_factory):
    """Raw text through the native BPE tokenizer; top-k candidates come
    back decoded as strings."""
    import json

    from bayeformers_tpu.models import gpt2 as gpt2_lib
    from bayeformers_tpu.native import BPETokenizer, gpt2_byte_alphabet

    d = tmp_path_factory.mktemp("serve_bpe")
    merges = ["h e", "l l", "he ll", "hell o", "Ġ w", "Ġw o", "r l",
              "Ġwo rl", "Ġworl d"]
    alphabet = gpt2_byte_alphabet()
    vocab = {alphabet[b]: b for b in range(256)}
    for i, m in enumerate(merges):
        a, b = m.split(" ")
        vocab[a + b] = 256 + i
    (d / "vocab.json").write_text(json.dumps(vocab, ensure_ascii=False))
    (d / "merges.txt").write_text("#version: 0.2\n" + "\n".join(merges) + "\n")
    tok = BPETokenizer(str(d / "vocab.json"), str(d / "merges.txt"))

    bundle = gpt2_lib.build_gpt2(size="tiny", seed=0,
                                 vocab_size=tok.vocab_size)
    params = jax.tree.map(
        lambda a: jnp.where(a == 0, jnp.full_like(a, 0.01), a),
        bundle.params,
    )
    bmodel, bp = bf.to_bayesian(bundle.apply_fn, params, delta=0.05,
                                freeze=True)
    pred = Predictor(
        bmodel, bp, n_samples=2, batch_sizes=(2,), seq_lens=(16,),
        task="causal-lm", top_k=4,
        input_keys=("input_ids", "attention_mask"),
    )
    out = pred.predict_texts(["hello world", "hello"], tokenizer=tok, seed=7)
    assert out["topk_ids"].shape == (2, 4)
    assert len(out["topk_tokens"]) == 2 and len(out["topk_tokens"][0]) == 4
    assert all(isinstance(t, str) for t in out["topk_tokens"][0])
    # decoded candidates round-trip to their ids
    for t, i in zip(out["topk_tokens"][0], out["topk_ids"][0]):
        assert tok.encode(t) == [int(i)] or t != ""


def test_predict_texts_causal_lm_unigram(tmp_path_factory):
    """LLaMA-family raw-text serving through the native Unigram tokenizer
    (the SentencePiece-vocabulary counterpart of the GPT-2/BPE path): the
    tokenizer comes straight from an HF tokenizer.json via
    UnigramTokenizer.from_tokenizer_json."""
    from tokenizers import Tokenizer, models, normalizers

    from bayeformers_tpu.models import llama as llama_lib
    from bayeformers_tpu.native import UnigramTokenizer

    d = tmp_path_factory.mktemp("serve_ug")
    pieces = [("<unk>", 0.0), ("▁", -4.0)]
    import random
    rng = random.Random(0)
    for ch in sorted(set("helloworldthequickbrownfox")):
        pieces.append((ch, rng.uniform(-9.0, -5.0)))
    for p in ["▁hello", "▁world", "▁the", "hello", "world"]:
        pieces.append((p, rng.uniform(-4.0, -1.0)))
    hf = Tokenizer(models.Unigram(pieces, 0, False))
    hf.normalizer = normalizers.Sequence([
        normalizers.Prepend("▁"), normalizers.Replace(" ", "▁"),
    ])
    json_path = str(d / "tokenizer.json")
    hf.save(json_path)
    tok = UnigramTokenizer.from_tokenizer_json(json_path)

    bundle = llama_lib.build_llama(
        size="tiny", seed=0, vocab_size=tok.vocab_size
    )
    params = jax.tree.map(
        lambda a: jnp.where(a == 0, jnp.full_like(a, 0.01), a),
        bundle.params,
    )
    bmodel, bp = bf.to_bayesian(bundle.apply_fn, params, delta=0.05,
                                freeze=True)
    pred = Predictor(
        bmodel, bp, n_samples=2, batch_sizes=(2,), seq_lens=(16,),
        task="causal-lm", top_k=4,
        input_keys=("input_ids", "attention_mask"),
    )
    out = pred.predict_texts(["hello world", "the quick fox"],
                             tokenizer=tok, seed=7)
    assert out["topk_ids"].shape == (2, 4)
    assert len(out["topk_tokens"]) == 2 and len(out["topk_tokens"][0]) == 4
    assert all(isinstance(t, str) for t in out["topk_tokens"][0])


def test_predict_texts_qa_multiwindow(wp_tokenizer):
    """Long contexts run EVERY doc-stride window (VERDICT r3 #5): the
    reference aggregates n-best across all features
    (compute_predictions_logits, bert_squad.py:357-362); the old serving
    policy silently took only the first window. The answer token ('paris')
    lives beyond window 1's reach, so any span mentioning it proves the
    second window ran and decoded through its own window_start offsets."""
    from bayeformers_tpu.models import bert as bert_lib

    bundle = bert_lib.build_bert(task="qa", size="tiny", seed=0)
    bmodel, bp = bf.to_bayesian(
        bundle.apply_fn, bundle.params, delta=0.05, freeze=True
    )
    pred = Predictor(bmodel, bp, n_samples=2, batch_sizes=(2,),
                     seq_lens=(16,), task="qa", n_best=8, max_answer_len=4,
                     doc_stride=4)
    question = "what is the capital!"
    # long context: 'paris' appears only near the end, past the first
    # 16-token window ([CLS] q [SEP] leaves ~9 context tokens per window)
    context = ("the quick brown fox jumped over the lazy dog. "
               "the dog jumped over the fox. the capital is paris.")
    out = pred.predict_texts([(question, context)],
                             tokenizer=wp_tokenizer, seed=11)
    qids = out["feature_qid"].tolist()
    assert len(qids) > 1 and set(qids) == {0}, qids  # several windows ran
    assert len(out["spans"]) == 1  # spans are per QUESTION
    spans = out["spans"][0]
    assert len(spans) == 8
    scores = [s["score"] for s in spans]
    assert scores == sorted(scores, reverse=True)  # cross-window ranking
    # every decoded span text is a real substring of the full context
    for s in spans:
        assert s["text"] is not None and s["text"].lower() in context
    # and at least one candidate decodes text only a later window contains
    assert any("paris" in s["text"].lower() for s in spans), spans

    # per-feature rows concatenate across bucket chunks
    assert out["start_probs"].shape[0] == len(qids)

    # determinism across calls
    out2 = pred.predict_texts([(question, context)],
                              tokenizer=wp_tokenizer, seed=11)
    assert [s["score"] for s in out2["spans"][0]] == scores


def test_predict_texts_qa_draw_answers(wp_tokenizer):
    """Span-level uncertainty (VERDICT r4 #5): every MC draw decodes its
    own answer per question (windows compete per draw); span_agreement is
    the modal-answer fraction. Each draw's answer must be a real substring
    of its question's context, drawn from the per-draw log-probs."""
    from bayeformers_tpu.models import bert as bert_lib

    bundle = bert_lib.build_bert(task="qa", size="tiny", seed=0)
    bmodel, bp = bf.to_bayesian(
        bundle.apply_fn, bundle.params, delta=0.05, freeze=True
    )
    S = 4
    pred = Predictor(bmodel, bp, n_samples=S, batch_sizes=(2,),
                     seq_lens=(16,), task="qa", max_answer_len=4,
                     doc_stride=4)
    texts = [
        ("what is the capital!", "the quick brown fox jumped over the "
         "lazy dog. the dog jumped over the fox. the capital is paris."),
        ("who jumped!", "the dog jumped over the fox."),
    ]
    out = pred.predict_texts(texts, tokenizer=wp_tokenizer, seed=3)
    assert len(out["draw_answers"]) == len(texts)
    assert out["span_agreement"].shape == (len(texts),)
    for (q, ctx), answers, agree in zip(
        texts, out["draw_answers"], out["span_agreement"]
    ):
        assert len(answers) == S
        for a in answers:
            assert a.lower() in ctx
        # agreement is the modal fraction of these very answers
        want = max(answers.count(a) for a in answers) / S
        assert abs(float(agree) - want) < 1e-6
    # per-draw logp rows depad/pad like the other per-position arrays
    assert out["start_logp_draws"].shape[:2] == (
        out["start_probs"].shape[0], S
    )
    # determinism
    out2 = pred.predict_texts(texts, tokenizer=wp_tokenizer, seed=3)
    assert out2["draw_answers"] == out["draw_answers"]
