"""Tests for the auxiliary subsystems: hypersearch, dumper, metrics, squad
pipeline, checkpointing (SURVEY.md §5 — all gap-fills or fixed versions of
broken reference components)."""
import json
import os

import jax
import numpy as np
import pytest

import bayeformers_tpu as bf
from bayeformers_tpu.utils import squad as squad_lib
from bayeformers_tpu.utils.dumper import Dumper
from bayeformers_tpu.utils.hypersearch import HyperSearch, Score
from bayeformers_tpu.utils.metrics import MetricsWriter, Report, run_name


# ---------------- hypersearch (reference C16) ------------------------------

def test_hypersearch_finds_max():
    hs = HyperSearch(seed=0)
    hs["x"] = (0.0, 1.0), HyperSearch.LINEAR_SCALE
    hs["y"] = (1e-3, 1e1), HyperSearch.LOG_SCALE
    best = hs.search(lambda x, y: -((x - 0.5) ** 2) - (np.log10(y) ** 2),
                     iterations=50)
    assert abs(best.hyperparameters["x"] - 0.5) < 0.2
    assert 0.1 < best.hyperparameters["y"] < 10


def test_hypersearch_log_scale_range():
    hs = HyperSearch(seed=1)
    hs["delta"] = (1e-2, 1e-1), HyperSearch.LOG_SCALE
    samples = [hs._sample()["delta"] for _ in range(100)]
    assert all(1e-2 <= s <= 1e-1 for s in samples)
    # log-uniform: ~half the draws below the geometric mean
    below = sum(s < np.sqrt(1e-2 * 1e-1) for s in samples)
    assert 25 < below < 75


def test_hypersearch_isolates_failures():
    calls = {"n": 0}

    def sometimes_crashes(x):
        calls["n"] += 1
        if calls["n"] % 2 == 0:
            raise RuntimeError("boom")
        return x

    hs = HyperSearch(seed=2)
    hs["x"] = (0.0, 1.0), HyperSearch.LINEAR_SCALE
    best = hs.search(sometimes_crashes, iterations=10)
    assert best.value > -np.inf
    with pytest.raises(RuntimeError):
        calls["n"] = 1  # next call raises
        hs.search(sometimes_crashes, iterations=1, on_error="raise")


def test_score_tracks_max():
    s = Score()
    assert s.update(1.0, {"a": 1})
    assert not s.update(0.5, {"a": 2})
    assert s.value == 1.0 and s.hyperparameters == {"a": 1}


# ---------------- dumper (reference C15 was broken) ------------------------

def test_dumper_nested_sections(tmp_path):
    d = Dumper(str(tmp_path / "run"))
    with d.section("train"):
        with d.section("epoch_0"):
            d.record(loss=1.5, acc=0.8)
        with d.section("epoch_1"):
            d.record(loss=1.2)
    with open(tmp_path / "run.json") as fh:
        data = json.load(fh)
    assert data["train"]["epoch_0"] == {"loss": 1.5, "acc": 0.8}
    assert data["train"]["epoch_1"]["loss"] == 1.2


# ---------------- metrics --------------------------------------------------

def test_metrics_writer_and_report(tmp_path):
    w = MetricsWriter(str(tmp_path), run_name("exp", delta=0.05))
    w.scalars("train", {"nll": 1.0, "acc": 0.5}, step=3)
    w.close()
    lines = [json.loads(l) for l in open(w.path)]
    assert {l["tag"] for l in lines} == {"train/nll", "train/acc"}
    assert all(l["step"] == 3 for l in lines)

    r = Report("a", "b")
    r.update(a=2.0)
    r.update(a=4.0, b=1.0)
    assert r.means(2) == {"a": 3.0, "b": 0.5}


# ---------------- squad pipeline -------------------------------------------

def test_squad_normalization_and_metrics():
    assert squad_lib.normalize_answer("The  Quick, Brown-Fox!") == "quick brownfox"
    assert squad_lib.exact_match_score("the cat", "Cat") == 1.0
    # note: articles are stripped by normalization, so use non-article tokens
    assert squad_lib.f1_score("x y z", "y z w") == pytest.approx(2 / 3)
    res = squad_lib.squad_evaluate(
        {"q1": "the cat", "q2": "wrong"},
        {"q1": ["cat"], "q2": ["right answer"]},
    )
    assert res["exact_match"] == 50.0
    assert 0 < res["f1"] <= 50.0


def test_windowize_doc_stride():
    # short doc: one window
    assert squad_lib.windowize(100, 384, 128) == [(0, 100)]
    # long doc: overlapping windows advancing by stride, covering everything
    wins = squad_lib.windowize(1000, 384, 128)
    assert wins[0] == (0, 384)
    assert all(b - a <= 384 for a, b in wins)
    assert wins[-1][1] == 1000
    starts = [a for a, _ in wins]
    assert starts == list(range(0, starts[-1] + 1, 128))


def test_featurize_span_mapping():
    # toy whitespace tokenizer with a vocab
    vocab = {}
    def tokenize(text):
        return [vocab.setdefault(tok, len(vocab) + 10) for tok in text.split()]

    context = " ".join(f"w{i}" for i in range(50))
    answer_start = len(" ".join(f"w{i}" for i in range(20))) + 1
    examples = [{
        "qid": "q0", "question": "what is it",
        "context": context,
        "answers": [{"text": "w20 w21", "answer_start": answer_start}],
    }]
    feats = squad_lib.featurize(examples, tokenize, max_seq=32, doc_stride=8)
    assert len(feats) > 1  # long context: multiple windows
    hits = [f for f in feats if f["start_position"] != 0]
    assert hits, "at least one window contains the answer span"
    f = hits[0]
    ctx_tok = f["input_ids"][f["start_position"]: f["end_position"] + 1]
    assert ctx_tok == tokenize("w20 w21")
    # windows without the answer point at [CLS]
    assert any(f["start_position"] == 0 for f in feats)


def test_best_span():
    start = np.zeros(20); end = np.zeros(20)
    start[7] = 5.0; end[9] = 5.0
    (s, e), score = squad_lib.best_span(start, end, context_offset=3)
    assert (s, e) == (7, 9)
    # end before start is never selected
    start[:] = 0; end[:] = 0
    start[10] = 5.0; end[4] = 5.0
    (s, e), _ = squad_lib.best_span(start, end, context_offset=3)
    assert e >= s


def test_n_best_spans_matches_best_span():
    rng = np.random.default_rng(0)
    start = rng.normal(size=30)
    end = rng.normal(size=30)
    (s, e), score = squad_lib.best_span(start, end, context_offset=5,
                                        max_answer_len=7)
    top = squad_lib.n_best_spans(start, end, context_offset=5,
                                 max_answer_len=7, n_best=4)
    assert (top[0][0], top[0][1]) == (s, e)
    np.testing.assert_allclose(top[0][2], score, rtol=1e-6)
    assert len(top) == 4
    scores = [t[2] for t in top]
    assert scores == sorted(scores, reverse=True)
    for s_i, e_i, _ in top:
        assert 5 <= s_i <= e_i < s_i + 7


# ---------------- checkpoint ------------------------------------------------

def test_checkpoint_roundtrip(tmp_path):
    import flax.linen as nn
    import jax.numpy as jnp
    from bayeformers_tpu.utils import checkpoint as ckpt_lib

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(3)(x)

    net = Tiny()
    params = net.init(jax.random.key(0), jnp.ones((1, 4)))["params"]
    apply_fn = lambda p, x: net.apply({"params": p}, x)
    _, bp = bf.to_bayesian(apply_fn, params, delta=0.05)
    path = ckpt_lib.save_checkpoint(
        str(tmp_path / "ckpt"), bp, step=7, metadata={"delta": 0.05}
    )
    assert os.path.exists(path)
    assert ckpt_lib.latest_step(str(tmp_path / "ckpt")) == 7
    restored, meta = ckpt_lib.load_checkpoint(str(tmp_path / "ckpt"), bp, step=7)
    np.testing.assert_array_equal(
        np.asarray(restored.rho["Dense_0/kernel"]),
        np.asarray(bp.rho["Dense_0/kernel"]),
    )
    assert meta == {"delta": 0.05}


def test_squad_end_to_end_decode():
    """featurize -> best_span -> decode_span -> squad_evaluate == 100 when
    logits point exactly at the gold span."""
    vocab = {}
    def tokenize(text):
        return [vocab.setdefault(t, len(vocab) + 10) for t in text.split()]

    context = " ".join(f"w{i}" for i in range(30))
    ans_text = "w12 w13"
    ans_start = context.index("w12")
    examples = [{
        "qid": "q1", "question": "where is it",
        "context": context,
        "answers": [{"text": ans_text, "answer_start": ans_start}],
    }]
    feats = squad_lib.featurize(examples, tokenize, max_seq=64, doc_stride=16)
    assert len(feats) == 1
    f = feats[0]
    # training positions point at the right tokens
    span_ids = f["input_ids"][f["start_position"]: f["end_position"] + 1]
    assert span_ids == tokenize(ans_text)
    # eval path: plant perfect logits at the gold span, decode text
    n = len(f["input_ids"])
    start = np.zeros(n); end = np.zeros(n)
    start[f["start_position"]] = 9.0
    end[f["end_position"]] = 9.0
    (s, e), _ = squad_lib.best_span(start, end, f["context_offset"])
    text = squad_lib.decode_span(f, context, s, e)
    assert text == ans_text
    res = squad_lib.squad_evaluate({"q1": text}, {"q1": [ans_text]})
    assert res == {"exact_match": 100.0, "f1": 100.0}


def test_tokenize_with_offsets():
    def tokenize(text):
        # toy sub-word tokenizer: splits words longer than 3 chars in two
        out = []
        for _ in range(1):
            pass
        w = text
        if len(w) > 3:
            return [hash(w[:3]) % 1000, hash(w[3:]) % 1000]
        return [hash(w) % 1000]

    text = "alpha bb gamma"
    ids, offsets = squad_lib.tokenize_with_offsets(text, tokenize)
    assert len(ids) == len(offsets) == 5  # alpha->2, bb->1, gamma->2
    assert offsets[0] == (0, 5) and offsets[1] == (0, 5)
    assert offsets[2] == (6, 8)
    assert offsets[3] == (9, 14) and offsets[4] == (9, 14)


def test_glue_tsv_featurization(tmp_path):
    """Raw MRPC-style TSV -> model arrays via utils/glue.py."""
    from bayeformers_tpu.utils import glue as glue_lib

    rows = ["label\tid1\tid2\ts1\ts2"]
    for i in range(6):
        rows.append(f"{i % 2}\ta{i}\tb{i}\thello world {i}\tgood day {i}")
    (tmp_path / "train.tsv").write_text("\n".join(rows))
    (tmp_path / "dev.tsv").write_text("\n".join(rows[:4]))

    vocab = {}
    def tokenize(text):
        return [vocab.setdefault(t, len(vocab) + 10) for t in text.split()]

    train, dev = glue_lib.load_glue_task(
        str(tmp_path), "mrpc", tokenize, max_seq=16
    )
    assert train["input_ids"].shape == (6, 16)
    assert dev["labels"].tolist() == [0, 1, 0]
    row = train["input_ids"][0]
    assert row[0] == 101  # [CLS]
    sep_positions = np.where(row == 102)[0]
    assert len(sep_positions) == 2  # pair: two [SEP]s
    # token types flip to 1 after the first [SEP]
    assert train["token_type_ids"][0][sep_positions[0] + 1] == 1
    assert train["token_type_ids"][0][1] == 0
    # cache round-trips
    train2, _ = glue_lib.load_glue_task(str(tmp_path), "mrpc", tokenize, max_seq=16)
    np.testing.assert_array_equal(train["input_ids"], train2["input_ids"])


def test_glue_truncation():
    from bayeformers_tpu.utils import glue as glue_lib

    def tokenize(text):
        return list(range(20, 20 + len(text.split())))

    long_a = " ".join(["w"] * 30)
    out = glue_lib.featurize_pairs(
        [(long_a, long_a)], [1], tokenize, max_seq=24
    )
    assert out["input_ids"].shape == (1, 24)
    assert out["attention_mask"][0].sum() == 24  # filled to the brim


def test_squad_punctuation_exact_decode_with_offsets_fn(tmp_path):
    """Answer abutting punctuation decodes exactly when featurize gets
    subword-exact offsets (VERDICT weak #5: the word-granular fallback
    returns 'Paris,' here)."""
    from bayeformers_tpu.native import WordPieceTokenizer

    vocab = (
        ["[PAD]"] + [f"u{i}" for i in range(99)] + ["[UNK]", "[CLS]", "[SEP]",
         "he", "was", "born", "in", "paris", ",", ".", "france", "where"]
    )
    vp = tmp_path / "vocab.txt"
    vp.write_text("\n".join(vocab))
    tok = WordPieceTokenizer(str(vp))

    context = "He was born in Paris, France."
    ans_text = "Paris"
    examples = [{
        "qid": "q1", "question": "where",
        "context": context,
        "answers": [{"text": ans_text, "answer_start": context.index("Paris")}],
    }]
    feats = squad_lib.featurize(
        examples, tok.tokenize, max_seq=32, doc_stride=8,
        offsets_fn=tok.tokenize_with_offsets,
    )
    f = feats[0]
    # the training span covers exactly the 'paris' token (not the comma)
    assert f["start_position"] == f["end_position"]
    n = len(f["input_ids"])
    start = np.zeros(n); end = np.zeros(n)
    start[f["start_position"]] = 9.0
    end[f["end_position"]] = 9.0
    (s, e), _ = squad_lib.best_span(start, end, f["context_offset"])
    assert squad_lib.decode_span(f, context, s, e) == "Paris"

    # contrast: the word-granular fallback drags the comma along
    feats_wg = squad_lib.featurize(
        examples, tok.tokenize, max_seq=32, doc_stride=8,
    )
    fw = feats_wg[0]
    assert squad_lib.decode_span(
        fw, context, fw["start_position"], fw["end_position"]
    ) == "Paris,"


def test_expected_calibration_error():
    from bayeformers_tpu.utils.metrics import expected_calibration_error

    # perfectly calibrated hard predictions: confidence 1.0, always right
    probs = np.eye(4)[np.array([0, 1, 2, 3])]
    labels = np.array([0, 1, 2, 3])
    assert expected_calibration_error(probs, labels) < 1e-12

    # maximally mis-calibrated: confidence 1.0, always wrong -> ECE = 1
    labels_wrong = np.array([1, 2, 3, 0])
    assert abs(expected_calibration_error(probs, labels_wrong) - 1.0) < 1e-12

    # 80% confidence, 50% accuracy -> ECE = 0.3
    probs2 = np.tile(np.array([[0.8, 0.2]]), (100, 1))
    labels2 = np.array([0] * 50 + [1] * 50)
    assert abs(expected_calibration_error(probs2, labels2) - 0.3) < 1e-9


def test_tb_event_writer_roundtrip(tmp_path):
    """The dependency-free TensorBoard writer (utils/tb.py) must produce
    spec-conformant TFRecord/Event files: crc32c matches the standard test
    vector, and a written run parses back tag-exact (reference logged via
    tensorboardX, `examples/bert_glue.py:93,141-142`)."""
    from bayeformers_tpu.utils import tb

    # RFC 3720 crc32c known-answer test
    assert tb.crc32c(b"123456789") == 0xE3069283

    w = tb.EventWriter(str(tmp_path), "run1")
    w.scalar("train/loss", 1.5, step=0)
    w.scalars("eval", {"acc": 0.75, "nll": 2.25}, step=3)
    w.close()

    events = list(tb.read_events(w.path))
    # first record is the file_version header (no scalars)
    assert events[0][1] == {}
    assert events[1] == (0, {"train/loss": 1.5})
    assert events[2][0] == 3
    assert events[2][1]["eval/acc"] == 0.75
    assert events[2][1]["eval/nll"] == 2.25


def test_metrics_writer_emits_tb_events(tmp_path):
    import glob

    from bayeformers_tpu.utils import tb
    from bayeformers_tpu.utils.metrics import MetricsWriter

    w = MetricsWriter(str(tmp_path), "runA")
    w.scalar("phase/loss", 0.5, 7)
    w.close()
    files = glob.glob(str(tmp_path / "runA" / "events.out.tfevents.*"))
    assert len(files) == 1
    events = list(tb.read_events(files[0]))
    assert (7, {"phase/loss": 0.5}) in events


def test_tb_events_readable_by_real_tensorboard(tmp_path):
    """Cross-validation: files from the hand-rolled encoder must load through
    stock TensorBoard's own event reader."""
    try:
        from tensorboard.backend.event_processing.event_file_loader import (
            LegacyEventFileLoader,
        )
    except Exception:
        import pytest

        pytest.skip("tensorboard not importable")
    from bayeformers_tpu.utils import tb

    w = tb.EventWriter(str(tmp_path), "runX")
    w.scalar("a/b", 3.25, step=11)
    w.close()
    events = list(LegacyEventFileLoader(w.path).Load())
    assert events[0].file_version == "brain.Event:2"
    assert events[1].step == 11
    assert events[1].summary.value[0].tag == "a/b"
    assert abs(events[1].summary.value[0].simple_value - 3.25) < 1e-6


# ---------------------------------------------------------------------------
# load_lm_corpus (real-text causal-LM data path over the native BPE tier)
# ---------------------------------------------------------------------------

def _write_bpe_corpus(root, text_a="hello world. ", text_b="the worlds!! ",
                      reps=40):
    """Tiny-but-complete GPT-2-format artifacts + two .txt docs under
    ``root`` (vocab/merges next to the corpus, as load_lm_corpus expects)."""
    from bayeformers_tpu.native import gpt2_byte_alphabet

    merges = ["h e", "l l", "he ll", "hell o", "Ġ w", "Ġw o", "r l",
              "Ġwo rl", "Ġworl d", "t h", "th e"]
    alphabet = gpt2_byte_alphabet()
    vocab = {alphabet[b]: b for b in range(256)}
    for i, m in enumerate(merges):
        a, b = m.split(" ")
        vocab[a + b] = 256 + i
    vocab["<|endoftext|>"] = 256 + len(merges)
    (root / "vocab.json").write_text(json.dumps(vocab, ensure_ascii=False),
                                     encoding="utf-8")
    (root / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(merges) + "\n", encoding="utf-8")
    (root / "a.txt").write_text(text_a * reps, encoding="utf-8")
    (root / "b.txt").write_text(text_b * reps, encoding="utf-8")
    return len(vocab)


def test_load_lm_corpus_packs_and_splits(tmp_path):
    from bayeformers_tpu.utils.data import load_lm_corpus

    vocab_size = _write_bpe_corpus(tmp_path)
    tr, te, v, eot = load_lm_corpus(str(tmp_path), seq=16, seed=3)
    assert v == vocab_size and eot == vocab_size - 1
    assert tr.dtype == np.int32 and tr.shape[1] == 16 and te.shape[1] == 16
    assert len(te) >= 1 and len(tr) > len(te)
    assert int(max(tr.max(), te.max())) < v
    # documents are joined with <|endoftext|> (exactly one per doc)
    assert int(np.sum(tr == eot) + np.sum(te == eot)) in (1, 2)
    # deterministic split
    tr2, te2, _, _ = load_lm_corpus(str(tmp_path), seq=16, seed=3)
    np.testing.assert_array_equal(tr, tr2)
    np.testing.assert_array_equal(te, te2)
    # single-file form with explicit artifact paths
    tr3, _, _, _ = load_lm_corpus(
        str(tmp_path / "a.txt"), seq=16,
        vocab_json=str(tmp_path / "vocab.json"),
        merges_txt=str(tmp_path / "merges.txt"))
    assert tr3.shape[1] == 16


def test_load_lm_corpus_errors(tmp_path):
    from bayeformers_tpu.utils.data import load_lm_corpus

    _write_bpe_corpus(tmp_path, reps=1)
    with pytest.raises(ValueError, match="too small"):
        load_lm_corpus(str(tmp_path), seq=4096)
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(FileNotFoundError):
        load_lm_corpus(str(empty), seq=16)
    # loose .txt with no artifacts anywhere -> actionable error
    loose = tmp_path / "loose"
    loose.mkdir()
    (loose / "c.txt").write_text("hello", encoding="utf-8")
    with pytest.raises(FileNotFoundError, match="gpt2-bootstrap"):
        load_lm_corpus(str(loose), seq=4)


def _write_unigram_corpus(root, reps=60):
    """HF Unigram tokenizer.json (LLaMA-style Prepend normalizer) + two
    .txt docs under ``root`` — the SentencePiece-family counterpart of
    _write_bpe_corpus for load_lm_corpus's tokenizer.json resolution."""
    import random

    from tokenizers import Tokenizer, models, normalizers

    rng = random.Random(3)
    pieces = [("<unk>", 0.0), ("</s>", -2.0), ("▁", -6.0)]
    for ch in sorted(set("helloworldthequickbrownfox.!")):
        pieces.append((ch, rng.uniform(-10.0, -6.0)))
    for p in ["▁hello", "▁world", "▁the", "▁quick", "▁brown", "▁fox",
              "hello", "world"]:
        pieces.append((p, rng.uniform(-5.0, -1.0)))
    tok = Tokenizer(models.Unigram(pieces, 0, False))
    tok.normalizer = normalizers.Sequence([
        normalizers.Prepend("▁"), normalizers.Replace(" ", "▁"),
    ])
    tok.save(str(root / "tokenizer.json"))
    (root / "a.txt").write_text("hello world. " * reps, encoding="utf-8")
    (root / "b.txt").write_text("the quick brown fox! " * reps,
                                encoding="utf-8")
    return len(pieces)


def test_load_lm_corpus_unigram_tokenizer_json(tmp_path):
    """A corpus with tokenizer.json (and no vocab.json/merges.txt) rides
    the native Unigram tokenizer: SentencePiece-family (LLaMA/T5) real-text
    training data without GPT-2 artifacts (VERDICT r3 #3 consumer)."""
    from bayeformers_tpu.utils.data import load_lm_corpus

    vocab_size = _write_unigram_corpus(tmp_path)
    tr, te, v, eot = load_lm_corpus(str(tmp_path), seq=16, seed=3)
    assert v == vocab_size
    assert eot == 1  # </s> is the document separator
    assert tr.dtype == np.int32 and tr.shape[1] == 16
    assert int(np.sum(tr == eot) + np.sum(te == eot)) in (1, 2)
    assert int(max(tr.max(), te.max())) < v
    # explicit tokenizer_json path form
    tr2, _, _, _ = load_lm_corpus(
        str(tmp_path / "a.txt"), seq=16, seed=3,
        tokenizer_json=str(tmp_path / "tokenizer.json"),
    )
    assert tr2.shape[1] == 16


def test_squad_draw_metrics():
    """draw_metrics: per-draw EM/F1 stats + modal-answer agreement
    (utils/squad.py — the reference acc_std idiom at answer level,
    `examples/bert_squad.py:481-484`)."""
    from bayeformers_tpu.utils import squad as squad_lib

    refs = {"a": ["paris"], "b": ["the dog"]}
    # draw 0 gets both right; draw 1 misses 'a'; draws 2-3 = draw 0
    per_draw = [
        {"a": "paris", "b": "the dog"},
        {"a": "london", "b": "the dog"},
        {"a": "paris", "b": "the dog"},
        {"a": "paris", "b": "the dog"},
    ]
    m = squad_lib.draw_metrics(per_draw, refs)
    assert m["em_mean_of_draws"] == pytest.approx(100 * (1 + 0.5 + 1 + 1) / 4)
    assert m["em_std_of_draws"] > 0.0
    # q 'a': 3/4 agree; q 'b': 4/4 -> mean 0.875
    assert m["span_agreement"] == pytest.approx(0.875)
    # certain posterior: all draws identical
    m2 = squad_lib.draw_metrics([per_draw[0]] * 4, refs)
    assert m2["span_agreement"] == 1.0
    assert m2["em_std_of_draws"] == 0.0
