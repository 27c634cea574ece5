"""Tests for the native C++ WordPiece tokenizer (bayeformers_tpu/native).

Parity target: transformers.BertTokenizer token-id output on the same vocab.
Skips the native-backend assertions when no compiler is available (the
pure-Python fallback is always exercised).
"""
import numpy as np
import pytest

from bayeformers_tpu.native import WordPieceTokenizer

VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "the", "quick", "brown",
    "fox", "jump", "##ed", "##s", "over", "lazy", "dog", ",", ".", "!", "un",
    "##want", "run", "##ning", "he", "##llo", "world", "ca", "##fe",
]

TEXTS = [
    "The quick brown fox jumped over the lazy dog.",
    "unwanted running!",
    "totally-unknown zebra",
    "Héllo, wörld café",
    "  extra   whitespace\tand\nnewlines  ",
    "",
]


@pytest.fixture(scope="module")
def vocab_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    path.write_text("\n".join(VOCAB))
    return str(path)


@pytest.fixture(scope="module")
def hf_ids(vocab_path):
    from transformers import BertTokenizer

    bt = BertTokenizer(vocab_path, do_lower_case=True)
    return {t: bt.convert_tokens_to_ids(bt.tokenize(t)) for t in TEXTS}


def test_python_fallback_matches_hf(vocab_path, hf_ids):
    tok = WordPieceTokenizer(vocab_path, force_python=True)
    for text, expected in hf_ids.items():
        assert tok.tokenize(text) == expected, text


def test_native_matches_hf(vocab_path, hf_ids):
    tok = WordPieceTokenizer(vocab_path)
    if tok.backend != "native":
        pytest.skip("no C++ compiler available")
    for text, expected in hf_ids.items():
        assert tok.tokenize(text) == expected, text
    assert tok.vocab_size == len(VOCAB)
    assert tok.special_id("unk") == VOCAB.index("[UNK]")


def test_batch_encode(vocab_path):
    tok = WordPieceTokenizer(vocab_path)
    texts = TEXTS * 7
    ids, lengths = tok.encode_batch(texts, capacity=16)
    assert ids.shape == (len(texts), 16)
    for i, text in enumerate(texts):
        row = tok.tokenize(text)
        assert lengths[i] == len(row)
        np.testing.assert_array_equal(ids[i, : min(len(row), 16)], row[:16])


def test_duplicate_vocab_entries_last_wins(tmp_path):
    # HF load_vocab keeps the LAST occurrence of a duplicated token
    path = tmp_path / "vocab.txt"
    path.write_text("\n".join(["[PAD]", "[UNK]", "tok", "other", "tok"]))
    tok = WordPieceTokenizer(str(path))
    assert tok.tokenize("tok") == [4]


def test_offsets_native_matches_python(vocab_path):
    tok = WordPieceTokenizer(vocab_path)
    py = WordPieceTokenizer(vocab_path, force_python=True)
    if tok.backend != "native":
        pytest.skip("no C++ compiler available")
    for text in TEXTS:
        assert tok.tokenize_with_offsets(text) == py.tokenize_with_offsets(text), text


def test_offsets_are_subword_exact(vocab_path):
    tok = WordPieceTokenizer(vocab_path)
    text = "The quick brown fox jumped over the lazy dog."
    ids, offsets = tok.tokenize_with_offsets(text)
    assert ids == tok.tokenize(text)
    # every offset slices to the surface form of its piece
    slices = [text[s:e] for s, e in offsets]
    assert slices[:4] == ["The", "quick", "brown", "fox"]
    # subword split: "jumped" -> jump + ##ed with adjacent exact spans
    i = slices.index("jump")
    assert slices[i + 1] == "ed"
    assert offsets[i][1] == offsets[i + 1][0]
    # trailing '.' is its own token with its own 1-char span (the
    # word-granular fallback would blur it into the word span)
    assert slices[-1] == "."
    assert offsets[-1][1] - offsets[-1][0] == 1


def test_offsets_accent_folding(vocab_path):
    # 'café' -> ca + ##fe; the accented char folds but the source span
    # still covers the original codepoints
    tok = WordPieceTokenizer(vocab_path, force_python=True)
    text = "café"
    ids, offsets = tok.tokenize_with_offsets(text)
    assert [text[s:e] for s, e in offsets] == ["ca", "fé"]
    nat = WordPieceTokenizer(vocab_path)
    if nat.backend == "native":
        assert nat.tokenize_with_offsets(text) == (ids, offsets)
