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
