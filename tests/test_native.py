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


# ---------------------------------------------------------------------------
# GPT-2 byte-level BPE (bayeformers_tpu/native/bpe.cc)
# ---------------------------------------------------------------------------

from bayeformers_tpu.native import BPETokenizer, gpt2_byte_alphabet  # noqa: E402

# A small but complete GPT-2-style vocabulary: the full 256-byte alphabet
# (ids 0..255) plus merge products — the same file format the stock
# vocab.json/merges.txt use, written in the mapped alphabet.
_MERGES = [
    "h e", "l l", "he ll", "hell o", "Ġ w", "Ġw o", "r l", "Ġwo rl",
    "Ġworl d", "Ġ t", "Ġt he", "1 2", "12 3", "t h", "th e", "' s",
    "Ġ h", "Ġh e", "Ġhe ll", "Ġhell o", "! !",
]

_BPE_TEXTS = [
    "hello world",
    "the hello worlds",
    "  hello   world ",
    "hello's world 'til 're 've 'll",
    "hello123 worlds!!",
    "tabs\tand\nnewlines  end",
    "punct?!... runs---",
    "héllo wörld",   # non-ASCII letters
    "trailing spaces   ",
    "",
]


@pytest.fixture(scope="module")
def bpe_files(tmp_path_factory):
    import json

    d = tmp_path_factory.mktemp("bpe")
    alphabet = gpt2_byte_alphabet()
    vocab = {alphabet[b]: b for b in range(256)}
    for i, merge in enumerate(_MERGES):
        a, b = merge.split(" ")
        vocab[a + b] = 256 + i
    vocab["<|endoftext|>"] = 256 + len(_MERGES)
    (d / "vocab.json").write_text(json.dumps(vocab, ensure_ascii=False),
                                  encoding="utf-8")
    (d / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(_MERGES) + "\n", encoding="utf-8"
    )
    return str(d / "vocab.json"), str(d / "merges.txt")


@pytest.fixture(scope="module")
def hf_bpe_ids(bpe_files):
    from transformers import GPT2Tokenizer

    tok = GPT2Tokenizer(*bpe_files)
    return {t: tok(t)["input_ids"] for t in _BPE_TEXTS}


def test_bpe_python_fallback_matches_hf(bpe_files, hf_bpe_ids):
    tok = BPETokenizer(*bpe_files, force_python=True)
    for text, expected in hf_bpe_ids.items():
        assert tok.encode(text) == expected, repr(text)


def test_bpe_native_matches_hf(bpe_files, hf_bpe_ids):
    tok = BPETokenizer(*bpe_files)
    if tok.backend != "native":
        pytest.skip("no C++ compiler available")
    for text, expected in hf_bpe_ids.items():
        assert tok.encode(text) == expected, repr(text)
    assert tok.vocab_size == 256 + len(_MERGES) + 1
    assert tok.token_id("<|endoftext|>") == 256 + len(_MERGES)
    assert tok.token_id("nonexistent-token") == -1


def test_bpe_decode_roundtrip(bpe_files):
    tok = BPETokenizer(*bpe_files)
    for text in _BPE_TEXTS:
        assert tok.decode(tok.encode(text)) == text, repr(text)
    if tok.backend == "native":
        py = BPETokenizer(*bpe_files, force_python=True)
        for text in _BPE_TEXTS:
            assert tok.encode(text) == py.encode(text), repr(text)


def test_bpe_batch_encode(bpe_files):
    tok = BPETokenizer(*bpe_files)
    texts = _BPE_TEXTS * 7
    ids, lengths = tok.encode_batch(texts, capacity=32, n_threads=3)
    assert ids.shape == (len(texts), 32)
    for i, t in enumerate(texts):
        row = tok.encode(t)
        assert lengths[i] == len(row)
        np.testing.assert_array_equal(ids[i, : min(len(row), 32)],
                                      row[:32])


# ---------------------------------------------------------------------------
# SentencePiece-style Unigram (unigram.cc) — T5/LLaMA vocabulary family
# ---------------------------------------------------------------------------

from bayeformers_tpu.native import UnigramTokenizer  # noqa: E402

_UG_TEXTS = [
    "hello world",
    "the quick brown fox",
    " leading space",
    "double  space inside",
    "héllo wörld",
    "punct! marks? here.",
    "∑ unknown ∑∑ runs ∑",
    "",
    "▁literal metaspace",
]


def _ug_vocab(seed: int, byte_fallback: bool):
    """A Unigram vocabulary with continuous random scores (tie-free) that
    single-codepoint-covers the test texts except '∑' (the unk/byte path)."""
    import random

    rng = random.Random(seed)
    singles = sorted(set("".join(_UG_TEXTS).replace(" ", "").replace("∑", "")))
    multis = [
        "▁hello", "▁world", "hello", "llo", "▁the", "▁qu", "ick", "▁fox",
        "▁br", "own", "▁space", "space", "▁lead", "ing", "▁in", "side",
        "▁mark", "s?", "▁here", "▁runs", "un", "known",
    ]
    vocab = [("<unk>", 0.0), ("▁", rng.uniform(-10.0, -1.0))]
    for p in singles + multis:
        vocab.append((p, rng.uniform(-10.0, -1.0)))
    if byte_fallback:
        for b in range(256):
            vocab.append((f"<0x{b:02X}>", rng.uniform(-14.0, -11.0)))
    return vocab


def _save_hf_unigram(tmpdir, flavor: str, byte_fallback: bool, seed: int):
    """Build + save an HF tokenizer.json: 'prepend' = LLaMA-style normalizer
    sequence, 'metaspace' = T5-style split pre_tokenizer."""
    from tokenizers import Tokenizer, models, normalizers, pre_tokenizers

    vocab = _ug_vocab(seed, byte_fallback)
    tok = Tokenizer(models.Unigram(vocab, 0, byte_fallback))
    if flavor == "prepend":
        tok.normalizer = normalizers.Sequence([
            normalizers.Prepend("▁"), normalizers.Replace(" ", "▁"),
        ])
    else:
        tok.pre_tokenizer = pre_tokenizers.Metaspace(
            replacement="▁", prepend_scheme="first", split=True
        )
    path = str(tmpdir / f"ug_{flavor}_{int(byte_fallback)}.json")
    tok.save(path)
    return path, tok


@pytest.mark.parametrize("flavor", ["prepend", "metaspace"])
@pytest.mark.parametrize("byte_fallback", [False, True])
def test_unigram_matches_hf(tmp_path, flavor, byte_fallback):
    path, hf = _save_hf_unigram(tmp_path, flavor, byte_fallback, seed=7)
    for force_python in (True, False):
        tok = UnigramTokenizer.from_tokenizer_json(
            path, force_python=force_python
        )
        if not force_python and tok.backend != "native":
            pytest.skip("no C++ compiler available")
        for text in _UG_TEXTS:
            assert tok.encode(text) == hf.encode(text).ids, (
                flavor, byte_fallback, tok.backend, text
            )


def test_unigram_native_matches_python(tmp_path):
    path, _ = _save_hf_unigram(tmp_path, "prepend", True, seed=11)
    nat = UnigramTokenizer.from_tokenizer_json(path)
    if nat.backend != "native":
        pytest.skip("no C++ compiler available")
    py = UnigramTokenizer.from_tokenizer_json(path, force_python=True)
    for text in _UG_TEXTS:
        assert nat.encode(text) == py.encode(text), text
    assert nat.vocab_size == py.vocab_size
    assert nat.piece_id("▁hello") == py.piece_id("▁hello") >= 0
    assert nat.piece_id("absent-piece") == py.piece_id("absent-piece") == -1


def test_unigram_decode_roundtrip(tmp_path):
    # byte fallback makes every text lossless (unknowns ride <0xXX> pieces)
    # — except literal U+2581 input, which decode maps to ' ' like every
    # other metaspace (inherent to the SentencePiece scheme; HF does the same)
    path, _ = _save_hf_unigram(tmp_path, "prepend", True, seed=3)
    for force_python in (True, False):
        tok = UnigramTokenizer.from_tokenizer_json(
            path, force_python=force_python
        )
        if not force_python and tok.backend != "native":
            pytest.skip("no C++ compiler available")
        for text in _UG_TEXTS:
            if "▁" in text:
                continue
            assert tok.decode(tok.encode(text)) == text, (tok.backend, text)


def test_unigram_batch_encode(tmp_path):
    path, _ = _save_hf_unigram(tmp_path, "prepend", False, seed=5)
    tok = UnigramTokenizer.from_tokenizer_json(path)
    texts = [t for t in _UG_TEXTS if t]
    ids, lengths = tok.encode_batch(texts, capacity=64, n_threads=2)
    assert ids.shape == (len(texts), 64)
    for i, t in enumerate(texts):
        row = tok.encode(t)
        assert lengths[i] == len(row)
        assert ids[i, : len(row)].tolist() == row


def test_unigram_split_mode_interior_metaspace_refused(tmp_path):
    """A split-mode Metaspace json whose vocab carries an interior-metaspace
    piece would make whole-string Viterbi diverge from HF — must raise."""
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = _ug_vocab(9, False) + [("▁▁", -1.5)]
    tok = Tokenizer(models.Unigram(vocab, 0, False))
    tok.pre_tokenizer = pre_tokenizers.Metaspace(
        replacement="▁", prepend_scheme="first", split=True
    )
    path = str(tmp_path / "bad.json")
    tok.save(path)
    with pytest.raises(NotImplementedError, match="interior-metaspace"):
        UnigramTokenizer.from_tokenizer_json(path)
