"""Native (C++) runtime tier: WordPiece and GPT-2 byte-level BPE tokenizers
with ctypes bindings.

The shared libraries are compiled on first use with g++ (cached next to the
source); pure-Python fallbacks keep everything working where no compiler
exists. See wordpiece.cc / bpe.cc for the implementation notes.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC_DIR = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_SRC_DIR, "libwordpiece.so")
_BUILD_LOCK = threading.Lock()


def _compile(src_name: str, so_path: str) -> Optional[str]:
    src = os.path.join(_SRC_DIR, src_name)
    with _BUILD_LOCK:
        if os.path.exists(so_path) and os.path.getmtime(so_path) >= os.path.getmtime(src):
            return so_path
        try:
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
                 src, "-o", so_path],
                check=True, capture_output=True, timeout=120,
            )
            return so_path
        except Exception:
            return None


def _build_library() -> Optional[str]:
    return _compile("wordpiece.cc", _SO_PATH)


_lib = None
_lib_tried = False


def _get_lib():
    global _lib, _lib_tried
    if _lib is None and not _lib_tried:
        _lib_tried = True
        path = _build_library()
        if path:
            lib = ctypes.CDLL(path)
            lib.wp_load.restype = ctypes.c_void_p
            lib.wp_load.argtypes = [ctypes.c_char_p, ctypes.c_int]
            lib.wp_free.argtypes = [ctypes.c_void_p]
            lib.wp_vocab_size.restype = ctypes.c_int32
            lib.wp_vocab_size.argtypes = [ctypes.c_void_p]
            lib.wp_special_id.restype = ctypes.c_int32
            lib.wp_special_id.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
            lib.wp_encode.restype = ctypes.c_int64
            lib.wp_encode.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ]
            lib.wp_encode_offsets.restype = ctypes.c_int64
            lib.wp_encode_offsets.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ]
            lib.wp_encode_batch.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int32,
            ]
            _lib = lib
    return _lib


class WordPieceTokenizer:
    """BERT-style tokenizer backed by the native library when available.

    ``tokenize(text)`` returns raw WordPiece ids (no special tokens) — the
    exact callable the SQuAD featurizer expects
    (bayeformers_tpu/utils/squad.py). ``encode_batch`` runs multithreaded in
    C++.
    """

    def __init__(self, vocab_path: str, lowercase: bool = True,
                 force_python: bool = False):
        self.vocab_path = vocab_path
        self.lowercase = lowercase
        self._handle = None
        self._lib = None if force_python else _get_lib()
        if self._lib is not None:
            self._handle = self._lib.wp_load(
                vocab_path.encode(), 1 if lowercase else 0
            )
            if not self._handle:
                self._lib = None
        if self._lib is None:
            self._py = _PyWordPiece(vocab_path, lowercase)
        else:
            self._py = None

    @property
    def backend(self) -> str:
        return "native" if self._lib is not None else "python"

    def special_id(self, name: str) -> int:
        if self._lib is not None:
            return int(self._lib.wp_special_id(self._handle, name.encode()))
        return self._py.special_ids[name]

    @property
    def vocab_size(self) -> int:
        if self._lib is not None:
            return int(self._lib.wp_vocab_size(self._handle))
        return len(self._py.vocab)

    def tokenize(self, text: str) -> list[int]:
        if self._lib is not None:
            cap = max(64, 2 * len(text) + 8)
            out = np.empty(cap, dtype=np.int32)
            n = self._lib.wp_encode(
                self._handle, text.encode("utf-8"),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap,
            )
            while n > cap:  # rare: re-run with exact capacity
                cap = int(n)
                out = np.empty(cap, dtype=np.int32)
                n = self._lib.wp_encode(
                    self._handle, text.encode("utf-8"),
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap,
                )
            return out[:n].tolist()
        return self._py.tokenize(text)

    def tokenize_with_offsets(
        self, text: str
    ) -> tuple[list[int], list[tuple[int, int]]]:
        """(ids, [(char_start, char_end)]) with subword-exact codepoint spans
        into ``text`` — the offsets HF fast tokenizers expose, needed for
        exact SQuAD span decoding (the word-granular fallback snaps decoded
        answers to word boundaries)."""
        if self._lib is not None:
            cap = max(64, 2 * len(text) + 8)
            while True:
                ids = np.empty(cap, dtype=np.int32)
                starts = np.empty(cap, dtype=np.int32)
                ends = np.empty(cap, dtype=np.int32)
                p = ctypes.POINTER(ctypes.c_int32)
                n = self._lib.wp_encode_offsets(
                    self._handle, text.encode("utf-8"),
                    ids.ctypes.data_as(p), starts.ctypes.data_as(p),
                    ends.ctypes.data_as(p), cap,
                )
                if n <= cap:
                    return (
                        ids[:n].tolist(),
                        list(zip(starts[:n].tolist(), ends[:n].tolist())),
                    )
                cap = int(n)
        return self._py.tokenize_with_offsets(text)

    def encode_batch(
        self, texts: list[str], capacity: int = 512, n_threads: int = 0
    ) -> tuple[np.ndarray, np.ndarray]:
        """(ids [len(texts), capacity] int32, lengths [len(texts)] int64)."""
        if self._lib is None:
            ids = np.zeros((len(texts), capacity), np.int32)
            lengths = np.zeros(len(texts), np.int64)
            for i, text in enumerate(texts):
                row = self._py.tokenize(text)
                lengths[i] = len(row)
                ids[i, : min(len(row), capacity)] = row[:capacity]
            return ids, lengths
        encoded = [t.encode("utf-8") for t in texts]
        arr = (ctypes.c_char_p * len(texts))(*encoded)
        ids = np.zeros((len(texts), capacity), np.int32)
        lengths = np.zeros(len(texts), np.int64)
        self._lib.wp_encode_batch(
            self._handle, arr, len(texts),
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), capacity,
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n_threads,
        )
        return ids, lengths

    def __del__(self):
        if getattr(self, "_lib", None) is not None and self._handle:
            self._lib.wp_free(self._handle)
            self._handle = None


class _PyWordPiece:
    """Pure-Python fallback with identical behavior (reference for tests)."""

    def __init__(self, vocab_path: str, lowercase: bool):
        self.vocab: dict[str, int] = {}
        with open(vocab_path, encoding="utf-8") as fh:
            for i, line in enumerate(fh):
                self.vocab[line.rstrip("\r\n")] = i
        self.lowercase = lowercase
        self.special_ids = {
            "unk": self.vocab.get("[UNK]", 100),
            "cls": self.vocab.get("[CLS]", 101),
            "sep": self.vocab.get("[SEP]", 102),
            "pad": self.vocab.get("[PAD]", 0),
        }

    def _basic_with_maps(self, text: str) -> list[tuple[str, list[int]]]:
        """Normalized basic tokens, each with the source char index of every
        normalized char (lowercase/NFD may expand or drop chars)."""
        import unicodedata

        out: list[tuple[str, list[int]]] = []
        current: list[str] = []
        cur_src: list[int] = []

        def flush():
            if current:
                out.append(("".join(current), list(cur_src)))
                current.clear()
                cur_src.clear()

        for src, ch in enumerate(text):
            if unicodedata.category(ch) in ("Cc", "Cf") and ch not in "\t\n\r":
                continue
            if ch.isspace():
                flush()
                continue
            if self.lowercase:
                ch = unicodedata.normalize("NFD", ch.lower())
                ch = "".join(c for c in ch if unicodedata.category(c) != "Mn")
                if not ch:
                    continue
            cp = ord(ch[0])
            if (
                unicodedata.category(ch[0]).startswith("P")
                or (0x4E00 <= cp <= 0x9FFF)
                or (33 <= cp <= 47) or (58 <= cp <= 64)
                or (91 <= cp <= 96) or (123 <= cp <= 126)
            ):
                flush()
                out.append((ch, [src] * len(ch)))
                continue
            current.extend(ch)
            cur_src.extend([src] * len(ch))
        flush()
        return out

    def _basic(self, text: str) -> list[str]:
        return [w for w, _ in self._basic_with_maps(text)]

    def _wordpiece(self, word: str):
        """[(id, norm_start, norm_end)] or None if the word maps to UNK."""
        start = 0
        pieces: list[tuple[int, int, int]] = []
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = self.vocab[sub]
                    break
                end -= 1
            if cur is None:
                return None
            pieces.append((cur, start, end))
            start = end
        return pieces

    def tokenize(self, text: str) -> list[int]:
        ids: list[int] = []
        unk = self.special_ids["unk"]
        for word in self._basic(text):
            pieces = None if len(word) > 100 else self._wordpiece(word)
            ids.extend([unk] if pieces is None else [p[0] for p in pieces])
        return ids

    def tokenize_with_offsets(
        self, text: str
    ) -> tuple[list[int], list[tuple[int, int]]]:
        ids: list[int] = []
        offsets: list[tuple[int, int]] = []
        unk = self.special_ids["unk"]
        for word, src in self._basic_with_maps(text):
            word_span = (src[0], src[-1] + 1)
            pieces = None if len(word) > 100 else self._wordpiece(word)
            if pieces is None:
                ids.append(unk)
                offsets.append(word_span)
                continue
            for pid, a, b in pieces:
                ids.append(pid)
                offsets.append((src[a], src[b - 1] + 1))
        return ids, offsets


# ---------------------------------------------------------------------------
# GPT-2 byte-level BPE (bpe.cc)
# ---------------------------------------------------------------------------

_BPE_SO_PATH = os.path.join(_SRC_DIR, "libbpe.so")
_bpe_lib = None
_bpe_lib_tried = False


def _get_bpe_lib():
    global _bpe_lib, _bpe_lib_tried
    if _bpe_lib is None and not _bpe_lib_tried:
        _bpe_lib_tried = True
        path = _compile("bpe.cc", _BPE_SO_PATH)
        if path:
            lib = ctypes.CDLL(path)
            lib.bpe_load.restype = ctypes.c_void_p
            lib.bpe_load.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
            lib.bpe_free.argtypes = [ctypes.c_void_p]
            lib.bpe_vocab_size.restype = ctypes.c_int32
            lib.bpe_vocab_size.argtypes = [ctypes.c_void_p]
            lib.bpe_token_id.restype = ctypes.c_int32
            lib.bpe_token_id.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
            ]
            lib.bpe_encode.restype = ctypes.c_int64
            lib.bpe_encode.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ]
            lib.bpe_decode.restype = ctypes.c_int64
            lib.bpe_decode.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
            ]
            lib.bpe_encode_batch.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int32,
            ]
            _bpe_lib = lib
    return _bpe_lib


class BPETokenizer:
    """GPT-2 byte-level BPE backed by the native library when available.

    Consumes the stock HF artifacts (vocab.json + merges.txt);
    ``encode(text)`` returns raw BPE ids with no special tokens (GPT-2 adds
    none by default), ``decode(ids)`` is the lossless byte-level inverse,
    ``encode_batch`` runs multithreaded in C++. The serving/causal-LM tiers
    (models/gpt2.py, models/llama.py) consume the ids directly.

    Unicode note (mirrored EXACTLY by the Python fallback so both backends
    agree): the pre-tokenizer is category-exact for ASCII and Unicode
    whitespace; other non-ASCII codepoints classify as letters — see
    bpe.cc's header.
    """

    def __init__(self, vocab_path: str, merges_path: str,
                 force_python: bool = False):
        self.vocab_path, self.merges_path = vocab_path, merges_path
        self._handle = None
        self._lib = None if force_python else _get_bpe_lib()
        if self._lib is not None:
            self._handle = self._lib.bpe_load(
                vocab_path.encode(), merges_path.encode()
            )
            if not self._handle:
                self._lib = None
        self._py = None if self._lib is not None else _PyBPE(
            vocab_path, merges_path
        )

    @property
    def backend(self) -> str:
        return "native" if self._lib is not None else "python"

    @property
    def vocab_size(self) -> int:
        if self._lib is not None:
            return int(self._lib.bpe_vocab_size(self._handle))
        return len(self._py.id_to_token)

    def token_id(self, token: str) -> int:
        """Id of a literal token (e.g. ``"<|endoftext|>"``), -1 if absent.
        The token is given in RAW text (not the mapped alphabet)."""
        raw = token.encode("utf-8")
        if self._lib is not None:
            return int(self._lib.bpe_token_id(self._handle, raw, len(raw)))
        return self._py.vocab.get(raw, -1)

    def encode(self, text: str) -> list[int]:
        if self._lib is None:
            return self._py.encode(text)
        data = text.encode("utf-8")
        cap = max(64, len(data) + 8)
        while True:
            out = np.empty(cap, dtype=np.int32)
            n = self._lib.bpe_encode(
                self._handle, data,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap,
            )
            if n <= cap:
                return out[:n].tolist()
            cap = int(n)

    def decode(self, ids) -> str:
        if self._lib is None:
            return self._py.decode(ids)
        arr = np.asarray(ids, dtype=np.int32)
        cap = max(64, 8 * len(arr) + 8)
        while True:
            buf = ctypes.create_string_buffer(cap)
            n = self._lib.bpe_decode(
                self._handle,
                arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(arr), buf, cap,
            )
            if n <= cap:
                return buf.raw[:n].decode("utf-8", errors="replace")
            cap = int(n)

    def encode_batch(
        self, texts: list[str], capacity: int = 512, n_threads: int = 0
    ) -> tuple[np.ndarray, np.ndarray]:
        """(ids [len(texts), capacity] int32, lengths [len(texts)] int64)."""
        if self._lib is None:
            ids = np.zeros((len(texts), capacity), np.int32)
            lengths = np.zeros(len(texts), np.int64)
            for i, text in enumerate(texts):
                row = self._py.encode(text)
                lengths[i] = len(row)
                ids[i, : min(len(row), capacity)] = row[:capacity]
            return ids, lengths
        encoded = [t.encode("utf-8") for t in texts]
        arr = (ctypes.c_char_p * len(texts))(*encoded)
        ids = np.zeros((len(texts), capacity), np.int32)
        lengths = np.zeros(len(texts), np.int64)
        self._lib.bpe_encode_batch(
            self._handle, arr, len(texts),
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), capacity,
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n_threads,
        )
        return ids, lengths

    def __del__(self):
        if getattr(self, "_lib", None) is not None and self._handle:
            self._lib.bpe_free(self._handle)
            self._handle = None


def gpt2_byte_alphabet() -> dict[int, str]:
    """The GPT-2 byte->unicode alphabet (HF ``bytes_to_unicode`` semantics):
    printable/latin bytes map to themselves, the rest to 0x100+k in order."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(0xA1, 0xAC + 1))
        + list(range(0xAE, 0xFF + 1))
    )
    cs = list(bs)
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {b: chr(c) for b, c in zip(bs, cs)}


_EXTRA_WS = {
    0x0B, 0x0C, 0x1C, 0x1D, 0x1E, 0x1F, 0x85, 0xA0, 0x1680,
    0x2028, 0x2029, 0x202F, 0x205F, 0x3000,
}


def _bpe_is_space(cp: int) -> bool:
    return cp in (9, 10, 13, 32) or cp in _EXTRA_WS or 0x2000 <= cp <= 0x200A


def _bpe_is_letter(cp: int) -> bool:
    if cp < 0x80:
        return 97 <= cp <= 122 or 65 <= cp <= 90
    return not _bpe_is_space(cp)


def _bpe_is_digit(cp: int) -> bool:
    return 48 <= cp <= 57


def bpe_pretokenize(text: str) -> list[str]:
    """GPT-2's pre-tokenizer pattern, scanned manually (shared by the C++
    and Python backends — see bpe.cc's header for the alternative order and
    the trailing-whitespace semantics of ``\\s+(?!\\S)``)."""
    cps = [ord(c) for c in text]
    n = len(cps)
    out: list[str] = []
    p = 0
    while p < n:
        if cps[p] == 0x27 and p + 1 < n:  # contractions
            c1 = cps[p + 1]
            if c1 in (ord("s"), ord("t"), ord("m"), ord("d")):
                out.append(text[p:p + 2])
                p += 2
                continue
            if p + 2 < n:
                two = text[p + 1:p + 3]
                if two in ("re", "ve", "ll"):
                    out.append(text[p:p + 3])
                    p += 3
                    continue
        k = p + (1 if cps[p] == 32 and p + 1 < n else 0)
        if k < n and _bpe_is_letter(cps[k]):
            e = k
            while e < n and _bpe_is_letter(cps[e]):
                e += 1
            out.append(text[p:e])
            p = e
            continue
        if k < n and _bpe_is_digit(cps[k]):
            e = k
            while e < n and _bpe_is_digit(cps[e]):
                e += 1
            out.append(text[p:e])
            p = e
            continue
        if k < n and not _bpe_is_space(cps[k]) and not _bpe_is_letter(cps[k]) \
                and not _bpe_is_digit(cps[k]):
            e = k
            while e < n and not _bpe_is_space(cps[e]) \
                    and not _bpe_is_letter(cps[e]) \
                    and not _bpe_is_digit(cps[e]):
                e += 1
            out.append(text[p:e])
            p = e
            continue
        if _bpe_is_space(cps[p]):
            e = p
            while e < n and _bpe_is_space(cps[e]):
                e += 1
            if e == n:
                out.append(text[p:e])
                p = e
            elif e - p > 1:
                out.append(text[p:e - 1])
                p = e - 1
            else:
                out.append(text[p:e])
                p = e
            continue
        out.append(text[p:p + 1])
        p += 1
    return out


class _PyBPE:
    """Pure-Python fallback with behavior identical to bpe.cc."""

    def __init__(self, vocab_path: str, merges_path: str):
        import json

        alphabet = gpt2_byte_alphabet()
        inv = {c: bytes([b]) for b, c in alphabet.items()}

        def unmap(mapped: str) -> Optional[bytes]:
            try:
                return b"".join(inv[c] for c in mapped)
            except KeyError:
                return None  # added special tokens outside the alphabet

        with open(vocab_path, encoding="utf-8") as fh:
            raw_vocab = json.load(fh)
        self.vocab: dict[bytes, int] = {}
        max_id = -1
        for tok, idx in raw_vocab.items():
            raw = unmap(tok)
            if raw is not None:
                self.vocab[raw] = idx
                max_id = max(max_id, idx)
        self.id_to_token: list[bytes] = [b""] * (max_id + 1)
        for raw, idx in self.vocab.items():
            self.id_to_token[idx] = raw
        self.ranks: dict[tuple[bytes, bytes], int] = {}
        with open(merges_path, encoding="utf-8") as fh:
            rank = 0
            for line in fh:
                line = line.rstrip("\r\n")
                if not line or line.startswith("#"):
                    continue
                a, _, b = line.partition(" ")
                ra, rb = unmap(a), unmap(b)
                if ra is not None and rb is not None:
                    self.ranks[(ra, rb)] = rank
                    rank += 1
        self._cache: dict[bytes, list[int]] = {}

    def _bpe(self, word: bytes) -> list[int]:
        cached = self._cache.get(word)
        if cached is not None:
            return cached
        parts = [bytes([c]) for c in word]
        while len(parts) > 1:
            best = min(
                ((self.ranks[p], i) for i, p in enumerate(zip(parts, parts[1:]))
                 if p in self.ranks),
                default=None,
            )
            if best is None:
                break
            _, i = best
            a, b = parts[i], parts[i + 1]
            merged: list[bytes] = []
            j = 0
            while j < len(parts):
                if j + 1 < len(parts) and parts[j] == a and parts[j + 1] == b:
                    merged.append(a + b)
                    j += 2
                else:
                    merged.append(parts[j])
                    j += 1
            parts = merged
        ids: list[int] = []
        for piece in parts:
            idx = self.vocab.get(piece)
            if idx is not None:
                ids.append(idx)
            else:
                ids.extend(
                    self.vocab[bytes([c])] for c in piece
                    if bytes([c]) in self.vocab
                )
        if len(self._cache) < (1 << 16):
            self._cache[word] = ids
        return ids

    def encode(self, text: str) -> list[int]:
        ids: list[int] = []
        for tok in bpe_pretokenize(text):
            ids.extend(self._bpe(tok.encode("utf-8")))
        return ids

    def decode(self, ids) -> str:
        buf = b"".join(
            self.id_to_token[i] for i in ids
            if 0 <= i < len(self.id_to_token)
        )
        return buf.decode("utf-8", errors="replace")


# ---------------------------------------------------------------------------
# SentencePiece-style Unigram (unigram.cc) — T5 / LLaMA-family vocabularies
# ---------------------------------------------------------------------------

_UG_SO_PATH = os.path.join(_SRC_DIR, "libunigram.so")
_ug_lib = None
_ug_lib_tried = False

_METASPACE = "▁"
_UNK_PENALTY = 10.0


def _get_ug_lib():
    global _ug_lib, _ug_lib_tried
    if _ug_lib is None and not _ug_lib_tried:
        _ug_lib_tried = True
        path = _compile("unigram.cc", _UG_SO_PATH)
        if path:
            lib = ctypes.CDLL(path)
            lib.ug_load.restype = ctypes.c_void_p
            lib.ug_load.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ]
            lib.ug_free.argtypes = [ctypes.c_void_p]
            lib.ug_vocab_size.restype = ctypes.c_int32
            lib.ug_vocab_size.argtypes = [ctypes.c_void_p]
            lib.ug_piece_id.restype = ctypes.c_int32
            lib.ug_piece_id.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
            ]
            lib.ug_encode.restype = ctypes.c_int64
            lib.ug_encode.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ]
            lib.ug_decode.restype = ctypes.c_int64
            lib.ug_decode.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
            ]
            lib.ug_encode_batch.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int32,
            ]
            _ug_lib = lib
    return _ug_lib


class UnigramTokenizer:
    """SentencePiece Unigram tokenizer backed by the native library.

    Covers the T5/LLaMA/Mistral/Gemma vocabulary family (the models the
    reference loads through HF's Python tokenizers —
    `/root/reference/examples/bert_squad.py:146-165` is the pattern):
    metaspace normalization, Viterbi max-likelihood segmentation with the
    SentencePiece single-node guarantee, fuse_unk, optional ``<0xXX>`` byte
    fallback, lossless ``decode``. ``encode``/``decode``/``encode_batch``
    mirror :class:`BPETokenizer`'s surface so the serving tier
    (``Predictor.predict_texts``) consumes either interchangeably.

    Construct from the native vocab.tsv (``piece<TAB>score`` per line, line
    order = id) or directly from an HF ``tokenizer.json`` via
    :meth:`from_tokenizer_json`.

    Tie-breaking note: equal-likelihood segmentations are resolved by a
    fixed iteration order (start ascending, piece length descending,
    strict-improvement) shared bit-identically by the C++ and the Python
    fallback; HF may resolve exact ties differently, which real
    (continuous-score) vocabularies never exercise.
    """

    def __init__(self, vocab_path: str, unk_id: int = 0,
                 add_dummy_prefix=True, byte_fallback: bool = False,
                 force_python: bool = False):
        """``add_dummy_prefix``: 0/False = none; 1/True = always prepend
        the metaspace (HF Prepend normalizer, LLaMA-style); 2 = prepend
        unless the text already starts with a space or metaspace (HF
        Metaspace pre_tokenizer, T5-style)."""
        self.vocab_path = vocab_path
        self.unk_id = unk_id
        self.add_dummy_prefix = int(add_dummy_prefix)
        self.byte_fallback = byte_fallback
        self._handle = None
        self._lib = None if force_python else _get_ug_lib()
        if self._lib is not None:
            self._handle = self._lib.ug_load(
                vocab_path.encode(), unk_id,
                self.add_dummy_prefix, 1 if byte_fallback else 0,
            )
            if not self._handle:
                self._lib = None
        self._py = None if self._lib is not None else _PyUnigram(
            vocab_path, unk_id, add_dummy_prefix, byte_fallback
        )

    @classmethod
    def from_tokenizer_json(cls, json_path: str, vocab_tsv_path: str = None,
                            force_python: bool = False) -> "UnigramTokenizer":
        """Build from an HF ``tokenizer.json`` with a Unigram model.

        Converts the HF serialization to the native vocab.tsv format
        (written next to the json unless ``vocab_tsv_path`` is given) and
        reads ``unk_id``/``byte_fallback`` from the model block and the
        dummy-prefix policy from the normalizer (LLaMA-style
        Prepend+Replace) or Metaspace pre_tokenizer (T5-style).

        A split-mode Metaspace pre_tokenizer segments at word boundaries
        before Viterbi; the whole-string Viterbi here factorizes to the
        same result iff no piece carries an interior metaspace — checked,
        raising ``NotImplementedError`` on the (unseen-in-practice)
        violating vocabularies rather than silently diverging.
        """
        import json as _json

        with open(json_path, encoding="utf-8") as fh:
            spec = _json.load(fh)
        model = spec.get("model", {})
        if model.get("type") != "Unigram":
            raise ValueError(
                f"{json_path}: model.type={model.get('type')!r}, not Unigram"
            )
        vocab = model.get("vocab", [])
        unk_id = model.get("unk_id")
        byte_fallback = bool(model.get("byte_fallback", False))

        def _scan(block, wanted):
            """All sub-blocks of the given normalizer/pre_tokenizer type."""
            if not block:
                return []
            seq = block.get(
                "normalizers", block.get("pretokenizers", [block])
            ) if block.get("type") == "Sequence" else [block]
            return [b for b in seq if b.get("type") == wanted]

        norm = spec.get("normalizer") or {}
        pre = spec.get("pre_tokenizer") or {}
        add_dummy_prefix = 0
        split_mode = False
        if _scan(norm, "Prepend"):
            add_dummy_prefix = 1  # unconditional (LLaMA-style)
        for ms in _scan(pre, "Metaspace"):
            scheme = ms.get(
                "prepend_scheme",
                "always" if ms.get("add_prefix_space", True) else "never",
            )
            if scheme != "never" and add_dummy_prefix == 0:
                add_dummy_prefix = 2  # unless already space-led (T5-style)
            if ms.get("split", True):
                split_mode = True
        if split_mode:
            for piece, _ in vocab:
                if _METASPACE in piece[1:]:
                    raise NotImplementedError(
                        f"{json_path}: split-mode Metaspace with an "
                        f"interior-metaspace piece {piece!r} — whole-string "
                        "Viterbi would diverge from HF's word-split lattice"
                    )
        if vocab_tsv_path is None:
            vocab_tsv_path = os.path.splitext(json_path)[0] + ".vocab.tsv"
        with open(vocab_tsv_path, "w", encoding="utf-8") as fh:
            for piece, score in vocab:
                if "\t" in piece or "\n" in piece or "\r" in piece:
                    raise ValueError(
                        f"piece {piece!r} contains tsv delimiter bytes"
                    )
                fh.write(f"{piece}\t{score}\n")
        return cls(
            vocab_tsv_path,
            unk_id=-1 if unk_id is None else int(unk_id),
            add_dummy_prefix=add_dummy_prefix,
            byte_fallback=byte_fallback,
            force_python=force_python,
        )

    @property
    def backend(self) -> str:
        return "native" if self._lib is not None else "python"

    @property
    def vocab_size(self) -> int:
        if self._lib is not None:
            return int(self._lib.ug_vocab_size(self._handle))
        return len(self._py.pieces)

    def piece_id(self, piece: str) -> int:
        """Id of a literal piece (e.g. ``"</s>"``), -1 if absent."""
        raw = piece.encode("utf-8")
        if self._lib is not None:
            return int(self._lib.ug_piece_id(self._handle, raw, len(raw)))
        return self._py.piece_to_id.get(raw, -1)

    def encode(self, text: str) -> list[int]:
        if self._lib is None:
            return self._py.encode(text)
        data = text.encode("utf-8")
        cap = max(64, 2 * len(data) + 8)
        while True:
            out = np.empty(cap, dtype=np.int32)
            n = self._lib.ug_encode(
                self._handle, data,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap,
            )
            if n <= cap:
                return out[:n].tolist()
            cap = int(n)

    def decode(self, ids) -> str:
        if self._lib is None:
            return self._py.decode(ids)
        arr = np.asarray(ids, dtype=np.int32)
        cap = max(64, 16 * max(1, len(arr)) + 8)
        while True:
            buf = ctypes.create_string_buffer(cap)
            n = self._lib.ug_decode(
                self._handle,
                arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(arr), buf, cap,
            )
            if n <= cap:
                return buf.raw[:n].decode("utf-8", errors="replace")
            cap = int(n)

    def encode_batch(
        self, texts: list[str], capacity: int = 512, n_threads: int = 0
    ) -> tuple[np.ndarray, np.ndarray]:
        """(ids [len(texts), capacity] int32, lengths [len(texts)] int64)."""
        if self._lib is None:
            ids = np.zeros((len(texts), capacity), np.int32)
            lengths = np.zeros(len(texts), np.int64)
            for i, text in enumerate(texts):
                row = self._py.encode(text)
                lengths[i] = len(row)
                ids[i, : min(len(row), capacity)] = row[:capacity]
            return ids, lengths
        encoded = [t.encode("utf-8") for t in texts]
        arr = (ctypes.c_char_p * len(texts))(*encoded)
        ids = np.zeros((len(texts), capacity), np.int32)
        lengths = np.zeros(len(texts), np.int64)
        self._lib.ug_encode_batch(
            self._handle, arr, len(texts),
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), capacity,
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n_threads,
        )
        return ids, lengths

    def __del__(self):
        if getattr(self, "_lib", None) is not None and self._handle:
            self._lib.ug_free(self._handle)
            self._handle = None


def _cp_len(b: int) -> int:
    """UTF-8 codepoint byte-length from the lead byte (unigram.cc cp_len)."""
    if b < 0x80:
        return 1
    if (b >> 5) == 0x6:
        return 2
    if (b >> 4) == 0xE:
        return 3
    if (b >> 3) == 0x1E:
        return 4
    return 1


class _PyUnigram:
    """Pure-Python fallback, bit-identical to unigram.cc (same byte-level
    Viterbi with the same fixed iteration order and IEEE-double scores)."""

    def __init__(self, vocab_path: str, unk_id: int, add_dummy_prefix: int,
                 byte_fallback: bool):
        self.pieces: list[bytes] = []
        self.scores: list[float] = []
        self.piece_to_id: dict[bytes, int] = {}
        self.unk_id = unk_id
        self.add_dummy_prefix = int(add_dummy_prefix)
        self.byte_fallback = byte_fallback
        self.byte_ids = [-1] * 256
        self.max_piece_len = 1
        min_score = float("inf")
        with open(vocab_path, "rb") as fh:
            for line in fh:
                line = line.rstrip(b"\r\n")
                tab = line.rfind(b"\t")
                piece = line if tab < 0 else line[:tab]
                score = 0.0 if tab < 0 else float(line[tab + 1:])
                idx = len(self.pieces)
                self.pieces.append(piece)
                self.scores.append(score)
                self.piece_to_id[piece] = idx  # last id wins (HF parity)
                self.max_piece_len = max(self.max_piece_len, len(piece))
                min_score = min(min_score, score)
                if (len(piece) == 6 and piece[:3] == b"<0x"
                        and piece[5:6] == b">"):
                    try:
                        self.byte_ids[int(piece[3:5], 16)] = idx
                    except ValueError:
                        pass
        self.min_score = min_score if min_score != float("inf") else 0.0

    def _normalize(self, text: str) -> bytes:
        meta = _METASPACE.encode()
        prepend = False
        if text:
            if self.add_dummy_prefix == 1:
                prepend = True
            elif self.add_dummy_prefix == 2:
                prepend = text[0] != " " and not text.startswith(_METASPACE)
        out = meta if prepend else b""
        return out + text.encode("utf-8").replace(b" ", meta)

    def encode(self, text: str) -> list[int]:
        s = self._normalize(text)
        n = len(s)
        if n == 0:
            return []
        ninf = float("-inf")
        unk_score = self.min_score - _UNK_PENALTY
        best = [ninf] * (n + 1)
        back = [-1] * (n + 1)
        back_id = [-2] * (n + 1)
        best[0] = 0.0
        for i in range(n):
            if best[i] == ninf:
                continue
            one_cp = min(_cp_len(s[i]), n - i)
            has_single = False
            for length in range(min(self.max_piece_len, n - i), 0, -1):
                pid = self.piece_to_id.get(s[i:i + length])
                if pid is None:
                    continue
                if length == one_cp:
                    has_single = True
                sc = best[i] + self.scores[pid]
                if sc > best[i + length]:
                    best[i + length] = sc
                    back[i + length] = i
                    back_id[i + length] = pid
            if not has_single:
                sc = best[i] + unk_score
                if sc > best[i + one_cp]:
                    best[i + one_cp] = sc
                    back[i + one_cp] = i
                    back_id[i + one_cp] = -1
        steps = []
        j = n
        while j > 0:
            b = back[j]
            if b < 0:
                return []  # malformed UTF-8 tail (same clean give-up as C++)
            steps.append((b, back_id[j]))
            j = b
        out: list[int] = []
        prev_unk = False
        for start, pid in reversed(steps):
            if pid >= 0:
                out.append(pid)
                prev_unk = False
            elif self.byte_fallback:
                for k in range(min(_cp_len(s[start]), n - start)):
                    bid = self.byte_ids[s[start + k]]
                    out.append(bid if bid >= 0 else self.unk_id)
                prev_unk = False
            else:
                if not prev_unk:
                    out.append(self.unk_id)
                prev_unk = True  # fuse_unk
        return out

    def decode(self, ids) -> str:
        meta = _METASPACE.encode()
        buf = bytearray()
        is_byte = set(i for i in self.byte_ids if i >= 0)
        for idx in ids:
            idx = int(idx)
            if not 0 <= idx < len(self.pieces):
                continue
            piece = self.pieces[idx]
            if idx in is_byte:
                buf.append(int(piece[3:5], 16))
            else:
                buf.extend(piece.replace(meta, b" "))
        off = 1 if (self.add_dummy_prefix and buf[:1] == b" ") else 0
        return bytes(buf[off:]).decode("utf-8", errors="replace")
