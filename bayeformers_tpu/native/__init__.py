"""Native (C++) runtime tier: WordPiece tokenizer with ctypes bindings.

The shared library is compiled on first use with g++ (cached next to the
source); a pure-Python fallback keeps everything working where no compiler
exists. See wordpiece.cc for the implementation notes.
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


def _build_library() -> Optional[str]:
    src = os.path.join(_SRC_DIR, "wordpiece.cc")
    with _BUILD_LOCK:
        if os.path.exists(_SO_PATH) and os.path.getmtime(_SO_PATH) >= os.path.getmtime(src):
            return _SO_PATH
        try:
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
                 src, "-o", _SO_PATH],
                check=True, capture_output=True, timeout=120,
            )
            return _SO_PATH
        except Exception:
            return None


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
