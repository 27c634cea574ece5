"""GLUE data pipeline: raw TSV -> tokenized model inputs, dependency-free.

The reference relies on HF ``GlueDataset`` + a downloaded tokenizer
(`examples/bert_glue.py:98-102`). Here the official task TSVs are parsed
directly and featurized with any ``tokenize(text) -> ids`` callable — e.g.
the native C++ WordPiece tokenizer (bayeformers_tpu/native) with a local
vocab.txt — producing the ``{split}_{input_ids,...}`` arrays the GLUE
workload consumes. Supported layouts: MRPC (sentence pairs), SST-2 (single
sentence); other tasks follow the same two patterns via ``columns``.
"""
from __future__ import annotations

import csv
import os
from typing import Callable, Optional

import numpy as np

# (text_a_col, text_b_col, label_col, has_header) per task file layout
TASK_COLUMNS = {
    "mrpc": (3, 4, 0, True),
    "sst-2": (0, None, 1, True),
    "sst2": (0, None, 1, True),
    "rte": (1, 2, 3, True),
    "wnli": (1, 2, 3, True),
    "qqp": (3, 4, 5, True),
}


def read_tsv(path: str, has_header: bool) -> list[list[str]]:
    with open(path, encoding="utf-8") as fh:
        rows = list(csv.reader(fh, delimiter="\t", quoting=csv.QUOTE_NONE))
    return rows[1:] if has_header else rows


def featurize_pairs(
    pairs: list[tuple[str, Optional[str]]],
    labels: list[int],
    tokenize: Callable[[str], list[int]],
    *,
    max_seq: int = 128,
    cls_id: int = 101,
    sep_id: int = 102,
    pad_id: int = 0,
) -> dict[str, np.ndarray]:
    """[CLS] a [SEP] (b [SEP]) with 0/1 token types, truncated/padded."""
    n = len(pairs)
    input_ids = np.full((n, max_seq), pad_id, np.int32)
    attention = np.zeros((n, max_seq), np.int32)
    type_ids = np.zeros((n, max_seq), np.int32)
    for i, (a, b) in enumerate(pairs):
        ids_a = tokenize(a)
        ids_b = tokenize(b) if b else []
        # longest-first truncation to fit specials (reference tokenizer policy)
        budget = max_seq - (3 if ids_b else 2)
        while len(ids_a) + len(ids_b) > budget:
            if len(ids_a) >= len(ids_b):
                ids_a.pop()
            else:
                ids_b.pop()
        ids = [cls_id] + ids_a + [sep_id]
        types = [0] * len(ids)
        if ids_b:
            ids += ids_b + [sep_id]
            types += [1] * (len(ids_b) + 1)
        input_ids[i, : len(ids)] = ids
        attention[i, : len(ids)] = 1
        type_ids[i, : len(types)] = types
    return {
        "input_ids": input_ids,
        "attention_mask": attention,
        "token_type_ids": type_ids,
        "labels": np.asarray(labels, np.int32),
    }


def load_glue_task(
    data_dir: str,
    task: str,
    tokenize: Callable[[str], list[int]],
    *,
    max_seq: int = 128,
    train_file: str = "train.tsv",
    dev_file: str = "dev.tsv",
    cache: bool = True,
) -> tuple[dict, dict]:
    """(train, dev) array dicts for a GLUE task directory; cached to .npz."""
    cols = TASK_COLUMNS[task.lower()]
    cache_path = os.path.join(data_dir, f"features_{task.lower()}_{max_seq}.npz")
    if cache and os.path.exists(cache_path):
        z = np.load(cache_path)
        keys = ("input_ids", "attention_mask", "token_type_ids", "labels")
        return (
            {k: z[f"train_{k}"] for k in keys},
            {k: z[f"dev_{k}"] for k in keys},
        )

    def build(path):
        a_col, b_col, l_col, header = cols
        rows = read_tsv(path, header)
        pairs = [
            (r[a_col], r[b_col] if b_col is not None else None) for r in rows
        ]
        labels = [int(r[l_col]) for r in rows]
        return featurize_pairs(pairs, labels, tokenize, max_seq=max_seq)

    train = build(os.path.join(data_dir, train_file))
    dev = build(os.path.join(data_dir, dev_file))
    if cache:
        np.savez(
            cache_path,
            **{f"train_{k}": v for k, v in train.items()},
            **{f"dev_{k}": v for k, v in dev.items()},
        )
    return train, dev
