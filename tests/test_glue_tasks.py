"""Full GLUE task coverage: registry, featurization per layout, metrics.

The reference handles every GLUE task through HF ``GlueDataset``
(`examples/bert_glue.py:98-102`); these tests pin our dependency-free
equivalent: per-task column layouts, string-label maps, the STS-B regression
path, and the official metrics (MCC, F1, Pearson/Spearman).
"""
import numpy as np
import pytest

from bayeformers_tpu.utils import glue as glue_lib
from bayeformers_tpu.utils import metrics as metrics_lib


def fake_tokenize(text):
    return [10 + (ord(c) % 50) for c in text.replace(" ", "")][:32]


ALL_TASKS = sorted(glue_lib.TASKS)


def test_registry_covers_all_nine_tasks():
    # the 9 GLUE tasks (+ mnli-mm dev variant)
    for t in ("cola", "sst2", "mrpc", "stsb", "qqp", "mnli", "qnli", "rte",
              "wnli"):
        assert t in glue_lib.TASKS
    # aliases used by the reference CLI spellings
    assert glue_lib.task_spec("SST-2") is glue_lib.TASKS["sst2"]
    assert glue_lib.task_spec("sts-b") is glue_lib.TASKS["stsb"]
    with pytest.raises(ValueError):
        glue_lib.task_spec("nope")


def test_label_parsing_per_task():
    assert glue_lib.task_spec("rte").parse_label("not_entailment") == 1
    assert glue_lib.task_spec("rte").parse_label("entailment") == 0
    assert glue_lib.task_spec("qnli").parse_label("not_entailment") == 1
    assert glue_lib.task_spec("mnli").parse_label("neutral") == 2
    assert glue_lib.task_spec("mnli").n_labels == 3
    assert glue_lib.task_spec("stsb").parse_label("3.8") == pytest.approx(3.8)
    assert glue_lib.task_spec("stsb").regression
    assert glue_lib.task_spec("cola").parse_label("1") == 1
    assert not glue_lib.task_spec("cola").header


def _write_tsv(path, rows, header=None):
    with open(path, "w", encoding="utf-8") as fh:
        if header:
            fh.write("\t".join(header) + "\n")
        for r in rows:
            fh.write("\t".join(str(c) for c in r) + "\n")


def test_load_cola_headerless(tmp_path):
    rows = [["gj04", "1", "", "The book was read."],
            ["gj04", "0", "*", "Book the was read."]]
    _write_tsv(tmp_path / "train.tsv", rows)
    _write_tsv(tmp_path / "dev.tsv", rows)
    train, dev = glue_lib.load_glue_task(
        str(tmp_path), "cola", fake_tokenize, max_seq=16, cache=False
    )
    assert train["labels"].dtype == np.int32
    assert list(train["labels"]) == [1, 0]
    assert train["token_type_ids"].max() == 0  # single sentence


def test_load_stsb_regression(tmp_path):
    header = [f"c{i}" for i in range(9)] + ["score"]
    rows = [[*["x"] * 7, "A man is smiling.", "A guy smiles.", "4.6"],
            [*["x"] * 7, "A dog runs.", "Stocks fell today.", "0.2"]]
    _write_tsv(tmp_path / "train.tsv", rows, header)
    _write_tsv(tmp_path / "dev.tsv", rows, header)
    train, _ = glue_lib.load_glue_task(
        str(tmp_path), "stsb", fake_tokenize, max_seq=24, cache=False
    )
    assert train["labels"].dtype == np.float32
    np.testing.assert_allclose(train["labels"], [4.6, 0.2], rtol=1e-6)
    assert train["token_type_ids"].max() == 1  # pair task


def test_load_mnli_matched_dev_file(tmp_path):
    header = [f"c{i}" for i in range(11)] + ["gold_label"]
    row = [*["x"] * 8, "premise here", "hypothesis here", "x", "neutral"]
    _write_tsv(tmp_path / "train.tsv", [row], header)
    _write_tsv(tmp_path / "dev_matched.tsv",
               [[*row[:-1], "contradiction"]], header)
    train, dev = glue_lib.load_glue_task(
        str(tmp_path), "mnli", fake_tokenize, max_seq=24, cache=False
    )
    assert list(train["labels"]) == [2]
    assert list(dev["labels"]) == [0]


def test_load_rte_string_labels(tmp_path):
    header = ["index", "sentence1", "sentence2", "label"]
    rows = [["0", "a b", "c d", "entailment"],
            ["1", "e f", "g h", "not_entailment"]]
    _write_tsv(tmp_path / "train.tsv", rows, header)
    _write_tsv(tmp_path / "dev.tsv", rows, header)
    train, _ = glue_lib.load_glue_task(
        str(tmp_path), "rte", fake_tokenize, max_seq=16, cache=False
    )
    assert list(train["labels"]) == [0, 1]


def test_matthews_corrcoef_matches_closed_form():
    labels = np.array([1, 1, 1, 0, 0, 0, 1, 0])
    preds = np.array([1, 1, 0, 0, 0, 1, 1, 0])
    # tp=3 tn=3 fp=1 fn=1 -> mcc = (9-1)/sqrt(4*4*4*4) = 0.5
    assert metrics_lib.matthews_corrcoef(preds, labels) == pytest.approx(0.5)
    # degenerate all-one-class prediction -> 0, not nan
    assert metrics_lib.matthews_corrcoef(np.ones(4), labels[:4]) == 0.0


def test_f1_binary():
    labels = np.array([1, 1, 1, 0, 0])
    preds = np.array([1, 1, 0, 1, 0])
    # tp=2 fp=1 fn=1 -> f1 = 4/(4+1+1)
    assert metrics_lib.f1_binary(preds, labels) == pytest.approx(2 / 3)


def test_pearson_spearman():
    x = np.array([1.0, 2.0, 3.0, 4.0])
    assert metrics_lib.pearson_corr(x, 2 * x + 1) == pytest.approx(1.0)
    assert metrics_lib.pearson_corr(x, -x) == pytest.approx(-1.0)
    # monotone nonlinear map: spearman 1, pearson < 1
    y = np.exp(x)
    assert metrics_lib.spearman_corr(x, y) == pytest.approx(1.0)
    assert metrics_lib.pearson_corr(x, y) < 1.0
    # ties get average ranks
    assert metrics_lib.spearman_corr(
        np.array([1.0, 1.0, 2.0]), np.array([5.0, 5.0, 9.0])
    ) == pytest.approx(1.0)


def test_glue_metrics_dispatch():
    labels = np.array([1, 0, 1, 0])
    preds = np.array([1, 0, 0, 0])
    m = metrics_lib.glue_metrics("acc", preds, labels)
    assert m["score"] == m["acc"] == pytest.approx(0.75)
    m = metrics_lib.glue_metrics("acc_f1", preds, labels)
    assert m["score"] == pytest.approx(0.5 * (m["acc"] + m["f1"]))
    m = metrics_lib.glue_metrics("mcc", preds, labels)
    assert m["score"] == m["mcc"]
    m = metrics_lib.glue_metrics(
        "pearson_spearman", np.array([1.0, 2.0, 3.0]), np.array([1.1, 1.9, 3.2])
    )
    assert m["score"] == pytest.approx(0.5 * (m["pearson"] + m["spearman"]))


@pytest.mark.slow
def test_bert_glue_stsb_regression_workload(tmp_path):
    from bayeformers_tpu.workloads import bert_glue

    score = bert_glue.train(
        exp="t-stsb", model_name="bert", task="stsb", delta=0.05,
        weight_decay=0.0, logs=str(tmp_path / "logs"), epochs=1, b_epochs=1,
        samples=2, batch_size=4, size="tiny", limit_batches=3, seed=0,
    )
    assert np.isfinite(score) and -1.0 <= score <= 1.0


@pytest.mark.slow
def test_bert_glue_mnli_three_way_workload(tmp_path):
    from bayeformers_tpu.workloads import bert_glue

    acc = bert_glue.train(
        exp="t-mnli", model_name="bert", task="mnli", delta=0.05,
        weight_decay=0.0, logs=str(tmp_path / "logs"), epochs=1, b_epochs=1,
        samples=2, batch_size=4, size="tiny", limit_batches=3, seed=0,
    )
    assert 0.0 <= acc <= 1.0
