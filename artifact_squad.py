"""Quality artifact: the REAL-DATA SQuAD QA path end to end on the chip.

The offline box has no SQuAD v1.1 download, so this script constructs a QA
corpus with a checkable ceiling in the OFFICIAL file formats and runs the
exact code path a real-dataset user runs: train/dev-v1.1.json + vocab.txt
-> native WordPiece tokenizer -> doc-stride featurization (utils/squad.py)
-> full 4-phase recipe (frequentist -> MOPED -> Bayesian eval -> ELBO
train) -> per-phase EM/F1 via the native `squad_evaluate`
(reference: `examples/bert_squad.py:357-368`).

Corpus: key-value fact extraction planted in filler text. Each context is a
stream of filler words with one fact sentence "the {key} is {value}"
inserted at a random position; the question is "what is the {key}" and the
answer span is the value word. The mapping is exactly learnable (EM ceiling
100%: attend to "{key} is", point at the next token), values occur exactly
once per context, and filler/keys/values are disjoint lexicons.

Multi-window by construction: contexts draw 100-240 tokens while the
max_seq=160 recipe fits ~153 context tokens per window, so roughly half the
contexts span two doc-stride windows and a fixed share of answers live ONLY
in the second window — training windows without the answer point at [CLS]
(HF semantics) and the dev decode must run the best-window compete
(`workloads/bert_squad.py::decode_and_score`) to find them.

Reproduces: `python artifact_squad.py` (deterministic; writes
dataset/squad_artifact/ and logs/squad-artifact.*).
"""
import json
import os

import numpy as np

ROOT = "dataset/squad_artifact"
MAX_SEQ = 160
SEED = 0

KEYS = [
    "color", "animal", "city", "metal", "river", "fruit",
    "planet", "flower", "stone", "tree", "bird", "tool",
]
VALUES = {
    "color": ["red", "blue", "green", "amber", "violet", "crimson"],
    "animal": ["wolf", "otter", "lynx", "badger", "heron", "marten"],
    "city": ["lisbon", "oslo", "quito", "nairobi", "hanoi", "perth"],
    "metal": ["copper", "zinc", "cobalt", "nickel", "tungsten", "tin"],
    "river": ["danube", "mekong", "volga", "rhone", "zambezi", "loire"],
    "fruit": ["mango", "plum", "quince", "papaya", "lychee", "fig"],
    "planet": ["mars", "venus", "saturn", "neptune", "mercury", "jupiter"],
    "flower": ["tulip", "orchid", "peony", "dahlia", "iris", "lotus"],
    "stone": ["granite", "basalt", "marble", "slate", "quartz", "flint"],
    "tree": ["oak", "willow", "cedar", "aspen", "maple", "rowan"],
    "bird": ["swift", "plover", "kestrel", "siskin", "dunlin", "avocet"],
    "tool": ["chisel", "awl", "plane", "rasp", "gouge", "bevel"],
}
FILLER = [
    "meanwhile", "travelers", "crossed", "old", "bridges", "carrying",
    "heavy", "baskets", "toward", "distant", "markets", "where", "voices",
    "echoed", "under", "arches", "and", "lanterns", "swung", "slowly",
    "above", "worn", "cobblestones", "while", "merchants", "counted",
    "coins", "beside", "wooden", "stalls", "as", "evening", "settled",
    "over", "rooftops", "bringing", "quiet", "rain", "onto", "gardens",
]


def build_vocab(path: str) -> None:
    """bert-layout vocab.txt: featurize's default cls_id=101 / sep_id=102
    must be the real [CLS]/[SEP] rows (utils/squad.py::featurize)."""
    vocab = (
        ["[PAD]"] + [f"[unused{i}]" for i in range(99)]
        + ["[UNK]", "[CLS]", "[SEP]", "[MASK]"]
        + ["what", "is", "the"] + KEYS
        + sorted({v for vs in VALUES.values() for v in vs})
        + FILLER
    )
    with open(path, "w") as fh:
        fh.write("\n".join(vocab))


def gen_example(rng: np.random.Generator, qid: str,
                ambiguous: bool = False) -> dict:
    """One QA example; ``ambiguous=True`` plants a SECOND, CONFLICTING fact
    sentence ("the {key} is {other_value}") at another random position.

    Both values are listed as gold answers (`squad_evaluate` scores the max
    over references, exactly like real SQuAD's multi-annotator answers), so
    EM/F1 are preserved whichever fact a model points at — but a posterior
    that is honestly uncertain between two near-tied candidate spans will
    SPLIT its MC draws across them, which is precisely what the span-level
    uncertainty columns (VERDICT r4 #5) exist to detect. The clean-corpus
    runs double as the control: span_agreement 1.0 at delta up to 1.0
    (trained-to-ceiling margins never flip under MOPED jitter alone)."""
    key = KEYS[rng.integers(len(KEYS))]
    value = VALUES[key][rng.integers(len(VALUES[key]))]
    n_filler = int(rng.integers(96, 237))  # +4 fact words -> 100..240 tokens
    words = [FILLER[i] for i in rng.integers(0, len(FILLER), n_filler)]
    pos = int(rng.integers(0, n_filler + 1))
    words[pos:pos] = ["the", key, "is", value]
    i_value = pos + 3
    answers = [{"value": value, "i_value": i_value}]
    if ambiguous:
        others = [v for v in VALUES[key] if v != value]
        value2 = others[rng.integers(len(others))]
        pos2 = int(rng.integers(0, len(words) + 1))
        words[pos2:pos2] = ["the", key, "is", value2]
        i_value2 = pos2 + 3
        if pos2 <= i_value:
            answers[0]["i_value"] += 4
        answers.append({"value": value2, "i_value": i_value2})
    context = " ".join(words)

    def start_of(i_tok):
        return sum(len(w) + 1 for w in words[:i_tok])

    gold = []
    for a in answers:
        s = start_of(a["i_value"])
        assert context[s:s + len(a["value"])] == a["value"]
        gold.append({"text": a["value"], "answer_start": s})
    return {
        "qid": qid,
        "question": f"what is the {key}",
        "context": context,
        "answers": gold,
        "n_tokens": len(words),
        "answer_token": answers[0]["i_value"],
        "ambiguous": ambiguous,
    }


def write_squad_json(path: str, examples: list[dict]) -> None:
    data = {
        "version": "1.1",
        "data": [{
            "title": "artifact",
            "paragraphs": [
                {
                    "context": ex["context"],
                    "qas": [{
                        "id": ex["qid"],
                        "question": ex["question"],
                        "answers": ex["answers"],
                    }],
                }
                for ex in examples
            ],
        }],
    }
    with open(path, "w") as fh:
        json.dump(data, fh)


def main(delta: float = 0.05, ambiguous_frac: float = 0.0):
    rng = np.random.default_rng(SEED)
    os.makedirs(ROOT, exist_ok=True)
    train_ex = [gen_example(rng, f"tr{i}") for i in range(768)]
    stride = round(1 / ambiguous_frac) if ambiguous_frac > 0 else 0
    dev_ex = [
        gen_example(rng, f"dev{i}", ambiguous=bool(stride) and i % stride == 0)
        for i in range(117)
    ]
    n_amb = sum(ex["ambiguous"] for ex in dev_ex)
    # corpus shape stats (the multi-window claim, checked not assumed):
    # window 1 holds ~153 context tokens at max_seq=160
    window1 = MAX_SEQ - 6 - 1
    n_multi = sum(ex["n_tokens"] > window1 for ex in dev_ex)
    n_w2_answer = sum(ex["answer_token"] >= window1 for ex in dev_ex)
    print(f"dev: {len(dev_ex)} questions, {n_multi} span 2 windows, "
          f"{n_w2_answer} answers only in window 2", flush=True)
    assert n_multi > 20 and n_w2_answer > 5

    build_vocab(os.path.join(ROOT, "vocab.txt"))
    write_squad_json(os.path.join(ROOT, "train-v1.1.json"), train_ex)
    write_squad_json(os.path.join(ROOT, "dev-v1.1.json"), dev_ex)
    # stale feature caches would shadow a regenerated corpus
    for f in os.listdir(ROOT):
        if f.startswith("features_"):
            os.remove(os.path.join(ROOT, f))

    from bayeformers_tpu.workloads import bert_squad

    exp = f"squad-artifact-d{delta}" + (f"-amb{n_amb}" if n_amb else "")
    f1 = bert_squad.train(
        exp=exp,
        data_dir=ROOT,
        tokenizer=os.path.join(ROOT, "vocab.txt"),
        size="tiny",
        max_seq=MAX_SEQ,
        logs="logs",
        epochs=4,
        b_epochs=3,
        samples=10,
        batch_size=13,
        lr=5e-4,  # from-scratch tiny model (the reference's 5e-5 is a
        delta=delta,  # pretrained-base fine-tune rate)
        seed=SEED,
    )
    print(f"final f1={f1:.4f}", flush=True)

    # span-level uncertainty columns (VERDICT r4 #5): per-draw EM/F1 std
    # and modal-answer agreement, per eval phase, from the dumper record
    results_path = next(
        os.path.join("logs", f) for f in os.listdir("logs")
        if f.startswith(exp) and f.endswith(".results.json")
    )
    results = json.load(open(results_path))
    span_cols = {}
    for phase, rec in results.items():
        if not isinstance(rec, dict):
            continue
        keys = [k for k in rec if "span_agreement" in k
                or "_of_draws" in k or k == "f1"
                or k.endswith(("exact_match", "_f1"))]
        if keys:
            span_cols[phase] = {k: rec[k] for k in sorted(keys)}

    summary = {
        "corpus": {
            "train_questions": len(train_ex),
            "dev_questions": len(dev_ex),
            "dev_multi_window": int(n_multi),
            "dev_answer_in_window2": int(n_w2_answer),
            "dev_ambiguous_two_conflicting_facts": int(n_amb),
            "max_seq": MAX_SEQ,
            "doc_stride": bert_squad.DOC_STRIDE,
        },
        "delta": delta,
        "final_f1": float(f1),
        "span_uncertainty_by_phase": span_cols,
    }
    tag = f"_amb{n_amb}" if n_amb else ""
    with open(f"logs/squad_artifact_summary_d{delta}{tag}.json", "w") as fh:
        json.dump(summary, fh, indent=2)


if __name__ == "__main__":
    import sys

    main(float(sys.argv[1]) if len(sys.argv) > 1 else 0.05,
         float(sys.argv[2]) if len(sys.argv) > 2 else 0.0)
