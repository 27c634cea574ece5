"""BERT-scale uncertainty artifact: nonzero acc_std at 109M params.

VERDICT r3 #8: the committed bert-base artifacts report acc_std = 0.0 —
probe_draws.py showed a random-init bert-base FEATURE-COLLAPSES on the
template-style synthetic stand-ins (margins quantize to +-5.6-8.4 logits
for every input, 30-100x MOPED draw jitter). This artifact replaces
template identity with GRADED EVIDENCE, where the Bayes-optimal margin is
a *continuous function of token counts* the network must represent:

- sentence 1 carries 8 evidence slots, each independently the word
  "alpha" (evidence for label 1) or "beta" (label 0); k = #alpha.
- the label is drawn Bernoulli(k/8): the Bayes-optimal logit-diff is
  logit(k/8) — 0 at k=4, +-0.41 at k=3/5, +-1.1 at k=2/6 — a margin
  CONTINUUM straddling the MOPED jitter scale (0.05-0.2 measured), so
  converged-model MC draws genuinely flip argmaxes on the balanced rows.
- counting is linearly decodable from mean token embeddings, so the
  CE optimum is reachable where template memorization collapsed; 35%
  deterministic rows (k in {0, 8}) anchor overall accuracy above chance.
  Bayes ceiling: 0.35 + 0.65 * E[max(k,8-k)/8] ~ 0.76.

The data rides the REAL-DATA path end to end: MRPC-format TSVs + a local
vocab.txt -> native WordPiece tokenizer -> featurize_pairs -> the stock
4-phase bert_glue recipe (reference `examples/bert_glue.py:167-206`), so
the artifact also exercises the TSV/tokenizer pipeline at bert-base scale.

Reproduces: `python artifact_bertstd.py [delta] [seed] [b_epochs]`
(writes dataset/bertstd/ and logs/bertstd-*.results.json).
"""
import json
import os
import sys

import numpy as np

ROOT = "dataset/bertstd"
FILLER = [
    "meanwhile", "the", "committee", "reviewed", "evidence", "before",
    "reaching", "any", "verdict", "on", "balance", "of", "claims",
]


def build_vocab(path: str) -> None:
    vocab = (
        ["[PAD]"] + [f"[unused{i}]" for i in range(99)]
        + ["[UNK]", "[CLS]", "[SEP]", "[MASK]", "alpha", "beta"]
        + FILLER
    )
    with open(path, "w") as fh:
        fh.write("\n".join(vocab))


def gen_rows(rng: np.random.Generator, n: int) -> list[tuple[int, str, str]]:
    rows = []
    for _ in range(n):
        if rng.random() < 0.35:  # deterministic anchor rows
            k = int(rng.integers(0, 2)) * 8
        else:
            k = int(rng.binomial(8, 0.5))
        slots = np.array(["beta"] * 8, dtype=object)
        slots[rng.choice(8, k, replace=False)] = "alpha"
        label = int(rng.random() < k / 8)
        s1 = " ".join(slots)
        s2 = "the committee reviewed the balance of claims"
        rows.append((label, s1, s2))
    return rows


def write_tsv(path: str, rows) -> None:
    # MRPC layout (utils/glue.py TASKS): label col 0, text_a col 3,
    # text_b col 4, with a header line
    with open(path, "w") as fh:
        fh.write("Quality\t#1 ID\t#2 ID\t#1 String\t#2 String\n")
        for i, (label, s1, s2) in enumerate(rows):
            fh.write(f"{label}\t{i}\t{i}\t{s1}\t{s2}\n")


def main():
    delta = float(sys.argv[1]) if len(sys.argv) > 1 else 0.2
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    b_epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    rng = np.random.default_rng(0)  # data seed fixed; model seed varies
    os.makedirs(ROOT, exist_ok=True)
    build_vocab(os.path.join(ROOT, "vocab.txt"))
    write_tsv(os.path.join(ROOT, "train.tsv"), gen_rows(rng, 2048))
    write_tsv(os.path.join(ROOT, "dev.tsv"), gen_rows(rng, 256))
    for f in os.listdir(ROOT):  # stale feature caches shadow new TSVs
        if f.startswith("features_"):
            os.remove(os.path.join(ROOT, f))

    from bayeformers_tpu.workloads import bert_glue

    acc = bert_glue.train(
        exp="bertstd", model_name="bert", delta=delta, weight_decay=0.0,
        task="mrpc", data=ROOT, vocab=os.path.join(ROOT, "vocab.txt"),
        logs="logs", epochs=2, b_epochs=b_epochs, samples=10,
        batch_size=8, lr=3e-4, size="base", bf16=True, seed=seed,
        warmup=0.1,
    )
    print("final bayesian acc:", acc)
    with open("logs/bertstd_summary.json", "w") as fh:
        json.dump({"delta": delta, "seed": seed, "final_acc": float(acc)},
                  fh, indent=2)


if __name__ == "__main__":
    main()
