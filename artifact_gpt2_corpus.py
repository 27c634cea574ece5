"""Quality artifact: the REAL-TEXT causal-LM path end to end on the chip.

The offline box has no real GPT-2 BPE artifacts or corpora, so this script
constructs both in the stock HF file formats and runs the full pipeline the
`--corpus` flag ships: text file -> native BPE tokenizer (bpe.cc) ->
packed causal-LM windows -> 4-phase GPT-2 recipe (frequentist -> MOPED ->
Bayesian eval -> ELBO train) on the real TPU.

Corpus: a word-level first-order Markov language (40-word lexicon, each
word followed by its successor with p=0.9, uniform otherwise) rendered as
actual text — the analogue of the synthetic id-level task in
models/gpt2.py, but now the model must also learn the BPE segmentation.
The word-level Bayes rate is 0.9 + 0.1/40 = 0.9025; token-level accuracy
can exceed it (within-word continuations are deterministic given the
merges). Vocab/merges are derived from the lexicon: left-to-right pair
merges per word, so every lexicon word (with leading space) is one token —
making the token-level ceiling equal the word-level one and the artifact's
convergence checkable.

Reproduces: `python artifact_gpt2_corpus.py` (deterministic; writes
dataset/lm_artifact/ and logs/gpt2-corpus-artifact.*).
"""
import json
import os

import numpy as np

LEXICON = [
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog", "while",
    "seven", "wizards", "brew", "tonic", "under", "pale", "moon", "light",
    "and", "old", "river", "bends", "past", "stone", "mill", "where",
    "children", "gather", "wild", "berries", "before", "dusk", "settles",
    "upon", "quiet", "valley", "farms", "keeping", "watch", "through",
    "night",
]
ORDER_FRAC = 0.9
N_WORDS = 80_000
SEED = 0
ROOT = "dataset/lm_artifact"


def build_vocab_and_merges():
    """GPT-2-format vocab.json/merges.txt making each ' word' one token."""
    from bayeformers_tpu.native import gpt2_byte_alphabet

    alphabet = gpt2_byte_alphabet()
    vocab = {alphabet[b]: b for b in range(256)}
    merges: list[str] = []
    seen = set()

    def add_word(w):
        # left-to-right chain: "Ġ t", "Ġt h", ... composes "Ġword"
        acc = w[0]
        for ch in w[1:]:
            pair = f"{acc} {ch}"
            if pair not in seen:
                seen.add(pair)
                merges.append(pair)
                merged = acc + ch
                if merged not in vocab:
                    vocab[merged] = len(vocab)
            acc = acc + ch
        return acc

    # Ġ-chains only: every merge pair's left element carries the Ġ prefix,
    # so chains of different words can never interfere (a plain "t o"-style
    # merge from word A would hijack word B's byte run — measured). The one
    # sentence-initial word per document falls back to byte tokens, which
    # is fine (all 256 byte ids exist).
    for w in LEXICON:
        add_word("Ġ" + w)
    vocab["<|endoftext|>"] = len(vocab)
    return vocab, merges


def main():
    os.makedirs(ROOT, exist_ok=True)
    vocab, merges = build_vocab_and_merges()
    with open(f"{ROOT}/vocab.json", "w", encoding="utf-8") as fh:
        json.dump(vocab, fh, ensure_ascii=False)
    with open(f"{ROOT}/merges.txt", "w", encoding="utf-8") as fh:
        fh.write("#version: 0.2\n" + "\n".join(merges) + "\n")

    rng = np.random.default_rng(SEED)
    succ = rng.permutation(len(LEXICON))
    words = np.empty(N_WORDS, np.int64)
    words[0] = rng.integers(len(LEXICON))
    follow = rng.random(N_WORDS - 1) < ORDER_FRAC
    noise = rng.integers(0, len(LEXICON), N_WORDS - 1)
    for t in range(1, N_WORDS):
        words[t] = succ[words[t - 1]] if follow[t - 1] else noise[t - 1]
    text = " ".join(LEXICON[w] for w in words)
    with open(f"{ROOT}/corpus.txt", "w", encoding="utf-8") as fh:
        fh.write(text)
    bayes_rate = ORDER_FRAC + (1 - ORDER_FRAC) / len(LEXICON)
    print(f"corpus: {N_WORDS} words, word-level bayes rate {bayes_rate:.4f}")

    from bayeformers_tpu.workloads import gpt2_lm

    results = gpt2_lm.train(
        exp="gpt2-corpus-artifact", model="gpt2", logs="logs",
        corpus=ROOT, epochs=2, b_epochs=3, samples=10, batch_size=8,
        seq=128, n_train=0, n_test=64, lr=3e-4, delta=0.05, seed=1,
        size="base", estimator="antithetic", bf16=True,
    )
    print("artifact results:", results)
    print(f"word-level bayes rate for reference: {bayes_rate:.4f}")


if __name__ == "__main__":
    main()
