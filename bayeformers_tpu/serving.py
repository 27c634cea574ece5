"""Batched posterior-predictive inference engine (serving tier).

The reference stops at training scripts; deploying a converted model means
hand-rolling the MC loop per request. This module packages the serving path
the framework is built for: a ``Predictor`` that jit-compiles one fused
S-sample forward per (batch, sequence) bucket, pads ragged request batches
to those buckets (so XLA never sees a fresh shape at request time), skips
the sampled-weight residual writes (``save_weights=False`` — inference runs
no backward), and returns calibrated posterior-predictive summaries
(mean probs, epistemic std, predictive entropy) rather than raw logits.

Deterministic serving: each request's MC noise is derived from a caller
seed via ``jax.random.fold_in``, so identical (inputs, seed) pairs
reproduce bit-identical outputs across processes on the same hardware —
the property audits of uncertainty-gated systems need.

Usage::

    predictor = Predictor(bmodel, bparams, n_samples=10,
                          batch_sizes=(8, 32), seq_lens=(128,))
    out = predictor(batch, seed=123)      # dict of np arrays, depadded
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _trim_pad_columns(batch: dict) -> dict:
    """Drop trailing all-pad token columns so short requests land in the
    smallest sequence bucket that fits (featurizers pad to the largest)."""
    true_l = max(1, int(np.asarray(batch["attention_mask"]).sum(-1).max()))
    return {k: np.asarray(v)[:, :true_l] for k, v in batch.items()}


def _bucket(value: int, sizes: tuple[int, ...], kind: str) -> int:
    for s in sorted(sizes):
        if value <= s:
            return s
    raise ValueError(
        f"{kind}={value} exceeds the largest configured bucket {max(sizes)}; "
        f"raise Predictor({kind}s=...) or shard the request"
    )


@dataclasses.dataclass
class Predictor:
    """Bucketed, jit-cached Bayesian inference over a converted model.

    ``batch_sizes`` / ``seq_lens`` define the compile buckets; a request of
    ragged size is right-padded (ids with ``pad_id``, attention mask with
    zeros) up to the smallest bucket that fits, so serving traffic reuses a
    handful of compiled programs. Padded rows/positions are dropped before
    returning.
    """

    bmodel: Any
    bparams: Any
    n_samples: int = 10
    batch_sizes: tuple[int, ...] = (1, 8, 32)
    seq_lens: tuple[int, ...] = (128,)
    pad_id: int = 0
    antithetic: bool = False
    task: str = "classification"  # or "qa" (span heads) / "causal-lm"
    max_answer_len: int = 30  # qa: span-length cap (HF default the reference
    n_best: int = 5           # inherits via compute_predictions_logits)
    doc_stride: int = 128     # qa: window advance for long contexts
    top_k: int = 50           # causal-lm: next-token candidates returned
    input_keys: tuple[str, ...] = (
        "input_ids", "attention_mask", "token_type_ids"
    )

    def __post_init__(self):
        if self.antithetic and self.n_samples % 2:
            raise ValueError("antithetic serving needs an even n_samples")
        if self.task not in ("classification", "qa", "causal-lm"):
            raise ValueError(f"unknown task {self.task!r}")

        def summarize(logits):
            probs_s = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            probs = jnp.mean(probs_s, axis=0)
            ent = lambda p: -jnp.sum(
                p * jnp.log(jnp.clip(p, 1e-12)), axis=-1
            )
            entropy = ent(probs)
            return {
                "probs": probs,
                "epistemic_std": jnp.std(probs_s, axis=0),
                "entropy": entropy,
                # BALD mutual information: H[mean_s p_s] - mean_s H[p_s] —
                # the epistemic share of the predictive entropy
                "mutual_info": entropy - jnp.mean(ent(probs_s), axis=0),
                "pred": jnp.argmax(probs, axis=-1),
            }

        @functools.partial(jax.jit, static_argnums=())
        def _run(bparams, key, inputs):
            out, _ = self.bmodel.mc_apply_fused(
                bparams, key, self.n_samples, save_weights=False,
                antithetic=self.antithetic, **inputs,
            )
            if self.task == "qa":
                # span heads: per-position distributions over the sequence.
                # Padded positions (attention_mask==0 — incl. bucket padding)
                # get finfo.min so no probability mass leaks to them.
                start, end = out
                neg = jnp.finfo(jnp.float32).min
                live = inputs["attention_mask"][None] > 0  # (1, B, L)
                start = jnp.where(live, start.astype(jnp.float32), neg)
                end = jnp.where(live, end.astype(jnp.float32), neg)
                res = {
                    f"{tag}_{k}": v
                    for tag, logits in (("start", start), ("end", end))
                    for k, v in summarize(logits).items()
                }
                # per-draw span log-probs, row-major (B, S, L): each MC draw
                # decodes its own answer downstream — span-level epistemic
                # uncertainty (the reference's acc_std idiom elevated to
                # answers, `examples/bert_squad.py:481-484`)
                res["start_logp_draws"] = jnp.transpose(
                    jax.nn.log_softmax(start, axis=-1), (1, 0, 2)
                )
                res["end_logp_draws"] = jnp.transpose(
                    jax.nn.log_softmax(end, axis=-1), (1, 0, 2)
                )
                return res
            if self.task == "causal-lm":
                # out: (S, B, L, V) next-token logits — predict the token
                # after each row's last live position, with the predictive
                # entropy split into aleatoric + epistemic (BALD mutual
                # information: H[mean_s p_s] - mean_s H[p_s]). top_k keeps
                # the returned distribution small at GPT-2 vocab sizes.
                idx = jnp.maximum(
                    jnp.sum(inputs["attention_mask"], axis=-1) - 1, 0
                )  # (B,); all-pad bucket rows clamp to 0 and are depadded
                last = jnp.take_along_axis(
                    out.astype(jnp.float32), idx[None, :, None, None], axis=2
                )[:, :, 0]  # (S, B, V)
                probs_s = jax.nn.softmax(last, axis=-1)
                probs = jnp.mean(probs_s, axis=0)
                ent = lambda p: -jnp.sum(
                    p * jnp.log(jnp.clip(p, 1e-12)), axis=-1
                )
                entropy = ent(probs)
                mutual_info = entropy - jnp.mean(ent(probs_s), axis=0)
                top_p, top_ids = jax.lax.top_k(probs, self.top_k)
                std_at_top = jnp.take_along_axis(
                    jnp.std(probs_s, axis=0), top_ids, axis=-1
                )
                return {
                    "topk_ids": top_ids,
                    "topk_probs": top_p,
                    "topk_epistemic_std": std_at_top,
                    "entropy": entropy,
                    "mutual_info": mutual_info,
                    "pred": top_ids[:, 0],
                }
            return summarize(out)

        self._run = _run

    def warmup(self, seed: int = 0) -> int:
        """Compile every (batch, seq) bucket ahead of traffic; returns the
        number of programs compiled."""
        n = 0
        for b in self.batch_sizes:
            for L in self.seq_lens:
                batch = {
                    "input_ids": np.full((b, L), self.pad_id, np.int32),
                    "attention_mask": np.zeros((b, L), np.int32),
                    "token_type_ids": np.zeros((b, L), np.int32),
                }
                self(batch, seed=seed)
                n += 1
        return n

    def __call__(
        self,
        batch: dict,
        seed: int = 0,
        features: list | None = None,
        contexts: list | None = None,
    ) -> dict:
        """Run one request batch; returns depadded numpy arrays.

        For ``task="causal-lm"`` (decoder families, models/gpt2.py) the
        result holds per-request next-token summaries at the last live
        position: ``topk_ids``/``topk_probs``/``topk_epistemic_std``
        (``(n, top_k)``), ``pred``, predictive ``entropy``, and the BALD
        ``mutual_info`` epistemic component.

        For ``task="qa"`` the result additionally carries ``spans``: per
        request, the ``n_best`` answer spans as ``{"start", "end", "score",
        "text"}`` dicts ranked by descending ``log p(start) + log p(end)``
        under the MC-averaged posterior predictive — the serving counterpart
        of the reference's ``compute_predictions_logits`` n-best decode
        (`examples/bert_squad.py:357-368`). ``features``/``contexts`` are
        optional parallel lists (one per request row) of
        ``utils.squad.featurize`` features and their context strings; when
        given, each span also carries its decoded answer ``text``.
        """
        inputs = {k: np.asarray(batch[k]) for k in self.input_keys
                  if k in batch}
        n, L = inputs["input_ids"].shape
        if "attention_mask" not in inputs:
            # bucket padding must be masked even when the caller omits the
            # mask, else results depend on which bucket the request lands in
            inputs["attention_mask"] = np.ones((n, L), np.int32)
        nb = _bucket(n, self.batch_sizes, "batch_size")
        lb = _bucket(L, self.seq_lens, "seq_len")
        padded = {}
        for k, v in inputs.items():
            fill = self.pad_id if k == "input_ids" else 0
            out = np.full((nb, lb), fill, v.dtype)
            out[:n, :L] = v
            padded[k] = jnp.asarray(out)
        key = jax.random.fold_in(jax.random.key(seed), nb * 100003 + lb)
        out = self._run(self.bparams, key, padded)
        # depad rows always; per-position arrays (qa) also depad positions.
        # causal-lm outputs are per-row (top-k dims are not positions).
        if self.task == "causal-lm":
            result = {k: np.asarray(v)[:n] for k, v in out.items()}
        else:
            result = {}
            for k, v in out.items():
                v = np.asarray(v)
                if k.endswith("_logp_draws"):  # (B, S, L): draws not rows
                    result[k] = v[:n, :, :L]
                elif v.ndim >= 2:
                    result[k] = v[:n, :L]
                else:
                    result[k] = v[:n]
        if self.task == "qa":
            result["spans"] = self._decode_spans(result, n, features, contexts)
        return result

    def predict_texts(self, texts: list, *, tokenizer, seed: int = 0) -> dict:
        """Raw-string serving through the native tokenizer tier.

        ``texts`` per task:

        - ``classification``: list of strings or (sentence_a, sentence_b)
          pairs — encoded ``[CLS] a [SEP] (b [SEP])`` with the GLUE
          featurizer policy (utils/glue.py::featurize_pairs); ``tokenizer``
          is a :class:`~bayeformers_tpu.native.WordPieceTokenizer`.
        - ``qa``: list of (question, context) pairs — featurized with the
          SQuAD doc-stride pipeline (utils/squad.py::featurize), running
          EVERY doc-stride window of long contexts (chunked through the
          batch buckets) and aggregating the n-best spans across a
          question's windows by descending score — the serving counterpart
          of the reference's all-features ``compute_predictions_logits``
          decode (`examples/bert_squad.py:357-362`) and of the training
          workload's best-window compete (workloads/bert_squad.py). The
          result's ``spans`` has one n-best list per QUESTION; the
          per-position arrays are per-FEATURE rows, with ``feature_qid``
          mapping each row back to its question index.
        - ``causal-lm``: list of strings — raw BPE ids
          (:class:`~bayeformers_tpu.native.BPETokenizer`), TAIL-truncated
          to the largest sequence bucket (next-token prediction wants the
          most recent tokens); the result additionally carries
          ``topk_tokens``, the decoded candidate strings per request.
        """
        max_seq = max(self.seq_lens)
        if self.task == "causal-lm":
            rows = [tokenizer.encode(t)[-max_seq:] for t in texts]
            L = max(1, max((len(r) for r in rows), default=1))
            n = len(rows)
            ids = np.full((n, L), self.pad_id, np.int32)
            mask = np.zeros((n, L), np.int32)
            for i, r in enumerate(rows):
                ids[i, : len(r)] = r
                mask[i, : len(r)] = 1
            out = self({"input_ids": ids, "attention_mask": mask}, seed=seed)
            out["topk_tokens"] = [
                [tokenizer.decode([int(t)]) for t in row]
                for row in out["topk_ids"]
            ]
            return out

        cls_id = tokenizer.special_id("cls")
        sep_id = tokenizer.special_id("sep")
        if self.task == "qa":
            from bayeformers_tpu.utils import squad as squad_lib

            examples = [
                {"qid": str(i), "question": q, "context": c, "answers": []}
                for i, (q, c) in enumerate(texts)
            ]
            feats = squad_lib.featurize(
                examples, tokenizer.tokenize, max_seq=max_seq,
                doc_stride=self.doc_stride,
                cls_id=cls_id, sep_id=sep_id, pad_id=self.pad_id,
                is_training=False,
                offsets_fn=getattr(tokenizer, "tokenize_with_offsets", None),
            )
            # every doc-stride window runs; chunk the feature list through
            # the largest batch bucket and concatenate per-feature rows
            nmax = max(self.batch_sizes)
            parts: list[dict] = []
            for lo in range(0, len(feats), nmax):
                chunk = feats[lo:lo + nmax]
                batch = {
                    k: np.asarray([f[k] for f in chunk], np.int32)
                    for k in ("input_ids", "attention_mask", "token_type_ids")
                }
                parts.append(self(
                    _trim_pad_columns(batch), seed=seed, features=chunk,
                    contexts=[texts[int(f["qid"])][1] for f in chunk],
                ))
            # n-best aggregation across each question's windows (chunks can
            # produce different trimmed lengths, so only 1-D per-row arrays
            # concatenate; per-position arrays are padded to the widest)
            out: dict = {}
            keys = parts[0].keys()
            widest = max(p["start_probs"].shape[1] for p in parts)
            for k in keys:
                if k == "spans":
                    continue
                rows = [np.asarray(p[k]) for p in parts]
                if k.endswith("_logp_draws"):
                    # (rows, draws, L): positions are axis 2, and padded
                    # positions must never win a span decode (log-prob pad)
                    rows = [
                        np.pad(r, [(0, 0), (0, 0), (0, widest - r.shape[2])],
                               constant_values=-1e30) for r in rows
                    ]
                elif rows[0].ndim >= 2:
                    rows = [
                        np.pad(r, [(0, 0), (0, widest - r.shape[1])]
                               + [(0, 0)] * (r.ndim - 2)) for r in rows
                    ]
                out[k] = np.concatenate(rows, axis=0)
            out["feature_qid"] = np.asarray(
                [int(f["qid"]) for f in feats], np.int32
            )
            per_q: list[list] = [[] for _ in texts]
            flat_spans = [s for p in parts for s in p["spans"]]
            for f, spans in zip(feats, flat_spans):
                per_q[int(f["qid"])].extend(spans)
            out["spans"] = [
                sorted(sp, key=lambda d: -d["score"])[: self.n_best]
                for sp in per_q
            ]
            # span-level uncertainty (VERDICT r4 #5): each MC draw decodes
            # its own answer per question (that draw's windows compete),
            # exposing answer-level posterior disagreement alongside the
            # n-best of the MC-average
            n_draws = out["start_logp_draws"].shape[1]
            best_dq: list[list] = [[None] * n_draws for _ in texts]
            for fi, f in enumerate(feats):
                qi = int(f["qid"])
                for d in range(n_draws):
                    (s, e), score = squad_lib.best_span(
                        out["start_logp_draws"][fi, d],
                        out["end_logp_draws"][fi, d],
                        f["context_offset"],
                        max_answer_len=self.max_answer_len,
                    )
                    prev = best_dq[qi][d]
                    if prev is None or score > prev[0]:
                        best_dq[qi][d] = (
                            score, squad_lib.decode_span(f, texts[qi][1], s, e)
                        )
            out["draw_answers"] = [
                [t for _, t in per_d] for per_d in best_dq
            ]
            agreement = []
            for answers in out["draw_answers"]:
                counts: dict[str, int] = {}
                for a in answers:
                    counts[a] = counts.get(a, 0) + 1
                agreement.append(max(counts.values()) / n_draws)
            out["span_agreement"] = np.asarray(agreement, np.float32)
            return out

        from bayeformers_tpu.utils import glue as glue_lib

        pairs = [t if isinstance(t, tuple) else (t, None) for t in texts]
        batch = glue_lib.featurize_pairs(
            pairs, [0] * len(pairs), tokenizer.tokenize, max_seq=max_seq,
            cls_id=cls_id, sep_id=sep_id, pad_id=self.pad_id,
        )
        batch.pop("labels")
        return self(_trim_pad_columns(batch), seed=seed)

    def _decode_spans(self, result, n, features, contexts):
        from bayeformers_tpu.utils import squad as squad_lib

        log_start = np.log(np.clip(result["start_probs"], 1e-12, None))
        log_end = np.log(np.clip(result["end_probs"], 1e-12, None))
        spans = []
        for i in range(n):
            feat = features[i] if features else None
            offset = feat["context_offset"] if feat else 0
            best = squad_lib.n_best_spans(
                log_start[i], log_end[i], offset,
                max_answer_len=self.max_answer_len, n_best=self.n_best,
            )
            spans.append([
                {
                    "start": s,
                    "end": e,
                    "score": score,
                    "text": (
                        squad_lib.decode_span(feat, contexts[i], s, e)
                        if feat is not None and contexts is not None
                        else None
                    ),
                }
                for s, e, score in best
            ])
        return spans
