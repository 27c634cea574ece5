"""GPT-2 decoder family (causal LM) — extension beyond the reference scope.

The reference (yliess86/BayeFormers) demonstrates encoder fine-tunes only
(GLUE/SQuAD, `examples/bert_glue.py`, `examples/bert_squad.py`), but its
core surgery is model-agnostic (`bayeformers/__init__.py::to_bayesian`
walks any nn.Module). This adapter proves the same generality here on a
decoder-only family: HF's FlaxGPT2LMHeadModel converts with the unchanged
default rules — GPT-2's ``FlaxConv1D`` projections (c_attn/c_proj/c_fc)
store a 2-D ``kernel`` + 1-D ``bias`` group exactly like ``nn.Dense``, just
transposed to (out, in), which the fused interception tier handles with a
``transposed=True`` dense path (nn/fused.py). The causal attention math
itself stays the stock module code: it is per-example, so it simply sees
the S*B super-batch.

Notes vs the encoder families:

- The LM head is weight-tied to ``wte`` by default; HF applies it as a
  separate top-level ``lm_head.apply`` with an externally supplied kernel,
  whose path ("kernel") never matches a converted leaf — the head stays
  frequentist (as do embeddings under the default rules), matching the
  reference's nn.Linear-only conversion scope.
- ``tie_word_embeddings=False`` puts a real ``lm_head/kernel`` Dense leaf
  in the tree, which converts and intercepts like any other.
- Opt-in embedding conversion (``EMBEDDING_RULE``) + the tied head have a
  tier nuance: the vmapped tier samples the whole tree, so the tied head
  consumes the SAMPLED wte; the fused tier intercepts only the lookup, so
  the tied head keeps mu. Both are valid posteriors (the head weight is a
  deterministic vs stochastic reuse of the table), but draws differ — use
  ``tie_word_embeddings=False`` if exact cross-tier parity with converted
  embeddings matters.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from bayeformers_tpu.models.bert import ModelBundle

GPT2_BASE_KWARGS = dict(
    vocab_size=50257, n_embd=768, n_layer=12, n_head=12, n_positions=1024,
)
GPT2_TINY_KWARGS = dict(
    vocab_size=1024, n_embd=128, n_layer=2, n_head=2, n_positions=128,
)


def build_gpt2(
    task: str = "causal-lm",
    pretrained: Optional[str] = None,
    size: str = "base",
    seed: int = 0,
    dtype=jnp.float32,
    **config_overrides,
) -> ModelBundle:
    """Flax GPT-2 causal LM as a :class:`ModelBundle`.

    ``apply_fn(params, input_ids, attention_mask=None, position_ids=None)``
    returns next-token logits ``(B, L, V)``; both ``mc_apply`` (vmapped)
    and ``mc_apply_fused`` (interception) consume it unchanged.
    """
    import transformers

    if task != "causal-lm":
        raise ValueError(f"gpt2 supports task='causal-lm'; got {task!r}")
    if pretrained is not None:
        model = transformers.FlaxGPT2LMHeadModel.from_pretrained(
            pretrained, dtype=dtype
        )
        config = model.config
    else:
        kwargs = dict(GPT2_BASE_KWARGS if size == "base" else GPT2_TINY_KWARGS)
        kwargs.update(config_overrides)
        config = transformers.GPT2Config(**kwargs)
        model = transformers.FlaxGPT2LMHeadModel(config, seed=seed, dtype=dtype)

    def apply_fn(
        p,
        input_ids,
        attention_mask=None,
        position_ids=None,
        deterministic: bool = True,
        rngs: Optional[dict] = None,
        **_ignored,
    ):
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        if position_ids is None:
            position_ids = jnp.broadcast_to(
                jnp.arange(input_ids.shape[-1]), input_ids.shape
            )
        return model.module.apply(
            {"params": p}, input_ids, attention_mask, position_ids,
            deterministic=deterministic, return_dict=False, rngs=rngs,
        )[0]

    return ModelBundle(
        model, apply_fn, model.params, config, uses_token_type_ids=False
    )


def synthetic_lm_batch(
    rng: np.random.Generator, batch: int, seq: int, vocab: int,
    order_frac: float = 0.85,
):
    """Synthetic language with learnable structure: a fixed random
    first-order Markov chain over the vocab, followed with probability
    ``order_frac`` per step (uniform otherwise). The Bayes-optimal
    next-token accuracy is ``order_frac + (1-order_frac)/vocab`` — a model
    that memorizes noise cannot beat it, which makes convergence claims
    checkable (same construction idea as utils/data.py's ambiguous
    examples).
    """
    succ = rng.permutation(vocab)  # deterministic successor table
    ids = np.empty((batch, seq), np.int64)
    ids[:, 0] = rng.integers(0, vocab, batch)
    follow = rng.random((batch, seq - 1)) < order_frac
    noise = rng.integers(0, vocab, (batch, seq - 1))
    for t in range(1, seq):
        ids[:, t] = np.where(follow[:, t - 1], succ[ids[:, t - 1]],
                             noise[:, t - 1])
    return {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((batch, seq), jnp.int32),
    }
