"""T5 encoder-decoder family (seq2seq LM) — extension beyond the reference.

Third architecture class after the encoder families (models/bert.py) and the
GPT-2 decoder (models/gpt2.py), proving the surgery's generality the same
way the reference's module-walking ``to_bayesian`` is model-agnostic
(`bayeformers/__init__.py:50-61`): HF's FlaxT5ForConditionalGeneration
converts with the UNCHANGED default rules — every T5 projection
(q/k/v/o, wi/wo, lm_head) is a plain ``nn.Dense`` with ``use_bias=False``,
i.e. a bare 2-D ``kernel`` group, so both the vmapped tier and the fused
interception tier handle it with zero new code paths.

Stays frequentist under the defaults, as in the reference's nn.Linear-only
scope: the shared token embedding, the per-block ``relative_attention_bias``
embedding tables, and RMS LayerNorm scales. With
``config.tie_word_embeddings`` (T5's default) the LM head is applied from
the shared embedding via a literal-params ``lm_head.apply`` whose kernel is
not a converted leaf — exactly the GPT-2 tied-head situation
(models/gpt2.py notes).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from bayeformers_tpu.models.bert import ModelBundle

# decoder_start_token_id = pad (0): HF leaves it None on a bare T5Config,
# which breaks both shift_right and encoder-decoder generate; every released
# T5 checkpoint uses the pad token
T5_SMALL_KWARGS = dict(
    vocab_size=32128, d_model=512, d_kv=64, d_ff=2048,
    num_layers=6, num_heads=8, decoder_start_token_id=0,
)
T5_TINY_KWARGS = dict(
    vocab_size=512, d_model=64, d_kv=16, d_ff=128,
    num_layers=2, num_heads=4, decoder_start_token_id=0,
)


def build_t5(
    pretrained: Optional[str] = None,
    size: str = "small",
    seed: int = 0,
    dtype=jnp.float32,
    **config_overrides,
) -> ModelBundle:
    """Flax T5 conditional generation as a :class:`ModelBundle`.

    ``apply_fn(params, input_ids, attention_mask=None, decoder_input_ids=None,
    decoder_attention_mask=None)`` returns decoder logits ``(B, L_dec, V)``;
    ``decoder_input_ids`` defaults to the shifted-right convention with the
    config's ``decoder_start_token_id`` (HF ``shift_tokens_right``).
    """
    import transformers

    if pretrained is not None:
        model = transformers.FlaxT5ForConditionalGeneration.from_pretrained(
            pretrained, dtype=dtype
        )
        config = model.config
    else:
        kwargs = dict(T5_SMALL_KWARGS if size == "small" else T5_TINY_KWARGS)
        kwargs.update(config_overrides)
        config = transformers.T5Config(**kwargs)
        model = transformers.FlaxT5ForConditionalGeneration(
            config, seed=seed, dtype=dtype
        )

    pad_id = config.pad_token_id
    # a bare T5Config leaves decoder_start_token_id None; HF's convention
    # (and every released T5 checkpoint) starts decoding from the pad token
    start_id = (
        config.decoder_start_token_id
        if config.decoder_start_token_id is not None else pad_id
    )

    def shift_right(labels):
        shifted = jnp.zeros_like(labels).at[:, 1:].set(labels[:, :-1])
        shifted = shifted.at[:, 0].set(start_id)
        return jnp.where(shifted == -100, pad_id, shifted)

    def apply_fn(
        p,
        input_ids,
        attention_mask=None,
        decoder_input_ids=None,
        decoder_attention_mask=None,
        labels=None,
        deterministic: bool = True,
        rngs: Optional[dict] = None,
        **_ignored,
    ):
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        if decoder_input_ids is None:
            if labels is None:
                raise ValueError(
                    "t5 apply_fn needs decoder_input_ids or labels"
                )
            decoder_input_ids = shift_right(labels)
        if decoder_attention_mask is None:
            decoder_attention_mask = jnp.ones_like(decoder_input_ids)
        return model.module.apply(
            {"params": p},
            input_ids=input_ids,
            attention_mask=attention_mask,
            decoder_input_ids=decoder_input_ids,
            decoder_attention_mask=decoder_attention_mask,
            deterministic=deterministic,
            return_dict=False,
            rngs=rngs,
        )[0]

    return ModelBundle(
        model, apply_fn, model.params, config, uses_token_type_ids=False
    )


def synthetic_seq2seq_batch(
    rng: np.random.Generator, batch: int, src_len: int, tgt_len: int,
    vocab: int,
):
    """Learnable toy task: the target is the source's first ``tgt_len``
    tokens mapped through a fixed random permutation (a relabeling the model
    must infer) — copy-with-substitution, solvable by cross-attention."""
    table = rng.permutation(vocab - 2) + 2  # keep 0 (pad) and 1 reserved
    src = rng.integers(2, vocab, (batch, src_len))
    tgt = table[src[:, :tgt_len] - 2]
    return {
        "input_ids": jnp.asarray(src, jnp.int32),
        "attention_mask": jnp.ones((batch, src_len), jnp.int32),
        "labels": jnp.asarray(tgt, jnp.int32),
    }
