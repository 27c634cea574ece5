"""HF FLAX transformer adapters (BERT / DistilBERT, classification / QA).

The reference fine-tunes ``AutoModelForSequenceClassification`` on GLUE
(`examples/bert_glue.py:48-53`) and ``AutoModelForQuestionAnswering`` on
SQuAD (`examples/bert_squad.py`), pulling pretrained weights from the hub.
This adapter builds the FLAX equivalents; with no network egress (or
``pretrained=None``) it constructs randomly-initialized models from a config,
which is exactly what the perf benchmarks need. It also reproduces the
reference's model-family input pruning: distilbert-style models take no
``token_type_ids`` (`examples/bert_squad.py:184-185`).

The returned ``apply_fn(params, **batch)`` closes over ``module.apply`` so
both the vmapped tier-A path and the interception-based fused Pallas path
(nn/fused.py) work on it unchanged.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


BERT_BASE_KWARGS = dict(
    vocab_size=30522, hidden_size=768, num_hidden_layers=12,
    num_attention_heads=12, intermediate_size=3072, max_position_embeddings=512,
)
BERT_TINY_KWARGS = dict(
    vocab_size=1024, hidden_size=128, num_hidden_layers=2,
    num_attention_heads=2, intermediate_size=256, max_position_embeddings=128,
)


@dataclasses.dataclass
class ModelBundle:
    hf_model: Any
    apply_fn: Callable[..., Any]   # (params, input_ids, attention_mask, token_type_ids, deterministic=..., rngs=...) -> logits
    params: Any
    config: Any
    uses_token_type_ids: bool


def build_bert(
    task: str = "classification",
    n_labels: int = 2,
    pretrained: Optional[str] = None,
    size: str = "base",
    seed: int = 0,
    dtype=jnp.float32,
    **config_overrides,
) -> ModelBundle:
    """Build a Flax BERT for ``task`` in {'classification', 'qa'}.

    ``pretrained`` may be a local path or hub name (requires network/cache);
    otherwise a random-init model from a BERT-base (or 'tiny' test-size)
    config is returned.
    """
    from transformers import BertConfig
    from transformers import (
        FlaxBertForQuestionAnswering,
        FlaxBertForSequenceClassification,
    )

    cls = (
        FlaxBertForSequenceClassification
        if task == "classification"
        else FlaxBertForQuestionAnswering
    )
    if pretrained is not None:
        model = cls.from_pretrained(pretrained, num_labels=n_labels, dtype=dtype)
        config = model.config
    else:
        kwargs = dict(BERT_BASE_KWARGS if size == "base" else BERT_TINY_KWARGS)
        kwargs.update(config_overrides)
        config = BertConfig(num_labels=n_labels, **kwargs)
        model = cls(config, seed=seed, dtype=dtype)
    params = model.params

    def apply_fn(
        p,
        input_ids,
        attention_mask=None,
        token_type_ids=None,
        position_ids=None,
        deterministic: bool = True,
        rngs: Optional[dict] = None,
    ):
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        if position_ids is None:
            position_ids = jnp.broadcast_to(
                jnp.arange(input_ids.shape[-1]), input_ids.shape
            )
        out = model.module.apply(
            {"params": p},
            input_ids, attention_mask, token_type_ids, position_ids, None,
            deterministic=deterministic,
            return_dict=False,
            rngs=rngs,
        )
        if task == "classification":
            return out[0]
        return out[0], out[1]  # start_logits, end_logits

    return ModelBundle(model, apply_fn, params, config, uses_token_type_ids=True)


def build_distilbert(
    task: str = "classification",
    n_labels: int = 2,
    pretrained: Optional[str] = None,
    size: str = "base",
    seed: int = 0,
    dtype=jnp.float32,
    **config_overrides,
) -> ModelBundle:
    """DistilBERT variant (the reference GLUE example supports
    distilbert-base-uncased, `examples/bert_glue.py:318`). DistilBERT takes
    no token_type_ids — ``uses_token_type_ids=False`` drives the input
    pruning the reference applies per model family
    (`examples/bert_squad.py:184-185`)."""
    from transformers import (
        DistilBertConfig,
        FlaxDistilBertForQuestionAnswering,
        FlaxDistilBertForSequenceClassification,
    )

    cls = (
        FlaxDistilBertForSequenceClassification
        if task == "classification"
        else FlaxDistilBertForQuestionAnswering
    )
    if pretrained is not None:
        model = cls.from_pretrained(pretrained, num_labels=n_labels, dtype=dtype)
        config = model.config
    else:
        if size == "base":
            kwargs = dict(vocab_size=30522, dim=768, n_layers=6, n_heads=12,
                          hidden_dim=3072, max_position_embeddings=512)
        else:
            kwargs = dict(vocab_size=1024, dim=128, n_layers=2, n_heads=2,
                          hidden_dim=256, max_position_embeddings=128)
        kwargs.update(config_overrides)
        config = DistilBertConfig(num_labels=n_labels, **kwargs)
        model = cls(config, seed=seed, dtype=dtype)
    params = model.params

    def apply_fn(
        p, input_ids, attention_mask=None, deterministic: bool = True,
        rngs: Optional[dict] = None, **_ignored,
    ):
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        out = model.module.apply(
            {"params": p}, input_ids, attention_mask,
            deterministic=deterministic, return_dict=False, rngs=rngs,
        )
        if task == "classification":
            return out[0]
        return out[0], out[1]

    return ModelBundle(model, apply_fn, params, config, uses_token_type_ids=False)


def build_roberta(
    task: str = "classification",
    n_labels: int = 2,
    pretrained: Optional[str] = None,
    size: str = "base",
    seed: int = 0,
    dtype=jnp.float32,
    **config_overrides,
) -> ModelBundle:
    """RoBERTa variant (the reference's per-family input pruning names
    xlm/roberta/camembert alongside distilbert, `examples/bert_squad.py:
    184-185` — families its AutoModel path accepts). RoBERTa's quirks vs
    BERT: a single token-type (``type_vocab_size=1``, so token_type_ids are
    pruned like distilbert's) and position ids that start at
    ``pad_token_id + 1`` and skip padding positions — computed here exactly
    as HF's ``create_position_ids_from_input_ids`` does, since calling
    ``module.apply`` directly bypasses the HF wrapper that normally adds
    them."""
    from transformers import RobertaConfig
    from transformers import (
        FlaxRobertaForQuestionAnswering,
        FlaxRobertaForSequenceClassification,
    )

    cls = (
        FlaxRobertaForSequenceClassification
        if task == "classification"
        else FlaxRobertaForQuestionAnswering
    )
    if pretrained is not None:
        model = cls.from_pretrained(pretrained, num_labels=n_labels, dtype=dtype)
        config = model.config
    else:
        if size == "base":
            kwargs = dict(
                vocab_size=50265, hidden_size=768, num_hidden_layers=12,
                num_attention_heads=12, intermediate_size=3072,
                max_position_embeddings=514, type_vocab_size=1, pad_token_id=1,
            )
        else:
            kwargs = dict(
                vocab_size=1024, hidden_size=128, num_hidden_layers=2,
                num_attention_heads=2, intermediate_size=256,
                max_position_embeddings=136, type_vocab_size=1, pad_token_id=1,
            )
        kwargs.update(config_overrides)
        config = RobertaConfig(num_labels=n_labels, **kwargs)
        model = cls(config, seed=seed, dtype=dtype)
    params = model.params
    pad_id = config.pad_token_id

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
            not_pad = (input_ids != pad_id).astype(jnp.int32)
            position_ids = jnp.cumsum(not_pad, axis=-1) * not_pad + pad_id
        token_type_ids = jnp.zeros_like(input_ids)
        out = model.module.apply(
            {"params": p},
            input_ids, attention_mask, token_type_ids, position_ids, None,
            deterministic=deterministic,
            return_dict=False,
            rngs=rngs,
        )
        if task == "classification":
            return out[0]
        return out[0], out[1]

    return ModelBundle(model, apply_fn, params, config, uses_token_type_ids=False)


def build_electra(
    task: str = "classification",
    n_labels: int = 2,
    pretrained: Optional[str] = None,
    size: str = "base",
    seed: int = 0,
    dtype=jnp.float32,
    **config_overrides,
) -> ModelBundle:
    """ELECTRA variant (BERT-shaped encoder; its Flax self-attention is a
    copy of BERT's, so the mha interception applies unchanged). ELECTRA's
    quirk is a separate ``embedding_size`` projected up to ``hidden_size``;
    the tiny config exercises that projection."""
    from transformers import ElectraConfig
    from transformers import (
        FlaxElectraForQuestionAnswering,
        FlaxElectraForSequenceClassification,
    )

    cls = (
        FlaxElectraForSequenceClassification
        if task == "classification"
        else FlaxElectraForQuestionAnswering
    )
    if pretrained is not None:
        model = cls.from_pretrained(pretrained, num_labels=n_labels, dtype=dtype)
        config = model.config
    else:
        if size == "base":
            kwargs = dict(
                vocab_size=30522, embedding_size=768, hidden_size=768,
                num_hidden_layers=12, num_attention_heads=12,
                intermediate_size=3072, max_position_embeddings=512,
            )
        else:
            kwargs = dict(
                vocab_size=1024, embedding_size=64, hidden_size=128,
                num_hidden_layers=2, num_attention_heads=2,
                intermediate_size=256, max_position_embeddings=128,
            )
        kwargs.update(config_overrides)
        config = ElectraConfig(num_labels=n_labels, **kwargs)
        model = cls(config, seed=seed, dtype=dtype)
    params = model.params

    def apply_fn(
        p,
        input_ids,
        attention_mask=None,
        token_type_ids=None,
        position_ids=None,
        deterministic: bool = True,
        rngs: Optional[dict] = None,
    ):
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        if position_ids is None:
            position_ids = jnp.broadcast_to(
                jnp.arange(input_ids.shape[-1]), input_ids.shape
            )
        out = model.module.apply(
            {"params": p},
            input_ids, attention_mask, token_type_ids, position_ids, None,
            deterministic=deterministic,
            return_dict=False,
            rngs=rngs,
        )
        if task == "classification":
            return out[0]
        return out[0], out[1]

    return ModelBundle(model, apply_fn, params, config, uses_token_type_ids=True)


def build_albert(
    task: str = "classification",
    n_labels: int = 2,
    pretrained: Optional[str] = None,
    size: str = "base",
    seed: int = 0,
    dtype=jnp.float32,
    **config_overrides,
) -> ModelBundle:
    """ALBERT variant. Its defining feature is cross-layer parameter sharing:
    one layer group's modules are invoked once per layer, so the fused
    interception samples the SAME weights for every repetition within a
    forward (the tied-module guard in nn/fused.py). Note the divergence vs
    the torch reference, where ``Linear.forward`` re-samples on every call
    and a tied module would draw fresh weights per repetition — per-call
    seeds here are keyed by parameter path, which is the semantics the KL
    accounting (one term per parameter) is consistent with."""
    from transformers import AlbertConfig
    from transformers import (
        FlaxAlbertForQuestionAnswering,
        FlaxAlbertForSequenceClassification,
    )

    cls = (
        FlaxAlbertForSequenceClassification
        if task == "classification"
        else FlaxAlbertForQuestionAnswering
    )
    if pretrained is not None:
        model = cls.from_pretrained(pretrained, num_labels=n_labels, dtype=dtype)
        config = model.config
    else:
        if size == "base":
            kwargs = dict(
                vocab_size=30000, embedding_size=128, hidden_size=768,
                num_hidden_layers=12, num_attention_heads=12,
                intermediate_size=3072, max_position_embeddings=512,
            )
        else:
            kwargs = dict(
                vocab_size=1024, embedding_size=32, hidden_size=128,
                num_hidden_layers=2, num_attention_heads=2,
                intermediate_size=256, max_position_embeddings=128,
            )
        kwargs.update(config_overrides)
        config = AlbertConfig(num_labels=n_labels, **kwargs)
        model = cls(config, seed=seed, dtype=dtype)
    params = model.params

    def apply_fn(
        p,
        input_ids,
        attention_mask=None,
        token_type_ids=None,
        position_ids=None,
        deterministic: bool = True,
        rngs: Optional[dict] = None,
    ):
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        if position_ids is None:
            position_ids = jnp.broadcast_to(
                jnp.arange(input_ids.shape[-1]), input_ids.shape
            )
        out = model.module.apply(
            {"params": p},
            input_ids, attention_mask, token_type_ids, position_ids,
            deterministic=deterministic,
            return_dict=False,
            rngs=rngs,
        )
        if task == "classification":
            return out[0]
        return out[0], out[1]

    return ModelBundle(model, apply_fn, params, config, uses_token_type_ids=True)


def build_model(model_name: str, **kwargs) -> ModelBundle:
    """Family dispatch by model name (mirrors the reference's AutoModel use
    with its per-family input handling)."""
    name = model_name.lower()
    if "distilbert" in name:
        return build_distilbert(**kwargs)
    if "roberta" in name or "camembert" in name:
        return build_roberta(**kwargs)
    if "electra" in name:
        return build_electra(**kwargs)
    if "albert" in name:
        return build_albert(**kwargs)
    return build_bert(**kwargs)


def prune_inputs(bundle: ModelBundle, inputs: dict) -> dict:
    """Drop token_type_ids for model families that do not take them
    (reference `examples/bert_squad.py:184-185`)."""
    if not bundle.uses_token_type_ids:
        inputs = {k: v for k, v in inputs.items() if k != "token_type_ids"}
    return inputs


def synthetic_batch(
    rng, batch_size: int, seq_len: int, vocab_size: int, n_labels: int = 2,
    task: str = "classification",
) -> dict:
    """Offline stand-in for a tokenized GLUE/SQuAD batch."""
    ids = rng.integers(0, vocab_size, (batch_size, seq_len))
    batch = {
        "input_ids": jnp.asarray(ids, jnp.int32),
        "attention_mask": jnp.ones((batch_size, seq_len), jnp.int32),
        "token_type_ids": jnp.zeros((batch_size, seq_len), jnp.int32),
    }
    if task == "classification":
        batch["labels"] = jnp.asarray(rng.integers(0, n_labels, (batch_size,)))
    else:
        batch["start_positions"] = jnp.asarray(rng.integers(0, seq_len, (batch_size,)))
        batch["end_positions"] = jnp.asarray(rng.integers(0, seq_len, (batch_size,)))
    return batch
