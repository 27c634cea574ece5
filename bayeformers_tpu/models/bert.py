"""HF FLAX transformer adapters (5 encoder families, classification / QA).

The reference fine-tunes ``AutoModelForSequenceClassification`` on GLUE
(`examples/bert_glue.py:48-53`) and ``AutoModelForQuestionAnswering`` on
SQuAD (`examples/bert_squad.py`), pulling pretrained weights from the hub.
This adapter builds the FLAX equivalents; with no network egress (or
``pretrained=None``) it constructs randomly-initialized models from a config,
which is exactly what the perf benchmarks need. It also reproduces the
reference's model-family input pruning: distilbert-style models take no
``token_type_ids`` (`examples/bert_squad.py:184-185`).

One table-driven builder covers all families (the round-2 file was five
near-identical ~70-line functions); the :data:`_FAMILIES` registry holds the
per-family HF classes, base/tiny configs, and input-signature style, and
``_make_apply`` folds the per-style quirks (RoBERTa's pad-aware position
ids, DistilBERT's two-argument signature, ALBERT's missing head-mask slot).

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


@dataclasses.dataclass(frozen=True)
class _Family:
    """Registry row: HF class names, config class, size presets, and the
    ``module.apply`` signature style."""

    config_cls: str
    seq_cls: str
    qa_cls: str
    base: dict
    tiny: dict
    # 'bert': (ids, mask, tok, pos, head_mask=None); 'albert': same minus the
    # head-mask slot; 'distilbert': (ids, mask); 'roberta': bert-style with
    # pad-aware position ids and a single token type.
    style: str
    uses_token_type_ids: bool


_FAMILIES: dict[str, _Family] = {
    "bert": _Family(
        "BertConfig", "FlaxBertForSequenceClassification",
        "FlaxBertForQuestionAnswering",
        base=BERT_BASE_KWARGS, tiny=BERT_TINY_KWARGS,
        style="bert", uses_token_type_ids=True,
    ),
    "distilbert": _Family(
        "DistilBertConfig", "FlaxDistilBertForSequenceClassification",
        "FlaxDistilBertForQuestionAnswering",
        base=dict(vocab_size=30522, dim=768, n_layers=6, n_heads=12,
                  hidden_dim=3072, max_position_embeddings=512),
        tiny=dict(vocab_size=1024, dim=128, n_layers=2, n_heads=2,
                  hidden_dim=256, max_position_embeddings=128),
        style="distilbert", uses_token_type_ids=False,
    ),
    "roberta": _Family(
        "RobertaConfig", "FlaxRobertaForSequenceClassification",
        "FlaxRobertaForQuestionAnswering",
        base=dict(vocab_size=50265, hidden_size=768, num_hidden_layers=12,
                  num_attention_heads=12, intermediate_size=3072,
                  max_position_embeddings=514, type_vocab_size=1,
                  pad_token_id=1),
        tiny=dict(vocab_size=1024, hidden_size=128, num_hidden_layers=2,
                  num_attention_heads=2, intermediate_size=256,
                  max_position_embeddings=136, type_vocab_size=1,
                  pad_token_id=1),
        style="roberta", uses_token_type_ids=False,
    ),
    "electra": _Family(
        "ElectraConfig", "FlaxElectraForSequenceClassification",
        "FlaxElectraForQuestionAnswering",
        base=dict(vocab_size=30522, embedding_size=768, hidden_size=768,
                  num_hidden_layers=12, num_attention_heads=12,
                  intermediate_size=3072, max_position_embeddings=512),
        tiny=dict(vocab_size=1024, embedding_size=64, hidden_size=128,
                  num_hidden_layers=2, num_attention_heads=2,
                  intermediate_size=256, max_position_embeddings=128),
        style="bert", uses_token_type_ids=True,
    ),
    "albert": _Family(
        "AlbertConfig", "FlaxAlbertForSequenceClassification",
        "FlaxAlbertForQuestionAnswering",
        base=dict(vocab_size=30000, embedding_size=128, hidden_size=768,
                  num_hidden_layers=12, num_attention_heads=12,
                  intermediate_size=3072, max_position_embeddings=512),
        tiny=dict(vocab_size=1024, embedding_size=32, hidden_size=128,
                  num_hidden_layers=2, num_attention_heads=2,
                  intermediate_size=256, max_position_embeddings=128),
        style="albert", uses_token_type_ids=True,
    ),
}


def _make_apply(model, task: str, style: str, config):
    """apply_fn closing over ``module.apply`` with the family's signature."""
    pad_id = getattr(config, "pad_token_id", 0)

    def head(out):
        if task == "classification":
            return out[0]
        return out[0], out[1]  # start_logits, end_logits

    if style == "distilbert":
        def apply_fn(
            p, input_ids, attention_mask=None, deterministic: bool = True,
            rngs: Optional[dict] = None, **_ignored,
        ):
            if attention_mask is None:
                attention_mask = jnp.ones_like(input_ids)
            return head(model.module.apply(
                {"params": p}, input_ids, attention_mask,
                deterministic=deterministic, return_dict=False, rngs=rngs,
            ))
        return apply_fn

    def apply_fn(
        p,
        input_ids,
        attention_mask=None,
        token_type_ids=None,
        position_ids=None,
        deterministic: bool = True,
        rngs: Optional[dict] = None,
        **_ignored,
    ):
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        if position_ids is None:
            if style == "roberta":
                # position ids start at pad_token_id + 1 and skip padding —
                # HF's create_position_ids_from_input_ids, reproduced here
                # because calling module.apply directly bypasses the HF
                # wrapper that normally adds them
                not_pad = (input_ids != pad_id).astype(jnp.int32)
                position_ids = jnp.cumsum(not_pad, axis=-1) * not_pad + pad_id
            else:
                position_ids = jnp.broadcast_to(
                    jnp.arange(input_ids.shape[-1]), input_ids.shape
                )
        args = (input_ids, attention_mask, token_type_ids, position_ids)
        if style != "albert":
            args = args + (None,)  # head_mask slot (bert/roberta/electra)
        return head(model.module.apply(
            {"params": p}, *args,
            deterministic=deterministic, return_dict=False, rngs=rngs,
        ))

    return apply_fn


def _build_family(
    family: str,
    task: str = "classification",
    n_labels: int = 2,
    pretrained: Optional[str] = None,
    size: str = "base",
    seed: int = 0,
    dtype=jnp.float32,
    **config_overrides,
) -> ModelBundle:
    import transformers

    fam = _FAMILIES[family]
    cls = getattr(transformers, fam.seq_cls if task == "classification"
                  else fam.qa_cls)
    if pretrained is not None:
        model = cls.from_pretrained(pretrained, num_labels=n_labels, dtype=dtype)
        config = model.config
    else:
        kwargs = dict(fam.base if size == "base" else fam.tiny)
        kwargs.update(config_overrides)
        config = getattr(transformers, fam.config_cls)(
            num_labels=n_labels, **kwargs
        )
        model = cls(config, seed=seed, dtype=dtype)
    return ModelBundle(
        model, _make_apply(model, task, fam.style, config), model.params,
        config, uses_token_type_ids=fam.uses_token_type_ids,
    )


def build_bert(task: str = "classification", **kwargs) -> ModelBundle:
    """Flax BERT for ``task`` in {'classification', 'qa'}.

    ``pretrained`` may be a local path or hub name (requires network/cache);
    otherwise a random-init model from a BERT-base (or 'tiny' test-size)
    config is returned. Extra kwargs override config fields.
    """
    return _build_family("bert", task, **kwargs)


def build_distilbert(task: str = "classification", **kwargs) -> ModelBundle:
    """DistilBERT variant (the reference GLUE example supports
    distilbert-base-uncased, `examples/bert_glue.py:318`). DistilBERT takes
    no token_type_ids — ``uses_token_type_ids=False`` drives the input
    pruning the reference applies per model family
    (`examples/bert_squad.py:184-185`)."""
    return _build_family("distilbert", task, **kwargs)


def build_roberta(task: str = "classification", **kwargs) -> ModelBundle:
    """RoBERTa variant (the reference's per-family input pruning names
    xlm/roberta/camembert alongside distilbert, `examples/bert_squad.py:
    184-185` — families its AutoModel path accepts). RoBERTa's quirks vs
    BERT: a single token-type (``type_vocab_size=1``, so token_type_ids are
    pruned like distilbert's) and pad-aware position ids (see _make_apply)."""
    return _build_family("roberta", task, **kwargs)


def build_electra(task: str = "classification", **kwargs) -> ModelBundle:
    """ELECTRA variant (BERT-shaped encoder; its Flax self-attention is a
    copy of BERT's, so the mha interception applies unchanged). ELECTRA's
    quirk is a separate ``embedding_size`` projected up to ``hidden_size``;
    the tiny config exercises that projection."""
    return _build_family("electra", task, **kwargs)


def build_albert(task: str = "classification", **kwargs) -> ModelBundle:
    """ALBERT variant. Its defining feature is cross-layer parameter sharing:
    one layer group's modules are invoked once per layer, so the fused
    interception samples the SAME weights for every repetition within a
    forward (the tied-module guard in nn/fused.py). Note the divergence vs
    the torch reference, where ``Linear.forward`` re-samples on every call
    and a tied module would draw fresh weights per repetition — per-call
    seeds here are keyed by parameter path, which is the semantics the KL
    accounting (one term per parameter) is consistent with. ALBERT's
    attention (q/k/v + output proj + LayerNorm in one module) has its own
    interception handler in nn/fused.py."""
    return _build_family("albert", task, **kwargs)


def build_model(model_name: str, **kwargs) -> ModelBundle:
    """Family dispatch by model name (mirrors the reference's AutoModel use
    with its per-family input handling)."""
    name = model_name.lower()
    if "gpt2" in name or "gpt-2" in name:
        from bayeformers_tpu.models.gpt2 import build_gpt2

        kwargs.pop("n_labels", None)
        return build_gpt2(task=kwargs.pop("task", "causal-lm"), **kwargs)
    if "t5" in name:
        from bayeformers_tpu.models.t5 import build_t5

        kwargs.pop("n_labels", None)
        kwargs.pop("task", None)
        return build_t5(**kwargs)
    for fam in ("llama", "mistral", "gemma"):
        if fam in name:
            from bayeformers_tpu.models.llama import build_llama_family

            kwargs.pop("n_labels", None)
            task = kwargs.pop("task", "causal-lm")
            if task != "causal-lm":
                raise ValueError(f"{fam} supports task='causal-lm'; got {task!r}")
            return build_llama_family(fam, **kwargs)
    if "vit" in name:
        from bayeformers_tpu.models.vit import build_vit

        return build_vit(**kwargs)
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
