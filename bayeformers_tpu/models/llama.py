"""LLaMA-architecture decoder families (LLaMA / Mistral / Gemma) —
extension beyond the reference scope.

The reference demonstrates its surgery on 2020-era encoder fine-tunes only
(`examples/bert_glue.py`, `examples/bert_squad.py`); its core claim is that
``to_bayesian`` works on *any* model built from registered layers
(`bayeformers/__init__.py:50-57`, registry `bayeformers/nn/__init__.py:25`).
This adapter extends that claim to the modern decoder architecture class:
RMSNorm + rotary position embeddings + gated (SwiGLU) MLPs + grouped-query
attention. Every projection in these families is a bias-free ``nn.Dense``
(q/k/v/o, gate/up/down, lm_head), so the unchanged default conversion rules
(nn/surgery.py) cover them, and all three MC tiers apply:

- vmapped tier (`mc_apply`): samples the full tree per draw — works as-is;
- fused Pallas tier (`mc_apply_fused`): the per-Dense interception covers
  every projection, and ``nn/fused.py::handle_gqa_attention`` runs the whole
  attention block (rotary via the module's own ``rotary_emb``, GQA key/value
  head repetition, in-kernel causal masking) without head-split layout
  copies around the Pallas custom calls;
- local-reparameterization tier (`mc_apply_lrt`): activation-space sampling
  over the same Dense set.

Family quirks handled here:

- **GQA**: ``num_key_value_heads < num_attention_heads`` makes k/v
  projections narrower; the stock module repeats k/v heads after rotary
  (`modeling_flax_llama.py` ``jnp.repeat(key, num_key_value_groups)``), and
  the fused handler reproduces exactly that.
- **Gemma** decouples ``head_dim`` from ``hidden_size/num_heads`` and
  normalizes embeddings by sqrt(hidden_size) inside the module (stock code,
  unaffected by conversion).
- **Mistral** bands its causal mask by ``sliding_window``; the fused
  attention handler only fires when the window cannot bite (L <= window),
  falling back to the stock path otherwise.

Tensor parallelism: Megatron rules in parallel/mesh.py (`llama_param_spec`)
— q/k/v + gate/up column-sharded, o + down row-sharded; both the GSPMD tier
and the fused shard_map tier accept them (head-aligned because head_dim is
never sharded; requires tp | num_heads and tp | num_key_value_heads).

"base" is a BERT-base-scale configuration of the architecture (~12 layers,
hidden 768, GQA 12/4) so single-chip benchmarks are like-for-like with the
other families; production shapes (7B+) are config overrides away and shard
with the same rules.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from bayeformers_tpu.models.bert import ModelBundle


@dataclasses.dataclass(frozen=True)
class _LlamaFamily:
    config_cls: str
    lm_cls: str
    base: dict
    tiny: dict


_COMMON_BASE = dict(
    vocab_size=32000, hidden_size=768, intermediate_size=2048,
    num_hidden_layers=12, num_attention_heads=12, num_key_value_heads=4,
    max_position_embeddings=1024, tie_word_embeddings=False,
)
_COMMON_TINY = dict(
    vocab_size=1024, hidden_size=128, intermediate_size=256,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=128, tie_word_embeddings=False,
)

_FAMILIES: dict[str, _LlamaFamily] = {
    "llama": _LlamaFamily(
        "LlamaConfig", "FlaxLlamaForCausalLM",
        base=dict(_COMMON_BASE),
        tiny=dict(_COMMON_TINY),
    ),
    "mistral": _LlamaFamily(
        "MistralConfig", "FlaxMistralForCausalLM",
        # sliding_window = max_position_embeddings: the banded mask never
        # bites at any supported length, so the fused attention interception
        # always applies. NOT None: stock Flax Mistral computes
        # ``jnp.triu(causal_mask, k=-(sliding_window or 0))``, which for
        # None degenerates to a diagonal-only mask (upstream HF bug —
        # verified on transformers 4.57).
        base=dict(_COMMON_BASE, sliding_window=_COMMON_BASE[
            "max_position_embeddings"]),
        tiny=dict(_COMMON_TINY, sliding_window=_COMMON_TINY[
            "max_position_embeddings"]),
    ),
    "gemma": _LlamaFamily(
        "GemmaConfig", "FlaxGemmaForCausalLM",
        # Gemma's decoupled head_dim (here 64 = hidden/num_heads, but the
        # adapter works for any multiple-of-8 head_dim) and its in-module
        # sqrt(hidden) embedding scaling are stock behavior
        base=dict(_COMMON_BASE, head_dim=64),
        tiny=dict(_COMMON_TINY, head_dim=32),
    ),
}


def build_llama_family(
    family: str,
    pretrained: Optional[str] = None,
    size: str = "base",
    seed: int = 0,
    dtype=jnp.float32,
    **config_overrides,
) -> ModelBundle:
    """Flax LLaMA-architecture causal LM as a :class:`ModelBundle`.

    ``apply_fn(params, input_ids, attention_mask=None, position_ids=None)``
    returns next-token logits ``(B, L, V)`` — the same surface as
    models/gpt2.py, so the causal-LM workload (workloads/gpt2_lm.py),
    serving task="causal-lm", and `generation.mc_generate` all apply.
    """
    import transformers

    fam = _FAMILIES[family]
    cls = getattr(transformers, fam.lm_cls)
    if pretrained is not None:
        model = cls.from_pretrained(pretrained, dtype=dtype)
        config = model.config
    else:
        kwargs = dict(fam.base if size == "base" else fam.tiny)
        kwargs.update(config_overrides)
        config = getattr(transformers, fam.config_cls)(**kwargs)
        model = cls(config, seed=seed, dtype=dtype)

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


def build_llama(**kwargs) -> ModelBundle:
    return build_llama_family("llama", **kwargs)


def build_mistral(**kwargs) -> ModelBundle:
    return build_llama_family("mistral", **kwargs)


def build_gemma(**kwargs) -> ModelBundle:
    return build_llama_family("gemma", **kwargs)
