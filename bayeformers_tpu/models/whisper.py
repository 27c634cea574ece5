"""Whisper speech-to-text family — extension beyond the reference scope
(a fourth input modality: audio).

HF's FlaxWhisperForConditionalGeneration is a conv-downsampled audio
encoder + text decoder with cross-attention; every attention projection
(q/k/v/out, self and cross, both towers) and MLP fc1/fc2 is a plain
``nn.Dense`` (k_proj is bias-free — the optional-bias path), so the
unchanged default rules convert the whole seq2seq stack. Out of scope per
the reference's nn.Linear-only registry: the two mel-spectrogram Conv1d
stems (3-D kernels), positional/token embeddings, LayerNorms.

No Whisper attention interception exists — the fused tier covers the model
through the generic per-Dense interception (every projection still rides
the Pallas sampled-matmul; only the whole-block attention fusion is
BERT/GPT-2/LLaMA-specific).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from bayeformers_tpu.models.bert import ModelBundle

WHISPER_TINY_KWARGS = dict(
    vocab_size=128, num_mel_bins=16, d_model=64,
    encoder_layers=2, encoder_attention_heads=2, encoder_ffn_dim=128,
    decoder_layers=2, decoder_attention_heads=2, decoder_ffn_dim=128,
    max_source_positions=24, max_target_positions=16,
)


def build_whisper(
    pretrained: Optional[str] = None,
    size: str = "tiny",
    seed: int = 0,
    dtype=jnp.float32,
    **config_overrides,
) -> ModelBundle:
    """FlaxWhisperForConditionalGeneration as a :class:`ModelBundle`.

    ``apply_fn(params, input_features, decoder_input_ids)`` returns decoder
    logits ``(B, T_dec, vocab)``. ``input_features`` is
    ``(B, num_mel_bins, 2 * max_source_positions)`` (the conv stem
    stride-2-downsamples time to the encoder's position budget).
    """
    import transformers

    if pretrained is not None:
        model = transformers.FlaxWhisperForConditionalGeneration.from_pretrained(
            pretrained, dtype=dtype
        )
        config = model.config
    else:
        if size != "tiny":
            raise ValueError(
                "offline build supports size='tiny'; pass pretrained= for "
                "full-size Whisper"
            )
        kwargs = dict(WHISPER_TINY_KWARGS)
        kwargs.update(config_overrides)
        config = transformers.WhisperConfig(**kwargs)
        model = transformers.FlaxWhisperForConditionalGeneration(
            config, seed=seed, dtype=dtype
        )

    def apply_fn(
        p,
        input_features,
        decoder_input_ids,
        deterministic: bool = True,
        rngs: Optional[dict] = None,
        **_ignored,
    ):
        # module-direct calling convention: the HF wrapper synthesizes
        # these; the raw module requires them
        decoder_position_ids = jnp.broadcast_to(
            jnp.arange(decoder_input_ids.shape[-1])[None],
            decoder_input_ids.shape,
        )
        return model.module.apply(
            {"params": p}, input_features, decoder_input_ids,
            decoder_attention_mask=jnp.ones_like(decoder_input_ids),
            decoder_position_ids=decoder_position_ids,
            deterministic=deterministic, return_dict=True, rngs=rngs,
        ).logits

    return ModelBundle(
        model, apply_fn, model.params, config, uses_token_type_ids=False
    )


def synthetic_speech_batch(
    rng: np.random.Generator, batch: int, config, n_classes: int = 4,
):
    """Paired (audio features, transcript) batch with a deterministic
    class -> transcript mapping: class k plays a fixed random mel pattern
    (plus noise) and its transcript is a fixed token sequence, so
    teacher-forced next-token accuracy has a checkable ceiling of 1."""
    t_src = 2 * config.max_source_positions
    t_dec = config.max_target_positions
    labels = rng.integers(0, n_classes, batch)
    mel = rng.normal(size=(batch, config.num_mel_bins, t_src)) * 0.3
    patterns = np.stack([
        np.random.default_rng(500 + k).normal(
            size=(config.num_mel_bins, t_src)
        )
        for k in range(n_classes)
    ])
    mel += patterns[labels]
    scripts = np.stack([
        np.random.default_rng(900 + k).integers(2, config.vocab_size, t_dec)
        for k in range(n_classes)
    ])
    dec = scripts[labels]
    dec[:, 0] = 1  # BOS-like fixed start token
    return {
        "input_features": jnp.asarray(mel.astype(np.float32)),
        "decoder_input_ids": jnp.asarray(dec.astype(np.int32)),
        "labels": jnp.asarray(labels),
    }
