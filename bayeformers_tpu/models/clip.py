"""CLIP dual-encoder family — extension beyond the reference scope
(a contrastive vision-text paradigm, the third modality surface).

The reference converts text fine-tunes only, but its surgery is
model-agnostic (`bayeformers/__init__.py:50-57`). HF's FlaxCLIPModel is two
transformer towers (text + vision) plus two projection heads; every
projection in both towers (q/k/v/out, MLP fc1/fc2, text/visual projection)
is a plain ``nn.Dense``, so the unchanged default rules convert the whole
dual encoder with zero new conversion code. Out of conversion scope, per
the reference's nn.Linear-only registry (`bayeformers/nn/__init__.py:25`):
the patch-embedding Conv (4-D kernel), token/position embeddings, the CLS
embedding, LayerNorms, and the ``logit_scale`` temperature scalar.

Bayesian CLIP gives posterior-predictive *similarity*: MC draws produce a
distribution over image-text logits, whose spread is the epistemic
uncertainty of the match — the retrieval analogue of the classification
tiers' ``epistemic_std``.

Tiled-estimator note: ``logits_per_image`` couples BOTH batches —
``(B_img, B_txt)`` — so the S-major tiled tiers (fused/flipout/lrt) must be
called with ``untile_axes=(1,)`` to extract the same-sample diagonal blocks
from the ``(S*B_img, S*B_txt)`` similarity matrix (the naive vmap tier
needs nothing special).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from bayeformers_tpu.models.bert import ModelBundle

CLIP_TINY_KWARGS = dict(
    text_config=dict(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=2, vocab_size=128, max_position_embeddings=32,
    ),
    vision_config=dict(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=8,
    ),
    projection_dim=32,
)


def build_clip(
    pretrained: Optional[str] = None,
    size: str = "tiny",
    seed: int = 0,
    dtype=jnp.float32,
    **config_overrides,
) -> ModelBundle:
    """FlaxCLIPModel as a :class:`ModelBundle`.

    ``apply_fn(params, input_ids, pixel_values, attention_mask=None)``
    returns ``logits_per_image (B_img, B_txt)`` — temperature-scaled cosine
    similarities (``logits_per_text`` is its transpose). ``pixel_values``
    is NHWC (module-direct calling convention, as models/vit.py).
    """
    import transformers

    if pretrained is not None:
        model = transformers.FlaxCLIPModel.from_pretrained(
            pretrained, dtype=dtype
        )
        config = model.config
    else:
        if size != "tiny":
            raise ValueError(
                "offline build supports size='tiny'; pass pretrained= for "
                "full-size CLIP"
            )
        kwargs = dict(CLIP_TINY_KWARGS)
        kwargs.update(config_overrides)
        config = transformers.CLIPConfig(**kwargs)
        model = transformers.FlaxCLIPModel(config, seed=seed, dtype=dtype)

    def apply_fn(
        p,
        input_ids,
        pixel_values,
        attention_mask=None,
        deterministic: bool = True,
        rngs: Optional[dict] = None,
        **_ignored,
    ):
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        position_ids = jnp.broadcast_to(
            jnp.arange(input_ids.shape[-1])[None], input_ids.shape
        )
        out = model.module.apply(
            {"params": p}, input_ids, pixel_values, attention_mask,
            position_ids, deterministic=deterministic, return_dict=True,
            rngs=rngs,
        )
        return out.logits_per_image

    return ModelBundle(
        model, apply_fn, model.params, config, uses_token_type_ids=False
    )


def synthetic_clip_batch(
    rng: np.random.Generator, batch: int, seq: int, image_size: int,
    vocab: int, n_classes: int = 4, num_channels: int = 3,
):
    """Paired image/text batch with learnable alignment: class k tints an
    image quadrant AND plants a class-specific token prefix, so matched
    (image, text) pairs are separable from mismatched ones and contrastive
    training above chance is checkable."""
    labels = rng.integers(0, n_classes, batch)
    base = rng.normal(size=(batch, image_size, image_size, num_channels))
    q = image_size // 2
    for k in range(n_classes):
        mask = labels == k
        base[mask, :q, :q, k % num_channels] += 2.0 * (k + 1)
    # deterministic per-class token sequence ("caption"): HF CLIP pools the
    # text tower at the max-id position, so a fully class-determined
    # sequence keeps that position (and the signal) stable per class
    captions = np.stack([
        np.random.default_rng(1000 + k).integers(1, vocab, seq)
        for k in range(n_classes)
    ])
    ids = captions[labels]
    return {
        "pixel_values": jnp.asarray(base.astype(np.float32)),
        "input_ids": jnp.asarray(ids.astype(np.int32)),
        "labels": jnp.asarray(labels),
    }


def clip_contrastive_loss(logits_per_image: jnp.ndarray) -> jnp.ndarray:
    """Symmetric InfoNCE over a paired batch (sum reduction, reference
    NLL-sum convention): matched pairs are the diagonal."""
    import jax

    logits = logits_per_image.astype(jnp.float32)
    n = logits.shape[0]
    targets = jnp.arange(n)
    li = jax.nn.log_softmax(logits, axis=-1)
    lt = jax.nn.log_softmax(logits.T, axis=-1)
    pick = lambda lp: jnp.take_along_axis(
        lp, targets[:, None], axis=-1
    )[:, 0]
    return -0.5 * (jnp.sum(pick(li)) + jnp.sum(pick(lt)))
