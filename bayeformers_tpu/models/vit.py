"""ViT image-classification family — extension beyond the reference scope
(a second input modality).

The reference demonstrates text fine-tunes only, but its surgery is
model-agnostic (`bayeformers/__init__.py:50-57`: any module tree built from
registered layers converts). This adapter proves the claim across a modality
boundary: HF's FlaxViTForImageClassification is a BERT-shaped encoder over
patch embeddings — every projection (q/k/v, attention output, MLP
intermediate/output, classifier) is a plain ``nn.Dense``, so the unchanged
default rules convert it, and the fused interception tier covers it end to
end. ViT's ``FlaxViTSelfAttention`` is mask-free (images have no padding);
the shared encoder attention handler (nn/fused.py) runs it with a zero bias.
The patch-projection Conv and position embeddings stay frequentist, matching
the reference's nn.Linear-only conversion scope
(`bayeformers/nn/__init__.py:25`).

Sequence length is ``(image_size/patch_size)^2 + 1`` (CLS token) — 197 for
ViT-base/16 at 224px, which is NOT 8-aligned: the Pallas mha kernel requires
8-aligned L and falls back to the XLA attention for such shapes
(ops/attention.py::pallas_fits), so correctness never depends on alignment.

Tensor parallelism: the BERT Megatron rules extend to ViT's
``attention/attention/(query|key|value)`` paths (parallel/mesh.py);
attention-output and MLP paths already match the shared encoder rules.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from bayeformers_tpu.models.bert import ModelBundle

VIT_BASE_KWARGS = dict(
    hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
    intermediate_size=3072, image_size=224, patch_size=16, num_channels=3,
)
# tiny: 16 patches + CLS = 17 positions, head_dim 64
VIT_TINY_KWARGS = dict(
    hidden_size=128, num_hidden_layers=2, num_attention_heads=2,
    intermediate_size=256, image_size=32, patch_size=8, num_channels=3,
)


def build_vit(
    task: str = "classification",
    n_labels: int = 2,
    pretrained: Optional[str] = None,
    size: str = "base",
    seed: int = 0,
    dtype=jnp.float32,
    **config_overrides,
) -> ModelBundle:
    """Flax ViT image classifier as a :class:`ModelBundle`.

    ``apply_fn(params, pixel_values, deterministic=True, rngs=None)``
    returns class logits ``(B, n_labels)``; ``pixel_values`` is NHWC
    ``(B, image_size, image_size, num_channels)`` (what ``module.apply``
    consumes — the HF *wrapper* takes NCHW and transposes; calling the
    module directly skips that copy). Both MC tiers consume it unchanged:
    sample tiling broadcasts the leading batch axis like any other input.
    """
    import transformers

    if task != "classification":
        raise ValueError(f"vit supports task='classification'; got {task!r}")
    if pretrained is not None:
        model = transformers.FlaxViTForImageClassification.from_pretrained(
            pretrained, num_labels=n_labels, dtype=dtype
        )
        config = model.config
    else:
        kwargs = dict(VIT_BASE_KWARGS if size == "base" else VIT_TINY_KWARGS)
        kwargs.update(config_overrides)
        config = transformers.ViTConfig(num_labels=n_labels, **kwargs)
        model = transformers.FlaxViTForImageClassification(
            config, seed=seed, dtype=dtype
        )

    def apply_fn(
        p,
        pixel_values,
        deterministic: bool = True,
        rngs: Optional[dict] = None,
        **_ignored,
    ):
        return model.module.apply(
            {"params": p}, pixel_values,
            deterministic=deterministic, return_dict=False, rngs=rngs,
        )[0]

    return ModelBundle(
        model, apply_fn, model.params, config, uses_token_type_ids=False
    )


def synthetic_image_batch(
    rng: np.random.Generator, batch: int, image_size: int,
    n_labels: int = 2, num_channels: int = 3,
):
    """Separable synthetic images: class k tints a fixed random channel/
    quadrant pattern, so a converted model's accuracy is checkable above
    chance (same spirit as utils/data.py's synthetic tasks)."""
    labels = rng.integers(0, n_labels, batch)
    base = rng.normal(size=(batch, image_size, image_size, num_channels))
    # class-dependent mean shift on one quadrant: linearly separable signal
    q = image_size // 2
    signal = np.zeros_like(base)
    for k in range(n_labels):
        mask = labels == k
        signal[mask, :q, :q, k % num_channels] = 2.0 * (k + 1)
    return {
        "pixel_values": jnp.asarray(
            (base + signal).astype(np.float32)
        ),
        "labels": jnp.asarray(labels),
    }
