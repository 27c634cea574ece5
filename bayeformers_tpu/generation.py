"""Bayesian autoregressive generation — posterior-predictive decoding.

Extension beyond the reference scope (yliess86/BayeFormers demonstrates
encoder fine-tunes only): with a decoder family converted
(`models/gpt2.py`), generation from the posterior predictive means drawing
a *function* (one concrete weight set per draw, `BayesianModel.sample`) and
decoding the whole sequence under it — NOT re-sampling weights per token,
which would decode under a nonexistent "average" model and wash out
epistemic structure (each draw is a coherent hypothesis about the language).

TPU mapping: a weight draw materializes one concrete param tree, so decoding
rides the stock HF Flax KV-cache ``generate`` loop (``lax.while_loop`` with
static shapes) at full native speed; the whole draw+decode is jitted ONCE
and dispatched S times with different keys. The fused/interception tier is
deliberately not used here — decode steps are matvec-bound (no S*B
super-batch to amortize into the MXU) and per-sequence draw coherence wants
materialized weights anyway.

Disagreement between the S decoded sequences is the epistemic signal; the
returned ``agreement`` is the per-position fraction of draws that voted for
the majority token (1.0 everywhere = the posterior is certain of the whole
continuation).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bayeformers_tpu.nn.surgery import BayesianModel, BayesParams


def _majority_and_agreement(seqs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(S, B, T) int sequences -> per-position majority token (B, T) and the
    fraction of draws agreeing with it (B, T). Host-side numpy: S is small
    and this is presentation, not compute."""
    S = seqs.shape[0]
    maj = np.empty(seqs.shape[1:], seqs.dtype)
    agree = np.empty(seqs.shape[1:], np.float32)
    for b in range(seqs.shape[1]):
        for t in range(seqs.shape[2]):
            vals, counts = np.unique(seqs[:, b, t], return_counts=True)
            i = int(np.argmax(counts))
            maj[b, t] = vals[i]
            agree[b, t] = counts[i] / S
    return maj, agree


def mc_generate(
    model: Any,
    bmodel: BayesianModel,
    bparams: BayesParams,
    key: jax.Array,
    input_ids,
    attention_mask=None,
    n_samples: int = 10,
    max_new_tokens: int = 20,
    do_sample: bool = False,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    pad_token_id: Optional[int] = None,
) -> dict:
    """Decode ``n_samples`` posterior-predictive continuations.

    ``model`` is the HF Flax pretrained wrapper (``ModelBundle.model`` — it
    owns ``init_cache``/``generate``); ``bmodel``/``bparams`` the converted
    pair from :func:`bayeformers_tpu.to_bayesian` over the same weights.

    ``do_sample=False``: greedy per draw — sequence diversity then comes
    ONLY from weight uncertainty (pure epistemic signal). ``do_sample=True``
    adds token-level (aleatoric) sampling on top, with per-draw decode keys.

    Returns host numpy: ``sequences`` (S, B, L0+max_new_tokens) including
    the prompt, ``majority`` (B, T), ``agreement`` (B, T) — the fraction of
    draws voting for the majority token (prompt positions are trivially 1.0).
    """
    input_ids = jnp.asarray(input_ids)
    if attention_mask is None:
        attention_mask = jnp.ones_like(input_ids)
    attention_mask = jnp.asarray(attention_mask)
    if pad_token_id is None:
        cfg = model.config
        pad_token_id = (
            getattr(cfg, "pad_token_id", None)
            or getattr(cfg, "eos_token_id", None)
            or 0
        )
    max_length = input_ids.shape[1] + max_new_tokens

    def draw_and_decode(k: jax.Array):
        kw, kd = jax.random.split(k)
        params, _, _ = bmodel.sample(bparams, kw)
        out = model.generate(
            input_ids,
            attention_mask=attention_mask,
            params=params,
            prng_key=kd,
            max_length=max_length,
            do_sample=do_sample,
            temperature=temperature,
            top_k=top_k,
            pad_token_id=pad_token_id,
        )
        return out.sequences

    # one compile, S dispatches (vmapping over draws would stack S full
    # param trees in HBM; a GPT-2-base posterior at S=10 is ~5 GB)
    decode = jax.jit(draw_and_decode)
    keys = jax.random.split(key, n_samples)
    seqs = np.stack([np.asarray(decode(k)) for k in keys])
    majority, agreement = _majority_and_agreement(seqs)
    return {
        "sequences": seqs,
        "majority": majority,
        "agreement": agreement,
        "prompt_len": int(input_ids.shape[1]),
    }
