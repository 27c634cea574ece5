"""LLaMA-architecture families (LLaMA / Mistral / Gemma, models/llama.py).

The reference's core claim is that its surgery works on any model built from
registered layers (`bayeformers/__init__.py:50-57`); these tests extend the
proof to the modern decoder class: RMSNorm + rotary + gated MLP +
grouped-query attention. Every projection is a bias-free nn.Dense, so the
default conversion rules cover the family with zero new surgery code; the
fused tier additionally gets a whole-block attention handler
(nn/fused.py::handle_gqa_attention) whose rotary runs through the module's
own rotary_emb submodule, k/v heads repeat after rotary (GQA), and causal
masking happens in-kernel.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bayeformers_tpu as bf
from bayeformers_tpu.models import bert as bert_lib
from bayeformers_tpu.models import llama as llama_lib
from bayeformers_tpu.models.gpt2 import synthetic_lm_batch


def _nonzero_params(params):
    """Random-init HF models have exactly-zero biases nowhere here (all
    Dense are bias-free), but embed tables can carry zeros; MOPED's -inf
    patch gives zero weights sigma~0.69, so nudge zeros for sigma->0 tests."""
    return jax.tree.map(
        lambda a: jnp.where(a == 0, jnp.full_like(a, 0.01), a), params
    )


@pytest.mark.parametrize("family", [
    "llama",
    pytest.param("mistral", marks=pytest.mark.slow),
    pytest.param("gemma", marks=pytest.mark.slow),
])
def test_llama_family_sigma0_parity_all_tiers(family):
    """sigma->0: fused (GQA attention handler), naive (vmapped), and local
    reparameterization tiers must all reproduce the frequentist forward —
    this exercises rotary, GQA head repetition, and causal masking through
    the interception path against stock module code."""
    bundle = llama_lib.build_llama_family(family, size="tiny", seed=0)
    params = _nonzero_params(bundle.params)
    bmodel, bp = bf.to_bayesian(bundle.apply_fn, params, delta=1e-4,
                                freeze=True)
    # 2 layers x (q,k,v,o + gate,up,down) kernels + lm_head; no biases,
    # no embeddings/norms
    assert len(bmodel.spec.paths) == 2 * 7 + 1
    assert all(p.endswith("kernel") for p in bmodel.spec.paths)
    assert not any("embed_tokens" in p or "norm" in p
                   for p in bmodel.spec.paths)

    batch = synthetic_lm_batch(
        np.random.default_rng(0), 2, 16, bundle.config.vocab_size
    )
    ids = batch["input_ids"]
    freq = bundle.apply_fn(params, ids)
    out_f, aux_f = bmodel.mc_apply_fused(bp, jax.random.key(0), 2, ids)
    out_n, _ = bmodel.mc_apply(bp, jax.random.key(0), 2, ids)
    out_l, aux_l = bmodel.mc_apply_lrt(bp, jax.random.key(0), 2, ids)
    np.testing.assert_allclose(np.asarray(out_f[0]), np.asarray(freq),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_n[0]), np.asarray(freq),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_l[0]), np.asarray(freq),
                               rtol=2e-3, atol=2e-3)
    assert np.isfinite(np.asarray(aux_f["log_variational_posterior"])).all()
    assert np.isfinite(float(aux_l["kl"]))


def test_llama_gqa_attention_handler_fires_and_matches():
    """The whole-block GQA handler must actually fire and agree with the
    per-Dense interception it replaces (same eps streams, same KL sums) —
    at a REAL delta, not just the sigma->0 limit."""
    from bayeformers_tpu.nn import fused as fused_lib
    from bayeformers_tpu.ops import attention as ops_attention

    bundle = llama_lib.build_llama(size="tiny", seed=0)
    bmodel, bp = bf.to_bayesian(
        bundle.apply_fn, _nonzero_params(bundle.params), delta=0.05,
        freeze=True,
    )
    batch = synthetic_lm_batch(
        np.random.default_rng(1), 2, 16, bundle.config.vocab_size
    )
    ids = batch["input_ids"]
    key = jax.random.key(2)

    calls = []
    orig = ops_attention.mha

    def counting(*a, **k):
        calls.append(k.get("causal", len(a) > 5 and a[5]))
        return orig(*a, **k)

    ops_attention.mha = fused_lib.ops_attention.mha = counting
    try:
        out_on, aux_on = bmodel.mc_apply_fused(
            bp, key, 2, ids, fuse_attention=True
        )
    finally:
        ops_attention.mha = fused_lib.ops_attention.mha = orig
    assert calls and all(calls), "GQA handler never fired (or non-causal)"
    out_off, aux_off = bmodel.mc_apply_fused(
        bp, key, 2, ids, fuse_attention=False
    )
    np.testing.assert_allclose(np.asarray(out_on), np.asarray(out_off),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(aux_on["log_variational_posterior"]),
        np.asarray(aux_off["log_variational_posterior"]), rtol=1e-5,
    )


def test_mistral_sliding_window_fallback():
    """A sliding window narrower than the sequence would be mis-masked by
    the in-kernel full-causal path: the handler must decline and the stock
    (banded) attention must run instead."""
    from bayeformers_tpu.nn import fused as fused_lib
    from bayeformers_tpu.ops import attention as ops_attention

    bundle = llama_lib.build_mistral(size="tiny", sliding_window=8, seed=0)
    bmodel, bp = bf.to_bayesian(
        bundle.apply_fn, _nonzero_params(bundle.params), delta=1e-4,
        freeze=True,
    )
    ids = synthetic_lm_batch(
        np.random.default_rng(2), 2, 16, bundle.config.vocab_size
    )["input_ids"]

    calls = []
    orig = ops_attention.mha

    def counting(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    ops_attention.mha = fused_lib.ops_attention.mha = counting
    try:
        out, _ = bmodel.mc_apply_fused(bp, jax.random.key(0), 2, ids)
    finally:
        ops_attention.mha = fused_lib.ops_attention.mha = orig
    assert not calls, "handler must fall back when the window bites"
    # sigma->0: the fallback path still reproduces the banded frequentist
    # forward (stock module code with sampled-weight interception on Dense)
    freq = bundle.apply_fn(_nonzero_params(bundle.params), ids)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(freq),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_llama_trains_elbo_and_generates():
    """Real-delta ELBO step: finite loss, nonzero rho grads through both
    attention and the gated MLP; posterior-predictive generation produces
    one coherent draw per sequence (generation.mc_generate)."""
    from bayeformers_tpu import generation

    bundle = llama_lib.build_llama(size="tiny", seed=0)
    bmodel, bp = bf.to_bayesian(
        bundle.apply_fn, _nonzero_params(bundle.params), delta=0.05,
        freeze=True,
    )
    ids = synthetic_lm_batch(
        np.random.default_rng(3), 2, 16, bundle.config.vocab_size
    )["input_ids"]

    def loss_fn(bp):
        out, aux = bmodel.mc_apply_fused(bp, jax.random.key(1), 2, ids)
        from bayeformers_tpu.workloads.gpt2_lm import lm_nll_sum

        nll = lm_nll_sum(bf.elbo.mc_logits_mean(out), ids)
        return bf.elbo.elbo_loss(
            nll, aux["log_prior"], aux["log_variational_posterior"], 10
        )

    loss, grads = jax.value_and_grad(loss_fn)(bp)
    assert np.isfinite(float(loss))
    attn = [v for k, v in grads.rho.items() if "self_attn" in k]
    mlp = [v for k, v in grads.rho.items() if "mlp" in k]
    assert attn and mlp
    assert max(float(jnp.abs(v).max()) for v in attn) > 0
    assert max(float(jnp.abs(v).max()) for v in mlp) > 0

    out = generation.mc_generate(
        bundle.hf_model, bmodel, bp, jax.random.key(4), ids[:, :4],
        n_samples=2, max_new_tokens=3,
    )
    assert out["sequences"].shape == (2, 2, 7)
    assert out["agreement"].shape == (2, 7)


def test_build_model_dispatch_llama_families():
    for name in ("llama-base", "mistral-tiny", "gemma-2b"):
        bundle = bert_lib.build_model(name, size="tiny", seed=0)
        assert bundle.uses_token_type_ids is False
        assert bundle.config.num_key_value_heads < \
            bundle.config.num_attention_heads  # GQA configs by default


def test_llama_tp_rules_and_family_detection():
    """Megatron rules: q/k/v/gate/up column, o/down row, everything else
    replicated; family_tp_fns auto-detects the family and allows fused tp."""
    from jax.sharding import PartitionSpec as P

    from bayeformers_tpu.parallel import mesh as mesh_lib

    bundle = llama_lib.build_llama(size="tiny", seed=0)
    bmodel, bp = bf.to_bayesian(
        bundle.apply_fn, bundle.params, delta=0.05, freeze=True
    )
    spec_fn, kind_fn, fused_ok = mesh_lib.family_tp_fns(bmodel.spec.paths)
    assert fused_ok
    assert spec_fn is mesh_lib.llama_param_spec
    kinds = {p: kind_fn(p) for p in bmodel.spec.paths}
    for p, kind in kinds.items():
        if any(s in p for s in ("q_proj", "k_proj", "v_proj", "gate_proj",
                                "up_proj")):
            assert kind == "col", p
            assert spec_fn(p) == P(None, "tp")
        elif any(s in p for s in ("o_proj", "down_proj")):
            assert kind == "row", p
            assert spec_fn(p) == P("tp", None)
        else:
            assert kind == "rep", p  # lm_head replicates
    # loud coverage check passes for this family
    mesh_lib.assert_tp_coverage(bmodel.spec.paths, spec_fn)
