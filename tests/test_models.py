"""Model-family adapters: dispatch, input pruning, RoBERTa position ids.

The reference reaches multiple HF families through ``AutoModel*`` and prunes
``token_type_ids`` per family (xlm/roberta/distilbert/camembert,
`examples/bert_squad.py:184-185`). These tests pin the Flax adapters'
family dispatch, the pruning flags, and — for RoBERTa, whose position ids
start at ``pad_token_id + 1`` and skip padding — value parity between our
direct ``module.apply`` path and the HF wrapper that computes position ids
itself.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bayeformers_tpu as bf
from bayeformers_tpu.models import bert as bert_lib


def test_build_model_family_dispatch():
    for name, expect_tt in (
        ("bert-base-uncased", True),
        ("distilbert-base-uncased", False),
        ("roberta-base", False),
        ("camembert-base", False),
    ):
        bundle = bert_lib.build_model(name, size="tiny", seed=0)
        assert bundle.uses_token_type_ids is expect_tt, name
        pruned = bert_lib.prune_inputs(
            bundle, {"input_ids": 0, "attention_mask": 0, "token_type_ids": 0}
        )
        assert ("token_type_ids" in pruned) is expect_tt, name


def test_roberta_position_ids_match_hf_wrapper():
    bundle = bert_lib.build_model("roberta-base", size="tiny", seed=0)
    rng = np.random.default_rng(0)
    pad = bundle.config.pad_token_id
    ids = rng.integers(4, bundle.config.vocab_size, (2, 12))
    ids[0, 9:] = pad  # right-padding: positions must not advance over it
    mask = (ids != pad).astype(np.int32)
    logits_ours = bundle.apply_fn(
        bundle.params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask)
    )
    # HF wrapper computes position ids via create_position_ids_from_input_ids
    logits_hf = bundle.hf_model(
        np.asarray(ids), attention_mask=np.asarray(mask),
        params=bundle.params,
    ).logits
    np.testing.assert_allclose(
        np.asarray(logits_ours), np.asarray(logits_hf), rtol=2e-5, atol=2e-5
    )


@pytest.mark.slow
def test_roberta_converts_and_trains_elbo():
    bundle = bert_lib.build_model("roberta-base", size="tiny", seed=0)
    bmodel, bparams = bf.to_bayesian(
        bundle.apply_fn, bundle.params, delta=0.05, freeze=True
    )
    batch = bert_lib.synthetic_batch(
        np.random.default_rng(0), 4, 12, bundle.config.vocab_size, 2
    )
    labels = batch.pop("labels")
    inputs = bert_lib.prune_inputs(bundle, batch)

    def loss_fn(bparams):
        out, aux = bmodel.mc_apply(bparams, jax.random.key(0), 2, **inputs)
        nll = bf.elbo.cross_entropy_sum(bf.elbo.mc_logits_mean(out), labels)
        return bf.elbo.elbo_loss(
            nll, aux["log_prior"], aux["log_variational_posterior"], 10
        )

    loss, grads = jax.value_and_grad(loss_fn)(bparams)
    assert np.isfinite(float(loss))
    # rho leaves received gradient (mu frozen by the trainable mask, not here)
    flat = jax.tree_util.tree_leaves(grads)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)


def test_roberta_qa_head_shapes():
    bundle = bert_lib.build_model("roberta-base", task="qa", size="tiny", seed=0)
    batch = bert_lib.synthetic_batch(
        np.random.default_rng(0), 2, 12, bundle.config.vocab_size, task="qa"
    )
    start_logits, end_logits = bundle.apply_fn(
        bundle.params, batch["input_ids"], batch["attention_mask"]
    )
    assert start_logits.shape == (2, 12)
    assert end_logits.shape == (2, 12)


def test_electra_and_albert_families_convert_and_train():
    """ELECTRA (embedding projection, BERT-clone attention -> mha fused) and
    ALBERT (cross-layer parameter sharing -> tied-module KL dedup) both
    convert and take an ELBO gradient step."""
    for name in ("electra-base", "albert-base"):
        bundle = bert_lib.build_model(name, size="tiny", seed=0)
        assert bundle.uses_token_type_ids
        bmodel, bparams = bf.to_bayesian(
            bundle.apply_fn, bundle.params, delta=0.05, freeze=True
        )
        batch = bert_lib.synthetic_batch(
            np.random.default_rng(0), 4, 12, bundle.config.vocab_size, 2
        )
        labels = batch.pop("labels")

        def loss_fn(bparams):
            out, aux = bmodel.mc_apply_fused(
                bparams, jax.random.key(0), 2, **batch
            )
            nll = bf.elbo.cross_entropy_sum(bf.elbo.mc_logits_mean(out), labels)
            return bf.elbo.elbo_loss(
                nll, aux["log_prior"], aux["log_variational_posterior"], 10
            )

        loss, grads = jax.value_and_grad(loss_fn)(bparams)
        assert np.isfinite(float(loss)), name
        gmax = max(float(jnp.abs(v).max()) for v in grads.rho.values())
        assert np.isfinite(gmax) and gmax > 0, name

        # ALBERT: the shared layer stack must contribute each parameter's KL
        # exactly once despite repeated invocations (tied-module guard)
        if "albert" in name:
            n_paths = len(bmodel.spec.paths)
            _, aux = bmodel.mc_apply_fused(bparams, jax.random.key(1), 2, **batch)
            assert np.isfinite(np.asarray(aux["log_variational_posterior"])).all()
            assert n_paths == len(set(bmodel.spec.paths))


def test_electra_fused_attention_matches_default_path():
    bundle = bert_lib.build_model("electra-base", size="tiny", seed=0)
    bmodel, bp = bf.to_bayesian(
        bundle.apply_fn, bundle.params, delta=0.05, freeze=True
    )
    batch = bert_lib.synthetic_batch(
        np.random.default_rng(1), 4, 12, bundle.config.vocab_size, 2
    )
    batch.pop("labels")
    key = jax.random.key(3)
    out_on, _ = bmodel.mc_apply_fused(bp, key, 2, fuse_attention=True, **batch)
    out_off, _ = bmodel.mc_apply_fused(bp, key, 2, fuse_attention=False, **batch)
    np.testing.assert_allclose(np.asarray(out_on), np.asarray(out_off),
                               rtol=2e-4, atol=2e-4)


def test_albert_fused_attention_matches_default_path():
    """ALBERT's whole-block attention handler (q/k/v + output dense +
    dropout + LayerNorm inside one module, nn/fused.py) must agree with the
    per-Dense interception it replaces — and must actually fire."""
    from bayeformers_tpu.nn import fused as fused_lib
    from bayeformers_tpu.ops import attention as ops_attention

    bundle = bert_lib.build_model("albert-base", size="tiny", seed=0)
    bmodel, bp = bf.to_bayesian(
        bundle.apply_fn, bundle.params, delta=0.05, freeze=True
    )
    batch = bert_lib.synthetic_batch(
        np.random.default_rng(2), 4, 12, bundle.config.vocab_size, 2
    )
    batch.pop("labels")
    key = jax.random.key(4)

    calls = []
    orig = ops_attention.mha

    def counting(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    ops_attention.mha, fused_lib.ops_attention.mha = counting, counting
    try:
        out_on, aux_on = bmodel.mc_apply_fused(
            bp, key, 2, fuse_attention=True, **batch
        )
    finally:
        ops_attention.mha = fused_lib.ops_attention.mha = orig
    assert calls, "ALBERT attention handler never fired"
    out_off, aux_off = bmodel.mc_apply_fused(
        bp, key, 2, fuse_attention=False, **batch
    )
    np.testing.assert_allclose(np.asarray(out_on), np.asarray(out_off),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(aux_on["log_variational_posterior"]),
        np.asarray(aux_off["log_variational_posterior"]), rtol=1e-5,
    )


@pytest.mark.slow
def test_gpt2_family_converts_and_trains():
    """GPT-2 (decoder family, FlaxConv1D projections with (out, in)
    kernels): the default dense rule converts exactly the c_attn/c_proj/
    c_fc kernels+biases (embeddings and the tied LM head stay
    frequentist), and the fused interception tier routes Conv1D through
    the transposed dense path — verified against the frequentist forward
    in the sigma->0 limit, where every estimator must agree."""
    from bayeformers_tpu.models import gpt2 as gpt2_lib

    bundle = bert_lib.build_model("gpt2", size="tiny", seed=0)
    assert bundle.uses_token_type_ids is False
    n_layer = bundle.config.n_layer
    # A random-init GPT-2 has exactly-zero biases; MOPED patches rho for
    # zero weights to 0.0 (reference layers/linear.py:140-144 parity), i.e.
    # sigma = softplus(0) ~ 0.69 — deliberately NOT small. Give every zero
    # leaf a tiny value so the sigma->0 comparison below is meaningful
    # (the real recipe trains phase A first, so this never arises there).
    params = jax.tree.map(
        lambda a: jnp.where(a == 0, jnp.full_like(a, 0.01), a),
        bundle.params,
    )
    bmodel, bp = bf.to_bayesian(
        bundle.apply_fn, params, delta=1e-4, freeze=True
    )
    # 4 Conv1D modules per block (c_attn, c_proj, c_fc, mlp c_proj), each
    # kernel + bias; nothing else (wte/wpe embeddings, LayerNorms, tied head)
    assert len(bmodel.spec.paths) == n_layer * 4 * 2
    assert all("kernel" in p or "bias" in p for p in bmodel.spec.paths)
    assert not any("wte" in p or "wpe" in p or "ln_" in p
                   for p in bmodel.spec.paths)

    batch = gpt2_lib.synthetic_lm_batch(
        np.random.default_rng(0), 2, 16, bundle.config.vocab_size
    )
    ids = batch["input_ids"]
    freq = bundle.apply_fn(params, ids)

    # sigma -> 0: fused (Conv1D-intercepted) and naive tiers must both
    # reproduce the frequentist logits
    out_f, aux_f = bmodel.mc_apply_fused(bp, jax.random.key(0), 2, ids)
    out_n, aux_n = bmodel.mc_apply(bp, jax.random.key(0), 2, ids)
    np.testing.assert_allclose(np.asarray(out_f[0]), np.asarray(freq),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_n[0]), np.asarray(freq),
                               rtol=2e-3, atol=2e-3)
    assert np.isfinite(np.asarray(aux_f["log_variational_posterior"])).all()

    # a real delta trains: finite loss, nonzero rho grads through Conv1D
    bmodel, bp = bf.to_bayesian(
        bundle.apply_fn, params, delta=0.05, freeze=True
    )

    def loss_fn(bp):
        out, aux = bmodel.mc_apply_fused(bp, jax.random.key(1), 2, ids)
        from bayeformers_tpu.workloads.gpt2_lm import lm_nll_sum

        nll = lm_nll_sum(bf.elbo.mc_logits_mean(out), ids)
        return bf.elbo.elbo_loss(
            nll, aux["log_prior"], aux["log_variational_posterior"], 10
        )

    loss, grads = jax.value_and_grad(loss_fn)(bp)
    assert np.isfinite(float(loss))
    gmax = max(float(jnp.abs(v).max()) for v in grads.rho.values())
    assert np.isfinite(gmax) and gmax > 0


@pytest.mark.slow
def test_t5_family_converts_and_trains():
    """T5 (encoder-decoder, bias-free nn.Dense everywhere): the default
    rules convert exactly the projection kernels (q/k/v/o, wi/wo per block;
    embeddings, relative_attention_bias tables and RMSNorm scales stay
    frequentist), and both tiers reproduce the frequentist forward in the
    sigma->0 limit."""
    from bayeformers_tpu.models import t5 as t5_lib

    bundle = t5_lib.build_t5(size="tiny", seed=0)
    batch = t5_lib.synthetic_seq2seq_batch(
        np.random.default_rng(0), 2, 12, 8, bundle.config.vocab_size
    )
    bmodel, bp = bf.to_bayesian(
        bundle.apply_fn, bundle.params, delta=1e-4, freeze=True
    )
    # encoder 2 blocks x (q,k,v,o + wi,wo) + decoder 2 blocks x
    # (self q,k,v,o + cross q,k,v,o + wi,wo); all kernels, no biases
    assert all(p.endswith("kernel") for p in bmodel.spec.paths)
    assert len(bmodel.spec.paths) == 2 * 6 + 2 * 10
    assert not any("relative_attention_bias" in p or "shared" in p
                   or "layer_norm" in p for p in bmodel.spec.paths)

    freq = bundle.apply_fn(bundle.params, **batch)
    out_f, aux_f = bmodel.mc_apply_fused(bp, jax.random.key(0), 2, **batch)
    out_n, _ = bmodel.mc_apply(bp, jax.random.key(0), 2, **batch)
    np.testing.assert_allclose(np.asarray(out_f[0]), np.asarray(freq),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_n[0]), np.asarray(freq),
                               rtol=2e-3, atol=2e-3)
    assert np.isfinite(np.asarray(aux_f["log_variational_posterior"])).all()

    # a real delta trains: finite ELBO loss, nonzero rho grads through both
    # the encoder and the decoder's cross-attention
    bmodel, bp = bf.to_bayesian(
        bundle.apply_fn, bundle.params, delta=0.05, freeze=True
    )
    labels = batch["labels"]

    def loss_fn(bp):
        out, aux = bmodel.mc_apply_fused(bp, jax.random.key(1), 2, **batch)
        lp = jax.nn.log_softmax(
            bf.elbo.mc_logits_mean(out).astype(jnp.float32), -1
        )
        nll = -jnp.sum(jnp.take_along_axis(lp, labels[..., None], axis=-1))
        return bf.elbo.elbo_loss(
            nll, aux["log_prior"], aux["log_variational_posterior"], 10
        )

    loss, grads = jax.value_and_grad(loss_fn)(bp)
    assert np.isfinite(float(loss))
    enc = [v for k, v in grads.rho.items() if k.startswith("encoder")]
    cross = [v for k, v in grads.rho.items() if "EncDecAttention" in k]
    assert enc and cross
    assert max(float(jnp.abs(v).max()) for v in enc) > 0
    assert max(float(jnp.abs(v).max()) for v in cross) > 0
