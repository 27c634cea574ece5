"""ViT image-classification family (models/vit.py) — modality extension.

The reference converts text models only; these tests prove the surgery and
every MC tier across the modality boundary: a BERT-shaped encoder over patch
embeddings, mask-free attention, NHWC pixel inputs.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import optax

import bayeformers_tpu as bf
from bayeformers_tpu.models import bert as bert_lib
from bayeformers_tpu.models import vit as vit_lib
from bayeformers_tpu.utils.optim import masked_optimizer


def test_vit_converts_sigma0_parity_all_tiers():
    """Conversion scope: every Dense kernel+bias (q/k/v, attn output, MLP,
    classifier) converts; Conv patch projection, position embeddings, CLS
    token and LayerNorms stay frequentist. sigma->0: fused (mask-free
    attention handler), naive, and local tiers reproduce the frequentist
    logits."""
    bundle = vit_lib.build_vit(size="tiny", n_labels=2, seed=0)
    params = jax.tree.map(
        lambda a: jnp.where(a == 0, jnp.full_like(a, 0.01), a), bundle.params
    )
    bmodel, bp = bf.to_bayesian(bundle.apply_fn, params, delta=1e-4,
                                freeze=True)
    # 2 layers x (q,k,v + attn-out + intermediate + out) x (kernel+bias)
    # + classifier kernel+bias
    assert len(bmodel.spec.paths) == 2 * 6 * 2 + 2
    assert not any("patch_embeddings" in p or "position_embeddings" in p
                   or "cls_token" in p or "layernorm" in p.lower()
                   for p in bmodel.spec.paths)

    batch = vit_lib.synthetic_image_batch(np.random.default_rng(0), 4, 32)
    px = batch["pixel_values"]
    freq = bundle.apply_fn(params, px)
    assert freq.shape == (4, 2)
    out_f, aux_f = bmodel.mc_apply_fused(bp, jax.random.key(0), 2, px)
    out_n, _ = bmodel.mc_apply(bp, jax.random.key(0), 2, px)
    out_l, _ = bmodel.mc_apply_lrt(bp, jax.random.key(0), 2, px)
    for out in (out_f, out_n, out_l):
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(freq),
                                   rtol=2e-3, atol=2e-3)
    assert np.isfinite(np.asarray(aux_f["log_variational_posterior"])).all()


def test_vit_attention_handler_fires_and_matches():
    """The shared encoder attention handler must fire for the mask-free ViT
    attention (bias=0 path) and agree with the per-Dense interception."""
    from bayeformers_tpu.nn import fused as fused_lib
    from bayeformers_tpu.ops import attention as ops_attention

    bundle = vit_lib.build_vit(size="tiny", n_labels=2, seed=0)
    bmodel, bp = bf.to_bayesian(
        bundle.apply_fn, bundle.params, delta=0.05, freeze=True
    )
    px = vit_lib.synthetic_image_batch(
        np.random.default_rng(1), 4, 32
    )["pixel_values"]
    key = jax.random.key(2)

    calls = []
    orig = ops_attention.mha

    def counting(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    ops_attention.mha = fused_lib.ops_attention.mha = counting
    try:
        out_on, aux_on = bmodel.mc_apply_fused(
            bp, key, 2, px, fuse_attention=True
        )
    finally:
        ops_attention.mha = fused_lib.ops_attention.mha = orig
    assert calls, "ViT attention handler never fired"
    out_off, aux_off = bmodel.mc_apply_fused(
        bp, key, 2, px, fuse_attention=False
    )
    np.testing.assert_allclose(np.asarray(out_on), np.asarray(out_off),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(aux_on["log_variational_posterior"]),
        np.asarray(aux_off["log_variational_posterior"]), rtol=1e-5,
    )


@pytest.mark.slow
def test_vit_four_phase_recipe():
    """Mini 4-phase recipe on separable synthetic images: frequentist train
    beats chance, MOPED conversion preserves accuracy, ELBO train keeps the
    loss finite and frozen mu bit-identical."""
    bundle = vit_lib.build_vit(size="tiny", n_labels=2, seed=0)
    train = vit_lib.synthetic_image_batch(np.random.default_rng(0), 32, 32)
    X, y = train["pixel_values"], train["labels"]
    params = bundle.params
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def fstep(p, opt):
        def loss(p):
            return bf.elbo.cross_entropy_sum(bundle.apply_fn(p, X), y)

        l, g = jax.value_and_grad(loss)(p)
        u, opt = tx.update(g, opt, p)
        return optax.apply_updates(p, u), opt, l

    for _ in range(60):
        params, opt, l = fstep(params, opt)
    acc_freq = float(jnp.mean(jnp.argmax(bundle.apply_fn(params, X), -1) == y))
    assert acc_freq > 0.8, acc_freq

    bmodel, bp = bf.to_bayesian(bundle.apply_fn, params, delta=0.05,
                                freeze=True)
    out, aux = bmodel.mc_apply(bp, jax.random.key(1), 4, X)
    acc, acc_std = bf.elbo.accuracy_and_std(out, y)
    assert abs(float(acc) - acc_freq) < 0.15

    btx = masked_optimizer(optax.adam(1e-3), bmodel.trainable_mask(bp))
    bopt = btx.init(bp)
    mu_before = np.asarray(
        bp.params["classifier"]["kernel"]
    ).copy()

    @jax.jit
    def bstep(bp, bopt, key):
        def loss(bp):
            out, aux = bmodel.mc_apply_fused(bp, key, 2, X)
            nll = bf.elbo.cross_entropy_sum(bf.elbo.mc_logits_mean(out), y)
            return bf.elbo.elbo_loss(nll, aux["log_prior"],
                                     aux["log_variational_posterior"], 1)

        l, g = jax.value_and_grad(loss)(bp)
        u, bopt = btx.update(g, bopt, bp)
        return optax.apply_updates(bp, u), bopt, l

    for i in range(5):
        bp, bopt, l = bstep(bp, bopt, jax.random.fold_in(jax.random.key(2), i))
        assert np.isfinite(float(l))
    assert np.array_equal(mu_before,
                          np.asarray(bp.params["classifier"]["kernel"]))


def test_vit_tp_rules_cover_and_dispatch():
    """The shared encoder Megatron rules extend to ViT's nested
    attention/attention paths; build_model dispatches by name."""
    from jax.sharding import PartitionSpec as P

    from bayeformers_tpu.parallel import mesh as mesh_lib

    bundle = bert_lib.build_model("vit-base-patch16-224", size="tiny",
                                  n_labels=2, seed=0)
    assert bundle.uses_token_type_ids is False
    bmodel, _ = bf.to_bayesian(
        bundle.apply_fn, bundle.params, delta=0.05, freeze=True
    )
    spec_fn = mesh_lib.family_tp_fns(bmodel.spec.paths)[0]
    assert spec_fn is mesh_lib.tp_param_spec
    for p in bmodel.spec.paths:
        if "attention/attention" in p and p.endswith("kernel"):
            assert spec_fn(p) == P(None, "tp"), p
        if "attention/output/dense/kernel" in p:
            assert spec_fn(p) == P("tp", None), p
    mesh_lib.assert_tp_coverage(bmodel.spec.paths, spec_fn)
