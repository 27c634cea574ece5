"""CLIP dual-encoder family (models/clip.py): conversion scope, tier
parity, contrastive 4-phase recipe, posterior-similarity uncertainty."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import bayeformers_tpu as bf
from bayeformers_tpu.models import clip as clip_lib
from bayeformers_tpu.utils.optim import masked_optimizer


@pytest.fixture(scope="module")
def bundle():
    return clip_lib.build_clip(seed=0)


def _batch(bundle, n=4, seed=0):
    return clip_lib.synthetic_clip_batch(
        np.random.default_rng(seed), n, 8, 32,
        bundle.config.text_config.vocab_size,
    )


@pytest.mark.slow
def test_clip_conversion_scope_and_sigma0_parity(bundle):
    """Both towers' Dense projections convert; the patch-embedding Conv,
    token/position/class embeddings, LayerNorms, and logit_scale stay
    frequentist. sigma->0: naive and fused tiers reproduce the frequentist
    similarity logits."""
    params = jax.tree.map(
        lambda a: jnp.where(a == 0, jnp.full_like(a, 0.01), a),
        bundle.params,
    )
    # delta tighter than the encoder families' 1e-4: the cosine
    # normalization + temperature (~14x) in logits_per_image amplifies
    # weight jitter more than raw logits do
    bmodel, bp = bf.to_bayesian(bundle.apply_fn, params, delta=1e-5,
                                freeze=True)
    paths = bmodel.spec.paths
    # 2 towers x 2 layers x (q/k/v/out + fc1/fc2) x (kernel+bias)
    # + text_projection + visual_projection kernels (bias-free)
    assert len(paths) == 2 * 2 * 6 * 2 + 2
    assert any(p.startswith("text_model/") for p in paths)
    assert any(p.startswith("vision_model/") for p in paths)
    assert not any(
        "patch_embedding" in p or "logit_scale" in p or "layer_norm" in p
        or "embeddings/" in p for p in paths
    )

    batch = _batch(bundle)
    freq = bundle.apply_fn(params, batch["input_ids"],
                           batch["pixel_values"])
    out_n, _ = bmodel.mc_apply(
        bp, jax.random.key(0), 2,
        input_ids=batch["input_ids"], pixel_values=batch["pixel_values"],
    )
    out_f, aux_f = bmodel.mc_apply_fused(
        bp, jax.random.key(0), 2, untile_axes=(1,),
        input_ids=batch["input_ids"], pixel_values=batch["pixel_values"],
    )
    assert out_f.shape == (2,) + freq.shape
    for out in (out_n, out_f):
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(freq),
                                   rtol=2e-3, atol=2e-3)
    assert np.isfinite(np.asarray(aux_f["log_variational_posterior"])).all()


@pytest.mark.slow
def test_clip_contrastive_four_phase(bundle):
    """Mini 4-phase recipe on the paired synthetic task: frequentist
    contrastive training beats chance on diagonal retrieval, MOPED
    preserves it, the Bayesian similarity carries epistemic spread, and an
    ELBO step reduces the loss."""
    params = bundle.params
    batch = _batch(bundle, n=8, seed=1)
    ids, px = batch["input_ids"], batch["pixel_values"]

    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def fstep(p, opt):
        def loss(p):
            return clip_lib.clip_contrastive_loss(bundle.apply_fn(p, ids, px))

        l, g = jax.value_and_grad(loss)(p)
        u, opt = tx.update(g, opt, p)
        return optax.apply_updates(p, u), opt, l

    for _ in range(150):
        params, opt, l = fstep(params, opt)
    logits = bundle.apply_fn(params, ids, px)
    # paired-batch retrieval: same-class rows are interchangeable, so score
    # against the class of the retrieved column, not the exact index
    row_class = np.asarray(batch["labels"])
    acc = float(np.mean(row_class[np.asarray(jnp.argmax(logits, -1))]
                        == row_class))
    assert acc > 0.5  # chance ~= 1/n_classes

    bmodel, bp = bf.to_bayesian(bundle.apply_fn, params, delta=0.05,
                                freeze=True)
    out, aux = bmodel.mc_apply(bp, jax.random.key(3), 4, input_ids=ids,
                               pixel_values=px)
    mean_logits = jnp.mean(out, axis=0)
    macc = float(np.mean(
        row_class[np.asarray(jnp.argmax(mean_logits, -1))] == row_class
    ))
    assert abs(macc - acc) < 0.3
    # posterior similarity spread: MC draws disagree (epistemic signal)
    assert float(jnp.std(out, axis=0).mean()) > 0

    btx = masked_optimizer(optax.adam(1e-3), bmodel.trainable_mask(bp))
    bopt = btx.init(bp)

    def elbo_of(bp, key):
        out, aux = bmodel.mc_apply(bp, key, 2, input_ids=ids,
                                   pixel_values=px)
        nll = clip_lib.clip_contrastive_loss(jnp.mean(out, axis=0))
        return bf.elbo.elbo_loss(
            nll, aux["log_prior"], aux["log_variational_posterior"], 10
        )

    @jax.jit
    def bstep(bp, bopt, key):
        l, g = jax.value_and_grad(elbo_of)(bp, key)
        u, bopt = btx.update(g, bopt, bp)
        return optax.apply_updates(bp, u), bopt, l

    # fixed-key eval removes MC noise from the improvement check (the KL
    # term dominates this loss; per-step draws would swamp a 6-step delta)
    eval_key = jax.random.key(99)
    before = float(jax.jit(elbo_of)(bp, eval_key))
    for i in range(6):
        bp, bopt, _ = bstep(bp, bopt, jax.random.key(i))
    after = float(jax.jit(elbo_of)(bp, eval_key))
    assert after < before
