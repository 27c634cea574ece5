"""Whisper speech-to-text family (models/whisper.py): conversion scope,
tier parity, and a teacher-forced mini recipe on synthetic audio."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import bayeformers_tpu as bf
from bayeformers_tpu.models import whisper as whisper_lib
from bayeformers_tpu.utils.optim import masked_optimizer


@pytest.fixture(scope="module")
def bundle():
    return whisper_lib.build_whisper(seed=0)


def _nll(logits, dec_ids):
    """Teacher-forced next-token CE (sum): position t predicts t+1."""
    lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = dec_ids[:, 1:]
    return -jnp.sum(jnp.take_along_axis(lp, tgt[..., None], axis=-1))


@pytest.mark.slow
def test_whisper_conversion_scope_and_sigma0_parity(bundle):
    """Every Dense projection in both towers converts (incl. the bias-free
    k_proj); the conv stems, embeddings, and LayerNorms stay frequentist.
    sigma->0: naive and fused (generic per-Dense interception) tiers
    reproduce the frequentist decoder logits."""
    params = jax.tree.map(
        lambda a: jnp.where(a == 0, jnp.full_like(a, 0.01), a),
        bundle.params,
    )
    bmodel, bp = bf.to_bayesian(bundle.apply_fn, params, delta=1e-4,
                                freeze=True)
    paths = bmodel.spec.paths
    # encoder: 2 layers x (q/k/v/out + fc1/fc2); decoder adds cross-attn:
    # 2 layers x (2 x (q/k/v/out) + fc1/fc2). k_proj has no bias.
    enc = 2 * (4 * 2 - 1 + 2 * 2)
    dec = 2 * (2 * (4 * 2 - 1) + 2 * 2)
    assert len(paths) == enc + dec
    assert not any(
        "conv1" in p or "conv2" in p or "embed_" in p or "layer_norm" in p
        for p in paths
    )
    assert any(p.endswith("k_proj/kernel") for p in paths)
    assert not any(p.endswith("k_proj/bias") for p in paths)

    batch = whisper_lib.synthetic_speech_batch(
        np.random.default_rng(0), 4, bundle.config
    )
    feats, dec_ids = batch["input_features"], batch["decoder_input_ids"]
    freq = bundle.apply_fn(params, feats, dec_ids)
    assert freq.shape == (4, bundle.config.max_target_positions,
                          bundle.config.vocab_size)
    out_n, _ = bmodel.mc_apply(
        bp, jax.random.key(0), 2,
        input_features=feats, decoder_input_ids=dec_ids,
    )
    out_f, aux_f = bmodel.mc_apply_fused(
        bp, jax.random.key(0), 2,
        input_features=feats, decoder_input_ids=dec_ids,
    )
    for out in (out_n, out_f):
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(freq),
                                   rtol=2e-3, atol=2e-3)
    assert np.isfinite(np.asarray(aux_f["log_variational_posterior"])).all()


@pytest.mark.slow
def test_whisper_mini_recipe(bundle):
    """Frequentist teacher-forced training learns the deterministic
    audio->transcript mapping above chance; MOPED preserves it; an ELBO
    step reduces the loss."""
    params = bundle.params
    batch = whisper_lib.synthetic_speech_batch(
        np.random.default_rng(1), 8, bundle.config
    )
    feats, dec_ids = batch["input_features"], batch["decoder_input_ids"]

    tx = optax.adam(2e-3)
    opt = tx.init(params)

    @jax.jit
    def fstep(p, opt):
        l, g = jax.value_and_grad(
            lambda p: _nll(bundle.apply_fn(p, feats, dec_ids), dec_ids)
        )(p)
        u, opt = tx.update(g, opt, p)
        return optax.apply_updates(p, u), opt, l

    for _ in range(120):
        params, opt, l = fstep(params, opt)
    logits = bundle.apply_fn(params, feats, dec_ids)
    acc = float(jnp.mean(
        (jnp.argmax(logits[:, :-1], -1) == dec_ids[:, 1:]).astype(jnp.float32)
    ))
    assert acc > 0.5  # chance ~= 1/vocab

    bmodel, bp = bf.to_bayesian(bundle.apply_fn, params, delta=0.05,
                                freeze=True)
    out, aux = bmodel.mc_apply(
        bp, jax.random.key(2), 4,
        input_features=feats, decoder_input_ids=dec_ids,
    )
    mean_logits = jnp.mean(out, axis=0)
    macc = float(jnp.mean(
        (jnp.argmax(mean_logits[:, :-1], -1) == dec_ids[:, 1:]).astype(
            jnp.float32)
    ))
    assert abs(macc - acc) < 0.2

    btx = masked_optimizer(optax.adam(1e-4), bmodel.trainable_mask(bp))
    bopt = btx.init(bp)

    @jax.jit
    def bstep(bp, bopt, key):
        def loss(bp):
            out, aux = bmodel.mc_apply(
                bp, key, 2, input_features=feats, decoder_input_ids=dec_ids
            )
            nll = _nll(jnp.mean(out, axis=0), dec_ids)
            return bf.elbo.elbo_loss(
                nll, aux["log_prior"], aux["log_variational_posterior"], 10
            )

        l, g = jax.value_and_grad(loss)(bp)
        u, bopt = btx.update(g, bopt, bp)
        return optax.apply_updates(bp, u), bopt, l

    losses = []
    for i in range(6):
        bp, bopt, l = bstep(bp, bopt, jax.random.key(i))
        losses.append(float(l))
    assert losses[-1] < losses[0]
