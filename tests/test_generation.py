"""Posterior-predictive generation (generation.py) — decoder-family
extension. The reference has no generation surface; these tests pin the
semantics that make Bayesian decoding meaningful: one coherent weight draw
per sequence, sigma->0 collapse to the frequentist greedy decode, and
epistemic diversity appearing as cross-draw disagreement."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bayeformers_tpu as bf
from bayeformers_tpu.generation import mc_generate
from bayeformers_tpu.models import gpt2 as gpt2_lib


@pytest.fixture(scope="module")
def tiny_gpt2():
    bundle = gpt2_lib.build_gpt2(size="tiny", seed=0)
    # random-init GPT-2 has exactly-zero biases; MOPED patches rho at zero
    # weights to sigma=softplus(0)~0.69 (deliberately large) — nudge them so
    # small-delta sigmas really are small (see test_models.py rationale)
    params = jax.tree.map(
        lambda a: jnp.where(a == 0, jnp.full_like(a, 0.01), a),
        bundle.params,
    )
    return bundle, params


def test_greedy_sigma0_collapses_to_frequentist(tiny_gpt2):
    bundle, params = tiny_gpt2
    bmodel, bp = bf.to_bayesian(bundle.apply_fn, params, delta=1e-5,
                                freeze=True)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, bundle.config.vocab_size, (2, 8)).astype(np.int32)

    out = mc_generate(bundle.hf_model, bmodel, bp, jax.random.key(0), ids,
                      n_samples=3, max_new_tokens=6)
    assert out["sequences"].shape == (3, 2, 14)
    # prompt is carried through unchanged
    np.testing.assert_array_equal(out["sequences"][:, :, :8],
                                  np.broadcast_to(ids, (3, 2, 8)))
    # sigma -> 0: every draw greedy-decodes the same continuation as the
    # frequentist model itself
    freq = bundle.hf_model.generate(
        jnp.asarray(ids), params=params, max_length=14, do_sample=False,
        pad_token_id=0,
    ).sequences
    for s in range(3):
        np.testing.assert_array_equal(out["sequences"][s], np.asarray(freq))
    assert (out["agreement"] == 1.0).all()
    np.testing.assert_array_equal(out["majority"], np.asarray(freq))


def test_epistemic_diversity_and_determinism(tiny_gpt2):
    bundle, params = tiny_gpt2
    # a fat posterior on an untrained model: draws must genuinely disagree
    bmodel, bp = bf.to_bayesian(bundle.apply_fn, params, delta=0.5,
                                freeze=True)
    rng = np.random.default_rng(1)
    ids = rng.integers(1, bundle.config.vocab_size, (2, 8)).astype(np.int32)
    out = mc_generate(bundle.hf_model, bmodel, bp, jax.random.key(1), ids,
                      n_samples=4, max_new_tokens=8)
    gen = out["sequences"][:, :, 8:]
    assert any(
        not np.array_equal(gen[s], gen[0]) for s in range(1, 4)
    ), "a delta=0.5 posterior produced identical decodes across draws"
    assert (out["agreement"][:, 8:] <= 1.0).all()
    assert out["agreement"].shape == (2, 16)

    # same key -> bit-identical; different key -> different draws
    out2 = mc_generate(bundle.hf_model, bmodel, bp, jax.random.key(1), ids,
                       n_samples=4, max_new_tokens=8)
    np.testing.assert_array_equal(out["sequences"], out2["sequences"])
    out3 = mc_generate(bundle.hf_model, bmodel, bp, jax.random.key(2), ids,
                       n_samples=4, max_new_tokens=8)
    assert not np.array_equal(out["sequences"], out3["sequences"])


def test_do_sample_uses_decode_keys(tiny_gpt2):
    bundle, params = tiny_gpt2
    bmodel, bp = bf.to_bayesian(bundle.apply_fn, params, delta=1e-5,
                                freeze=True)
    rng = np.random.default_rng(2)
    ids = rng.integers(1, bundle.config.vocab_size, (1, 8)).astype(np.int32)
    # sigma~0 so weight draws agree; token sampling still diversifies
    out = mc_generate(bundle.hf_model, bmodel, bp, jax.random.key(0), ids,
                      n_samples=4, max_new_tokens=12, do_sample=True,
                      temperature=5.0)
    gen = out["sequences"][:, :, 8:]
    assert any(not np.array_equal(gen[s], gen[0]) for s in range(1, 4))


def test_t5_seq2seq_generation():
    """mc_generate is model-agnostic over HF generate-capable wrappers:
    T5 (encoder-decoder) decodes S posterior continuations; sequences are
    decoder-side (start token first), sigma->0 draws all agree."""
    from bayeformers_tpu.models import t5 as t5_lib

    bundle = t5_lib.build_t5(size="tiny", seed=0)
    bmodel, bp = bf.to_bayesian(bundle.apply_fn, bundle.params, delta=1e-5,
                                freeze=True)
    rng = np.random.default_rng(3)
    src = rng.integers(2, bundle.config.vocab_size, (2, 10)).astype(np.int32)
    out = mc_generate(bundle.hf_model, bmodel, bp, jax.random.key(0), src,
                      n_samples=2, max_new_tokens=5)
    # HF seq2seq generate returns decoder sequences: start token + 5 new
    assert out["sequences"].shape[0] == 2 and out["sequences"].shape[1] == 2
    assert (out["agreement"] == 1.0).all()
