"""CONV_RULE — Bayesian true convolutions (extension; the reference's
registry converts nn.Linear only, `bayeformers/nn/__init__.py:25`).

Covers: rule matching scope, the im2col lowering's exactness against
lax.conv (strides/padding/dilation, 1-D and 2-D), sigma->0 parity of every
MC tier against the frequentist forward, gradient flow into conv rho, and
the ViT patch-projection integration.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bayeformers_tpu as bf
from bayeformers_tpu.nn import fused as fused_lib
from bayeformers_tpu.models import vit as vit_lib

CONV_RULES = (*bf.DEFAULT_RULES, bf.CONV_RULE)


class TinyCNN(nn.Module):
    """2-D conv stack + head: strided SAME conv (ViT-patchify-shaped) and a
    dilated VALID conv exercising the non-trivial windowing paths."""

    @nn.compact
    def __call__(self, x):  # (N, 8, 8, 3)
        x = nn.Conv(4, (3, 3), strides=(2, 2), padding="SAME", name="c0")(x)
        x = nn.relu(x)
        x = nn.Conv(
            4, (2, 2), padding="VALID", kernel_dilation=(2, 2), name="c1"
        )(x)
        x = x.reshape((x.shape[0], -1))
        return nn.Dense(5, name="head")(x)


class TinyCNN1D(nn.Module):
    """Whisper-encoder-shaped 1-D convs (pad 1; second one strided)."""

    @nn.compact
    def __call__(self, x):  # (N, 16, 3)
        x = nn.gelu(nn.Conv(4, (3,), padding=((1, 1),), name="c0")(x))
        x = nn.gelu(
            nn.Conv(4, (3,), strides=(2,), padding=((1, 1),), name="c1")(x)
        )
        x = x.reshape((x.shape[0], -1))
        return nn.Dense(3, name="head")(x)


def _bundle(module, x, seed=0):
    params = module.init(jax.random.key(seed), x)["params"]
    # keep zero-init biases away from 0 so MOPED sigma = delta*|w| stays > 0
    params = jax.tree.map(
        lambda a: jnp.where(a == 0, jnp.full_like(a, 0.01), a), params
    )
    apply_fn = lambda p, xx: module.apply({"params": p}, xx)
    return apply_fn, params


def test_conv_rule_scope():
    """CONV_RULE matches conv kernel+bias groups (3-5D kernels); the default
    registry leaves them frequentist (reference Linear-only scope)."""
    x = jnp.zeros((2, 8, 8, 3))
    _, params = _bundle(TinyCNN(), x)
    default = bf.find_convertible_paths(params)
    withconv = bf.find_convertible_paths(params, CONV_RULES)
    assert not any(p.startswith(("c0/", "c1/")) for p in default)
    assert {"c0/kernel", "c0/bias", "c1/kernel", "c1/bias"} <= set(withconv)
    assert {"head/kernel", "head/bias"} <= set(withconv)


def test_lower_conv_matches_lax_conv():
    """The im2col lowering (patches @ reorder(kernel)) is exact against
    lax.conv_general_dilated across stride/padding/dilation, 1-D and 2-D."""
    rng = np.random.default_rng(0)
    cases = [
        # (spatial_in, ksize, strides, padding, kdil)
        ((9, 10), (3, 4), (2, 2), "SAME", (1, 1)),
        ((9, 10), (3, 4), (1, 2), "VALID", (2, 1)),
        ((11,), (3,), (1,), ((1, 1),), (1,)),
        ((11,), (3,), (2,), "SAME", (1,)),
    ]
    for spatial, ksize, strides, padding, kdil in cases:
        nd = len(ksize)
        x = jnp.asarray(
            rng.normal(size=(2,) + spatial + (3,)).astype(np.float32)
        )
        mod = nn.Conv(
            5, ksize, strides=strides, padding=padding,
            kernel_dilation=kdil, use_bias=False,
        )
        params = mod.init(jax.random.key(1), x)["params"]
        want = mod.apply({"params": params}, x)

        got = {}

        def probe(next_fun, f_args, f_kwargs, context):
            m = context.module
            if isinstance(m, nn.Conv) and context.method_name == "__call__":
                kpath, mu, reorder, patches, out_spatial = fused_lib.lower_conv(
                    m, f_args[0]
                )
                y = patches.reshape(-1, patches.shape[-1]) @ reorder(mu)
                got["y"] = y.reshape(
                    (f_args[0].shape[0],) + out_spatial + (mu.shape[-1],)
                )
            return next_fun(*f_args, **f_kwargs)

        with nn.intercept_methods(probe):
            mod.apply({"params": params}, x)
        np.testing.assert_allclose(
            np.asarray(got["y"]), np.asarray(want), rtol=1e-5, atol=1e-5
        )


@pytest.mark.slow
def test_conv_sigma0_parity_all_tiers():
    """MOPED delta->0: naive, fused, flipout, and lrt tiers all reproduce
    the frequentist forward through converted 2-D convs."""
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 8, 8, 3)).astype(np.float32)
    )
    apply_fn, params = _bundle(TinyCNN(), x)
    bmodel, bp = bf.to_bayesian(
        apply_fn, params, delta=1e-6, freeze=True, rules=CONV_RULES
    )
    assert {"c0/kernel", "c1/kernel"} <= set(bmodel.spec.paths)
    freq = apply_fn(params, x)
    out_n, aux_n = bmodel.mc_apply(bp, jax.random.key(0), 2, x)
    out_f, aux_f = bmodel.mc_apply_fused(bp, jax.random.key(0), 2, x)
    out_fl, aux_fl = bmodel.mc_apply_flipout(bp, jax.random.key(0), 2, x)
    out_l, _ = bmodel.mc_apply_lrt(bp, jax.random.key(0), 2, x)
    for out in (out_n, out_f, out_fl, out_l):
        assert out.shape == (2, 4, 5)
        np.testing.assert_allclose(
            np.asarray(out[0]), np.asarray(freq), rtol=1e-3, atol=1e-3
        )
    # conv leaves contribute to the KL bookkeeping in every tier
    assert np.isfinite(np.asarray(aux_f["log_variational_posterior"])).all()
    assert np.isfinite(float(aux_fl["kl"]))


def test_conv1d_sigma0_parity():
    """Whisper-shaped 1-D convs through naive + fused + lrt tiers."""
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(3, 16, 3)).astype(np.float32)
    )
    apply_fn, params = _bundle(TinyCNN1D(), x)
    bmodel, bp = bf.to_bayesian(
        apply_fn, params, delta=1e-6, freeze=True, rules=CONV_RULES
    )
    freq = apply_fn(params, x)
    out_n, _ = bmodel.mc_apply(bp, jax.random.key(0), 2, x)
    out_f, _ = bmodel.mc_apply_fused(bp, jax.random.key(0), 2, x)
    out_l, _ = bmodel.mc_apply_lrt(bp, jax.random.key(0), 2, x)
    for out in (out_n, out_f, out_l):
        np.testing.assert_allclose(
            np.asarray(out[0]), np.asarray(freq), rtol=1e-3, atol=1e-3
        )


def test_conv_rho_gets_gradients():
    """The ELBO gradient reaches conv rho leaves in the fused tier (the
    reference detaches KL entirely — SURVEY.md Q1; here it must flow)."""
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(2, 8, 8, 3)).astype(np.float32)
    )
    apply_fn, params = _bundle(TinyCNN(), x)
    bmodel, bp = bf.to_bayesian(
        apply_fn, params, delta=0.05, freeze=True, rules=CONV_RULES
    )

    def loss(bp_):
        out, aux = bmodel.mc_apply_fused(bp_, jax.random.key(0), 2, x)
        kl = jnp.mean(
            aux["log_variational_posterior"] - aux["log_prior"]
        )
        return jnp.mean(out**2) + 1e-3 * kl

    g = jax.grad(loss)(bp)
    assert float(jnp.abs(g.rho["c0/kernel"]).max()) > 0
    assert float(jnp.abs(g.rho["c1/bias"]).max()) > 0


@pytest.mark.slow
def test_vit_patch_conv_converts():
    """ViT with CONV_RULE: the patch-projection conv becomes Bayesian too,
    and the fused tier still reproduces the frequentist logits at sigma->0."""
    bundle = vit_lib.build_vit(size="tiny", n_labels=2, seed=0)
    params = jax.tree.map(
        lambda a: jnp.where(a == 0, jnp.full_like(a, 0.01), a), bundle.params
    )
    bmodel, bp = bf.to_bayesian(
        bundle.apply_fn, params, delta=1e-5, freeze=True, rules=CONV_RULES
    )
    patch = [p for p in bmodel.spec.paths if "patch_embeddings" in p]
    assert any(p.endswith("kernel") for p in patch), bmodel.spec.paths
    px = vit_lib.synthetic_image_batch(np.random.default_rng(0), 2, 32)[
        "pixel_values"
    ]
    freq = bundle.apply_fn(params, px)
    out_f, _ = bmodel.mc_apply_fused(bp, jax.random.key(0), 2, px)
    out_n, _ = bmodel.mc_apply(bp, jax.random.key(0), 2, px)
    for out in (out_f, out_n):
        np.testing.assert_allclose(
            np.asarray(out[0]), np.asarray(freq), rtol=2e-3, atol=2e-3
        )


def test_unsupported_conv_raises_loud():
    """Grouped convolutions have no Bayesian lowering: the fused tier must
    refuse (a silent fallback would run the layer at mu with no KL)."""
    class Grouped(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(4, (3,), feature_group_count=2, name="g")(x)

    x = jnp.zeros((2, 8, 4))
    apply_fn, params = _bundle(Grouped(), x)
    bmodel, bp = bf.to_bayesian(
        apply_fn, params, delta=0.05, freeze=True, rules=CONV_RULES
    )
    try:
        bmodel.mc_apply_fused(bp, jax.random.key(0), 2, x)
    except NotImplementedError as e:
        assert "feature_group_count" in str(e)
    else:
        raise AssertionError("expected NotImplementedError")


def test_converted_conv_transpose_raises_not_silently_frequentist():
    """The shape-only CONV_RULE also matches nn.ConvTranspose param groups,
    but the interception tiers only lower isinstance(nn.Conv) modules — a
    converted ConvTranspose must RAISE (check_converted_paths_seen), not
    silently run the stock forward at mu with no sampling and no KL
    (advisor r3, medium)."""
    import flax.linen as nn

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.ConvTranspose(4, (3,))(x)
            return nn.Dense(2)(x.mean(axis=1))

    net = Net()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 3)),
                    jnp.float32)
    params = net.init(jax.random.key(0), x)["params"]
    apply_fn = lambda p, x: net.apply({"params": p}, x)
    bmodel, bp = bf.to_bayesian(
        apply_fn, params, delta=0.05, freeze=True, rules=CONV_RULES
    )
    # the rule DID convert the transpose kernel (that's the hazard)
    assert any("ConvTranspose" in p for p in bmodel.spec.paths)
    for mc in (bmodel.mc_apply_fused, bmodel.mc_apply_flipout,
               bmodel.mc_apply_lrt):
        with pytest.raises(NotImplementedError, match="never .*intercepted|intercepted"):
            mc(bp, jax.random.key(1), 2, x)


def test_converted_masked_conv_raises():
    """lower_conv must refuse kernel masks rather than silently computing
    the unmasked convolution (advisor r3, low)."""
    import flax.linen as nn

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            m = jnp.ones((3, 3, 4), jnp.float32).at[0].set(0.0)
            x = nn.Conv(4, (3,), mask=m)(x)
            return x.mean(axis=1)

    net = Net()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 3)),
                    jnp.float32)
    params = net.init(jax.random.key(0), x)["params"]
    apply_fn = lambda p, x: net.apply({"params": p}, x)
    bmodel, bp = bf.to_bayesian(
        apply_fn, params, delta=0.05, freeze=True, rules=CONV_RULES
    )
    with pytest.raises(NotImplementedError, match="mask"):
        bmodel.mc_apply_fused(bp, jax.random.key(1), 2, x)
