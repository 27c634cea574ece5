"""Multi-chip sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import bayeformers_tpu as bf
from bayeformers_tpu.models import bert as bert_lib
from bayeformers_tpu.parallel import mesh as mesh_lib
from bayeformers_tpu.utils.optim import masked_optimizer


@pytest.fixture(scope="module")
def tiny_bert():
    bundle = bert_lib.build_bert(task="classification", n_labels=2, size="tiny")
    bmodel, bp = bf.to_bayesian(bundle.apply_fn, bundle.params, delta=0.05, freeze=True)
    return bundle, bmodel, bp


def test_mesh_construction():
    mesh = mesh_lib.make_mesh(4, 2)
    assert mesh.shape == {"dp": 4, "tp": 2}
    with pytest.raises(ValueError):
        mesh_lib.make_mesh(16, 2)


def test_tp_rules_cover_bert(tiny_bert):
    _, bmodel, bp = tiny_bert
    specs = {p: mesh_lib.bert_param_spec(p) for p in bmodel.spec.paths}
    # QKV kernels column-sharded, attention-output row-sharded
    assert any(
        s == jax.sharding.PartitionSpec(None, "tp")
        for p, s in specs.items() if "self/query/kernel" in p
    )
    assert any(
        s == jax.sharding.PartitionSpec("tp", None)
        for p, s in specs.items() if "attention/output/dense/kernel" in p
    )
    # classifier replicated
    assert specs.get("classifier/kernel", jax.sharding.PartitionSpec()) == (
        jax.sharding.PartitionSpec()
    )


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2)])
@pytest.mark.slow
def test_sharded_elbo_train_step(tiny_bert, dp, tp):
    """Full MC-ELBO training step jitted over a dp x tp mesh via GSPMD."""
    _, bmodel, bp = tiny_bert
    mesh = mesh_lib.make_mesh(dp, tp)
    bp_sharded = mesh_lib.shard_bayes_params(bp, mesh)
    batch = bert_lib.synthetic_batch(np.random.default_rng(0), 16, 16, 1024, 2)
    labels = batch.pop("labels")
    inputs = mesh_lib.shard_batch(batch, mesh)
    labels = mesh_lib.shard_batch(labels, mesh)

    tx = masked_optimizer(optax.adamw(2e-5), bmodel.trainable_mask(bp))
    opt_state = tx.init(bp_sharded)

    @jax.jit
    def step(bparams, opt_state, key, inputs, labels):
        def loss_fn(bparams):
            out, aux = bmodel.mc_apply(bparams, key, 3, **inputs)
            nll = bf.elbo.cross_entropy_sum(bf.elbo.mc_logits_mean(out), labels)
            return bf.elbo.elbo_loss(
                nll, aux["log_prior"], aux["log_variational_posterior"], 10
            )

        loss, grads = jax.value_and_grad(loss_fn)(bparams)
        updates, opt_state = tx.update(grads, opt_state, bparams)
        return optax.apply_updates(bparams, updates), opt_state, loss

    bp2, opt_state, loss = step(bp_sharded, opt_state, jax.random.key(0), inputs, labels)
    assert np.isfinite(float(loss))
    # a second step with updated params still runs (shapes/shardings stable)
    bp3, _, loss2 = step(bp2, opt_state, jax.random.key(1), inputs, labels)
    assert np.isfinite(float(loss2))
    # tp-sharded leaf really is distributed
    if tp > 1:
        leaf = bp2.params["bert"]["encoder"]["layer"]["0"]["attention"]["self"][
            "query"
        ]["kernel"]
        assert len(leaf.sharding.device_set) == dp * tp


@pytest.mark.slow
def test_sharded_matches_single_device(tiny_bert):
    """Same step on a 1-device 'mesh' vs 8-device dp mesh: same loss value."""
    _, bmodel, bp = tiny_bert
    batch = bert_lib.synthetic_batch(np.random.default_rng(1), 8, 12, 1024, 2)
    labels = batch.pop("labels")

    def loss_fn(bparams, inputs, labels):
        out, aux = bmodel.mc_apply(bparams, jax.random.key(5), 2, **inputs)
        nll = bf.elbo.cross_entropy_sum(bf.elbo.mc_logits_mean(out), labels)
        return bf.elbo.elbo_loss(
            nll, aux["log_prior"], aux["log_variational_posterior"], 10
        )

    loss_single = float(jax.jit(loss_fn)(bp, batch, labels))
    mesh = mesh_lib.make_mesh(8, 1)
    bp_sharded = mesh_lib.shard_bayes_params(bp, mesh)
    inputs = mesh_lib.shard_batch(batch, mesh)
    labels_s = mesh_lib.shard_batch(labels, mesh)
    loss_sharded = float(jax.jit(loss_fn)(bp_sharded, inputs, labels_s))
    np.testing.assert_allclose(loss_single, loss_sharded, rtol=1e-4)


def test_shard_map_dp_matches_single_device(tiny_bert):
    """shard_map DP step (the Pallas-tier scaling path) must reproduce the
    single-device fused step: same loss, same updated params."""
    import optax
    from bayeformers_tpu import training
    from bayeformers_tpu.parallel import train as ptrain
    from bayeformers_tpu.utils.optim import masked_optimizer

    _, bmodel, bp = tiny_bert
    batch = bert_lib.synthetic_batch(np.random.default_rng(2), 16, 12, 1024, 2)
    tx = masked_optimizer(optax.sgd(1e-3), bmodel.trainable_mask(bp))

    # single-device fused step
    single = training.make_elbo_train_step(bmodel, tx, 3, 10, fused=True)
    bp1, _, m1 = single(bp, tx.init(bp), jax.random.key(9), batch)

    # 8-way dp shard_map step
    mesh = mesh_lib.make_mesh(8, 1)
    mesh_dp = jax.sharding.Mesh(np.asarray(jax.devices()[:8]), ("dp",))
    step = ptrain.make_dp_train_step(bmodel, tx, 3, 10, mesh_dp)
    bp_rep = ptrain.replicate(bp, mesh_dp)
    opt_rep = tx.init(bp_rep)
    batch_sh = jax.tree.map(
        lambda a: jax.device_put(
            a, jax.sharding.NamedSharding(mesh_dp, jax.sharding.PartitionSpec("dp"))
        ),
        batch,
    )
    bp2, _, m2 = step(bp_rep, opt_rep, jax.random.key(9), batch_sh)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=2e-5)
    a = np.asarray(bp1.rho["bert/encoder/layer/0/attention/self/query/kernel"])
    b = np.asarray(bp2.rho["bert/encoder/layer/0/attention/self/query/kernel"])
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-7)


@pytest.mark.slow
def test_shard_map_dp_antithetic_matches_single_device(tiny_bert):
    """The antithetic estimator under dp shard_map must reproduce the
    single-device antithetic step (estimator plumbing + pair seeds survive
    the per-shard closure)."""
    import optax
    from bayeformers_tpu import training
    from bayeformers_tpu.parallel import train as ptrain
    from bayeformers_tpu.utils.optim import masked_optimizer

    _, bmodel, bp = tiny_bert
    batch = bert_lib.synthetic_batch(np.random.default_rng(4), 16, 12, 1024, 2)
    tx = masked_optimizer(optax.sgd(1e-3), bmodel.trainable_mask(bp))

    single = training.make_elbo_train_step(
        bmodel, tx, 4, 10, estimator="antithetic"
    )
    bp1, _, m1 = single(bp, tx.init(bp), jax.random.key(3), batch)

    mesh_dp = jax.sharding.Mesh(np.asarray(jax.devices()[:8]), ("dp",))
    step = ptrain.make_dp_train_step(
        bmodel, tx, 4, 10, mesh_dp, estimator="antithetic"
    )
    bp_rep = ptrain.replicate(bp, mesh_dp)
    batch_sh = jax.tree.map(
        lambda a: jax.device_put(
            a, jax.sharding.NamedSharding(mesh_dp, jax.sharding.PartitionSpec("dp"))
        ),
        batch,
    )
    bp2, _, m2 = step(bp_rep, tx.init(bp_rep), jax.random.key(3), batch_sh)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=2e-5)
    path = "bert/encoder/layer/0/attention/self/query/kernel"
    np.testing.assert_allclose(
        np.asarray(bp1.rho[path]), np.asarray(bp2.rho[path]),
        rtol=1e-4, atol=1e-7,
    )


def _dp_shard(batch, mesh):
    return jax.tree.map(
        lambda a: jax.device_put(
            a, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("dp"))
        ),
        batch,
    )


@pytest.mark.slow
def test_shard_map_dp_local_matches_single_device():
    """The local-reparameterization estimator under dp shard_map, in the
    sigma->0 limit. Unlike the weight-space tiers, LRT's activation-noise
    shapes depend on the LOCAL batch, so dp and single-device draws differ
    by construction; at sigma->0 every estimator must collapse to the
    frequentist forward and the dp step must reproduce the single-device
    loss and parameter update exactly."""
    import optax
    from bayeformers_tpu import training
    from bayeformers_tpu.parallel import train as ptrain
    from bayeformers_tpu.utils.optim import masked_optimizer

    bundle = bert_lib.build_bert(task="classification", n_labels=2, size="tiny")
    params = jax.tree.map(
        lambda a: jnp.where(a == 0, jnp.full_like(a, 0.01), a), bundle.params
    )
    bmodel, bp = bf.to_bayesian(bundle.apply_fn, params, delta=1e-6, freeze=True)
    batch = bert_lib.synthetic_batch(np.random.default_rng(6), 16, 12, 1024, 2)
    tx = masked_optimizer(optax.sgd(1e-3), bmodel.trainable_mask(bp))

    single = training.make_elbo_train_step(bmodel, tx, 2, 10, estimator="local")
    bp1, _, m1 = single(bp, tx.init(bp), jax.random.key(7), batch)

    mesh_dp = jax.sharding.Mesh(np.asarray(jax.devices()[:8]), ("dp",))
    step = ptrain.make_dp_train_step(bmodel, tx, 2, 10, mesh_dp, estimator="local")
    bp_rep = ptrain.replicate(bp, mesh_dp)
    bp2, _, m2 = step(bp_rep, tx.init(bp_rep), jax.random.key(7),
                      _dp_shard(batch, mesh_dp))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=2e-5)
    path = "bert/encoder/layer/0/attention/self/query/kernel"
    np.testing.assert_allclose(
        np.asarray(bp1.rho[path]), np.asarray(bp2.rho[path]),
        rtol=1e-4, atol=1e-7,
    )


@pytest.fixture(scope="module")
def aligned_bert():
    """Tiny BERT whose tp=2 shard boundaries land on the 128-element eps-unit
    grid (hidden 256, intermediate 512): the fused tp tier then draws the
    exact slice of the single-device noise stream — bit-tight parity."""
    bundle = bert_lib.build_bert(
        task="classification", n_labels=2, size="tiny",
        hidden_size=256, num_attention_heads=4, intermediate_size=512,
    )
    bmodel, bp = bf.to_bayesian(bundle.apply_fn, bundle.params, delta=0.05, freeze=True)
    return bundle, bmodel, bp


@pytest.mark.parametrize("estimator", ["fused", "antithetic"])
@pytest.mark.slow
def test_shard_map_dp_tp_fused_matches_single_device(aligned_bert, estimator):
    """The Megatron-sharded fused step (dp=4 x tp=2 shard_map) must
    reproduce the single-device fused step: same loss, same updated
    (column-sharded) rho leaf. Closes VERDICT r2 'next' #1."""
    import optax
    from bayeformers_tpu import training
    from bayeformers_tpu.parallel import train as ptrain
    from bayeformers_tpu.utils.optim import masked_optimizer

    _, bmodel, bp = aligned_bert
    n_s = 4 if estimator == "antithetic" else 3
    batch = bert_lib.synthetic_batch(np.random.default_rng(3), 8, 16, 1024, 2)
    tx = masked_optimizer(optax.sgd(1e-3), bmodel.trainable_mask(bp))

    single = training.make_elbo_train_step(
        bmodel, tx, n_s, 10, estimator=estimator
    )
    bp1, _, m1 = single(bp, tx.init(bp), jax.random.key(7), batch)

    mesh = mesh_lib.make_mesh(4, 2)
    bp_sh = mesh_lib.shard_bayes_params(bp, mesh)
    opt_sh = tx.init(bp_sh)
    step = ptrain.make_train_step(bmodel, tx, n_s, 10, mesh, estimator=estimator)
    bp2, _, m2 = step(bp_sh, opt_sh, jax.random.key(7), _dp_shard(batch, mesh))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=2e-5)
    for path in (
        "bert/encoder/layer/0/attention/self/query/kernel",  # column-sharded
        "bert/encoder/layer/0/attention/output/dense/kernel",  # row-sharded
        "classifier/kernel",  # replicated
    ):
        np.testing.assert_allclose(
            np.asarray(bp1.rho[path]), np.asarray(bp2.rho[path]),
            rtol=1e-4, atol=1e-6, err_msg=path,
        )
    # tp leaf really is distributed over the full mesh
    q = bp2.params["bert"]["encoder"]["layer"]["0"]["attention"]["self"][
        "query"
    ]["kernel"]
    assert len(q.sharding.device_set) == 8


@pytest.mark.slow
def test_shard_map_tp_misaligned_decorrelates_and_runs(tiny_bert):
    """hidden=128 at tp=2 gives 64-wide shards (off the eps-unit grid): the
    fused tier must fall back to per-shard decorrelated draws and still take
    a finite training step."""
    import optax
    from bayeformers_tpu.parallel import train as ptrain
    from bayeformers_tpu.utils.optim import masked_optimizer

    _, bmodel, bp = tiny_bert
    batch = bert_lib.synthetic_batch(np.random.default_rng(5), 8, 12, 1024, 2)
    tx = masked_optimizer(optax.sgd(1e-3), bmodel.trainable_mask(bp))
    mesh = mesh_lib.make_mesh(4, 2)
    bp_sh = mesh_lib.shard_bayes_params(bp, mesh)
    step = ptrain.make_train_step(bmodel, tx, 2, 10, mesh)
    bp2, _, m2 = step(
        bp_sh, tx.init(bp_sh), jax.random.key(1), _dp_shard(batch, mesh)
    )
    assert np.isfinite(float(m2["loss"]))
    assert np.isfinite(np.asarray(
        bp2.rho["bert/encoder/layer/0/attention/self/query/kernel"]
    )).all()


@pytest.mark.slow
def test_shard_map_dp_independent_draws(tiny_bert):
    """independent_draws=True (reference-DataParallel semantics,
    `examples/bert_squad.py:245`): each dp shard draws its own sample set —
    the loss must CHANGE vs shared draws but stay an unbiased estimate of
    the same objective (close at these tiny sigmas)."""
    import optax
    from bayeformers_tpu.parallel import train as ptrain
    from bayeformers_tpu.utils.optim import masked_optimizer

    _, bmodel, bp = tiny_bert
    batch = bert_lib.synthetic_batch(np.random.default_rng(8), 16, 12, 1024, 2)
    tx = masked_optimizer(optax.sgd(1e-3), bmodel.trainable_mask(bp))
    mesh_dp = jax.sharding.Mesh(np.asarray(jax.devices()[:8]), ("dp",))
    bp_rep = ptrain.replicate(bp, mesh_dp)
    batch_sh = _dp_shard(batch, mesh_dp)

    shared = ptrain.make_train_step(bmodel, tx, 2, 10, mesh_dp)
    _, _, m_shared = shared(bp_rep, tx.init(bp_rep), jax.random.key(2), batch_sh)
    indep = ptrain.make_train_step(
        bmodel, tx, 2, 10, mesh_dp, independent_draws=True
    )
    _, _, m_indep = indep(bp_rep, tx.init(bp_rep), jax.random.key(2), batch_sh)

    l_s, l_i = float(m_shared["loss"]), float(m_indep["loss"])
    assert l_s != l_i  # different draws
    assert abs(l_i - l_s) / abs(l_s) < 0.05  # same objective, MC noise apart
    # metrics surface matches the single-device step (VERDICT r2 weak #8)
    for k in ("nll", "log_prior", "log_variational_posterior", "loss"):
        assert k in m_indep


def test_tp_rules_cover_all_families():
    """Every converted family must match tp rules (col for QKV/up-proj, row
    for output projections) — and a family with no matches must raise
    loudly instead of silently replicating (VERDICT r2 weak #3)."""
    from jax.sharding import PartitionSpec as P

    builders = {
        "distilbert": (
            bert_lib.build_distilbert,
            "attention/q_lin/kernel", "attention/out_lin/kernel",
        ),
        "electra": (
            bert_lib.build_electra,
            "attention/self/query/kernel", "attention/output/dense/kernel",
        ),
        "albert": (
            bert_lib.build_albert,
            "attention/query/kernel", "attention/dense/kernel",
        ),
    }
    for fam, (builder, col_frag, row_frag) in builders.items():
        bundle = builder(task="classification", n_labels=2, size="tiny")
        _, bp = bf.to_bayesian(
            bundle.apply_fn, bundle.params, delta=0.05, freeze=True
        )
        paths = list(bp.rho)
        mesh_lib.assert_tp_coverage(paths)  # must not raise
        specs = {p: mesh_lib.tp_param_spec(p) for p in paths}
        assert any(
            s == P(None, "tp") for p, s in specs.items() if col_frag in p
        ), fam
        assert any(
            s == P("tp", None) for p, s in specs.items() if row_frag in p
        ), fam
    with pytest.raises(ValueError, match="no converted parameter path"):
        mesh_lib.assert_tp_coverage(["layers_0/kernel", "layers_1/kernel"])


GPT2_PATHS = [
    "transformer/h/0/attn/c_attn/kernel",
    "transformer/h/0/attn/c_attn/bias",
    "transformer/h/0/attn/c_proj/kernel",
    "transformer/h/0/attn/c_proj/bias",
    "transformer/h/0/mlp/c_fc/kernel",
    "transformer/h/0/mlp/c_fc/bias",
    "transformer/h/0/mlp/c_proj/kernel",
    "transformer/h/0/mlp/c_proj/bias",
]


def test_gpt2_tp_rules_and_kinds():
    """GPT-2 Conv1D kernels are stored (out, in) — the transpose of
    nn.Dense — so the Megatron specs flip axes relative to _TP_RULES, and
    the LOGICAL col/row kind must come from gpt2_tp_kind (kind_from_spec
    would invert it). family_tp_fns auto-detects the family from the packed
    c_attn path; the Dense-family default still raises loudly on these
    paths (cross-family guard, VERDICT r2 weak #3 policy)."""
    P = jax.sharding.PartitionSpec
    expect = {
        "attn/c_attn/kernel": (P("tp", None), "col"),
        "attn/c_attn/bias": (P("tp"), "col"),
        "attn/c_proj/kernel": (P(None, "tp"), "row"),
        "attn/c_proj/bias": (P(), "rep"),
        "mlp/c_fc/kernel": (P("tp", None), "col"),
        "mlp/c_fc/bias": (P("tp"), "col"),
        "mlp/c_proj/kernel": (P(None, "tp"), "row"),
        "mlp/c_proj/bias": (P(), "rep"),
    }
    for path in GPT2_PATHS:
        suffix = path.split("/", 3)[-1]
        spec, kind = expect[suffix]
        assert mesh_lib.gpt2_param_spec(path) == spec, path
        assert mesh_lib.gpt2_tp_kind(path) == kind, path
    spec_fn, kind_fn, fused_ok = mesh_lib.family_tp_fns(GPT2_PATHS)
    assert spec_fn is mesh_lib.gpt2_param_spec
    assert kind_fn is mesh_lib.gpt2_tp_kind
    assert fused_ok
    spec_fn, kind_fn, fused_ok = mesh_lib.family_tp_fns(["encoder/lin/kernel"])
    assert spec_fn is mesh_lib.tp_param_spec
    assert fused_ok
    # the Dense-family spec matches nothing on GPT-2 paths -> loud failure
    with pytest.raises(ValueError, match="no converted parameter path"):
        mesh_lib.assert_tp_coverage(GPT2_PATHS, mesh_lib.tp_param_spec)
    # ... while the family-correct spec covers them
    mesh_lib.assert_tp_coverage(GPT2_PATHS, mesh_lib.gpt2_param_spec)


def test_gpt2_qkv_permutation_roundtrip_and_alignment():
    """permute_gpt2_qkv: inverse really inverts, and each contiguous tp
    block of the permuted out-dim is [Q_heads_r | K_heads_r | V_heads_r] —
    the layout the fused handler's local 3-way split assumes."""
    E, tp = 8, 2
    rng = np.random.default_rng(0)
    kernel = rng.normal(size=(3 * E, E)).astype(np.float32)
    bias = rng.normal(size=(3 * E,)).astype(np.float32)
    import bayeformers_tpu.nn.surgery as surgery

    bp = surgery.BayesParams(
        params={"transformer": {"h": {"0": {"attn": {"c_attn": {
            "kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)
        }}}}}},
        rho={"transformer/h/0/attn/c_attn/kernel": jnp.asarray(kernel + 1)},
        prior_mu={"transformer/h/0/attn/c_attn/bias": jnp.asarray(bias + 1)},
    )
    perm = mesh_lib.permute_gpt2_qkv(bp, tp)
    back = mesh_lib.permute_gpt2_qkv(perm, tp, inverse=True)
    k0 = lambda b: np.asarray(
        b.params["transformer"]["h"]["0"]["attn"]["c_attn"]["kernel"]
    )
    np.testing.assert_array_equal(k0(back), kernel)
    np.testing.assert_array_equal(
        np.asarray(back.rho["transformer/h/0/attn/c_attn/kernel"]), kernel + 1
    )
    np.testing.assert_array_equal(
        np.asarray(back.prior_mu["transformer/h/0/attn/c_attn/bias"]), bias + 1
    )
    # shard r's block = that r-slice of each of Q, K, V
    blk = E // tp
    pk = k0(perm)
    for r in range(tp):
        local = pk[r * 3 * blk:(r + 1) * 3 * blk]
        np.testing.assert_array_equal(local[:blk], kernel[r * blk:][:blk])
        np.testing.assert_array_equal(
            local[blk:2 * blk], kernel[E + r * blk:][:blk]
        )
        np.testing.assert_array_equal(
            local[2 * blk:], kernel[2 * E + r * blk:][:blk]
        )


@pytest.mark.parametrize("estimator", ["fused", "antithetic"])
@pytest.mark.slow
def test_shard_map_dp_tp_gpt2_fused(estimator):
    """Megatron dp=2 x tp=2 on GPT-2's packed-QKV layout: at near-zero
    sigma the sharded fused step's NLL must match the frequentist NLL of
    the same batch (this exercises the permuted c_attn split, the causal
    mha with local heads, the c_proj row psum, and the sharded KL path);
    training steps must then move rho with finite loss. Draws are NOT
    bit-comparable to the single-device stream (the head-aligned
    permutation relabels the eps-unit mapping — documented in
    permute_gpt2_qkv), so parity is asserted in the sigma->0 limit where
    every estimator collapses to the same deterministic forward."""
    from bayeformers_tpu.models import gpt2 as gpt2_lib
    from bayeformers_tpu.parallel import train as ptrain
    from bayeformers_tpu.workloads.gpt2_lm import lm_loss, lm_nll_sum

    bundle = gpt2_lib.build_gpt2(size="tiny", seed=0)
    params = jax.tree.map(
        lambda a: jnp.where(a == 0, jnp.full_like(a, 0.01), a), bundle.params
    )
    n_s = 4 if estimator == "antithetic" else 3
    ids = gpt2_lib.synthetic_lm_batch(
        np.random.default_rng(0), 8, 16, bundle.config.vocab_size
    )["input_ids"]
    batch = {"input_ids": ids}

    bmodel, bp = bf.to_bayesian(bundle.apply_fn, params, delta=1e-4,
                                freeze=True)
    mesh = mesh_lib.make_mesh(2, 2)
    bp_perm = mesh_lib.permute_gpt2_qkv(bp, 2)
    bp_sh = mesh_lib.shard_bayes_params(bp_perm, mesh)
    tx = masked_optimizer(optax.sgd(1e-3), bmodel.trainable_mask(bp))
    step = ptrain.make_train_step(
        bmodel, tx, n_s, 10, mesh, loss_fn=lm_loss,
        input_keys=("input_ids",), estimator=estimator,
    )
    batch_sh = _dp_shard(batch, mesh)
    bp2, opt2, m = step(bp_sh, tx.init(bp_sh), jax.random.key(3), batch_sh)

    freq_nll = float(lm_nll_sum(bundle.apply_fn(params, ids), ids))
    np.testing.assert_allclose(float(m["nll"]), freq_nll, rtol=2e-3)
    assert np.isfinite(float(m["loss"]))
    # tp leaf really is distributed and rho trains
    ck = "transformer/h/0/attn/c_attn/kernel"
    assert len(bp2.rho[ck].sharding.device_set) == 4
    assert not np.array_equal(np.asarray(bp2.rho[ck]),
                              np.asarray(bp_sh.rho[ck]))
    # second step runs on updated state (shardings stable)
    bp3, _, m3 = step(bp2, opt2, jax.random.key(4), batch_sh)
    assert np.isfinite(float(m3["loss"]))


@pytest.mark.slow
def test_shard_map_dp_mc_chunked_matches_single_device(tiny_bert):
    """dp + mc_chunk composition: chunked-accumulated grads per shard with
    one psum must reproduce the single-device chunked step."""
    import optax
    from bayeformers_tpu import training
    from bayeformers_tpu.parallel import train as ptrain
    from bayeformers_tpu.utils.optim import masked_optimizer

    _, bmodel, bp = tiny_bert
    batch = bert_lib.synthetic_batch(np.random.default_rng(6), 16, 12, 1024, 2)
    tx = masked_optimizer(optax.sgd(1e-3), bmodel.trainable_mask(bp))

    single = training.make_elbo_train_step(bmodel, tx, 4, 10, mc_chunk=2)
    bp1, _, m1 = single(bp, tx.init(bp), jax.random.key(11), batch)

    mesh_dp = jax.sharding.Mesh(np.asarray(jax.devices()[:8]), ("dp",))
    step = ptrain.make_dp_train_step(bmodel, tx, 4, 10, mesh_dp, mc_chunk=2)
    bp_rep = ptrain.replicate(bp, mesh_dp)
    batch_sh = jax.tree.map(
        lambda a: jax.device_put(
            a, jax.sharding.NamedSharding(mesh_dp, jax.sharding.PartitionSpec("dp"))
        ),
        batch,
    )
    bp2, _, m2 = step(bp_rep, tx.init(bp_rep), jax.random.key(11), batch_sh)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=2e-5)
    path = "bert/encoder/layer/0/attention/self/query/kernel"
    np.testing.assert_allclose(
        np.asarray(bp1.rho[path]), np.asarray(bp2.rho[path]),
        rtol=1e-4, atol=1e-7,
    )


@pytest.mark.slow
def test_gpt2_gspmd_naive_sharded_matches_single_device():
    """GSPMD tier on GPT-2: sharding is a layout annotation, so the packed
    c_attn shards correctly WITHOUT the head-aligned permutation — the
    vmapped-tier loss on a dp=4 x tp=2 mesh must equal the unsharded loss."""
    from bayeformers_tpu.models import gpt2 as gpt2_lib
    from bayeformers_tpu.workloads.gpt2_lm import lm_nll_sum

    bundle = gpt2_lib.build_gpt2(size="tiny", seed=0)
    params = jax.tree.map(
        lambda a: jnp.where(a == 0, jnp.full_like(a, 0.01), a), bundle.params
    )
    bmodel, bp = bf.to_bayesian(bundle.apply_fn, params, delta=0.05,
                                freeze=True)
    ids = gpt2_lib.synthetic_lm_batch(
        np.random.default_rng(2), 8, 16, bundle.config.vocab_size
    )["input_ids"]

    def loss_fn(bparams, ids):
        out, aux = bmodel.mc_apply(bparams, jax.random.key(4), 2, ids)
        nll = lm_nll_sum(bf.elbo.mc_logits_mean(out), ids)
        return bf.elbo.elbo_loss(
            nll, aux["log_prior"], aux["log_variational_posterior"], 10
        )

    loss_single = float(jax.jit(loss_fn)(bp, ids))
    mesh = mesh_lib.make_mesh(4, 2)
    # auto-detected family spec (gpt2_param_spec) — no permutation
    bp_sh = mesh_lib.shard_bayes_params(bp, mesh)
    ck = "transformer/h/0/attn/c_attn/kernel"
    assert len(bp_sh.rho[ck].sharding.device_set) == 8
    ids_sh = mesh_lib.shard_batch(ids, mesh)
    loss_sharded = float(jax.jit(loss_fn)(bp_sh, ids_sh))
    np.testing.assert_allclose(loss_single, loss_sharded, rtol=1e-4)


@pytest.mark.slow
def test_t5_tp_rules_and_gspmd_sharded_matches_single_device():
    """T5 tp rules (GSPMD tier only): q/k/v/wi column-, o/wo row-parallel;
    family_tp_fns flags fused-tier tp as unsupported (no T5 attention
    interception) and make_train_step refuses it loudly; the vmapped-tier
    loss on a dp=4 x tp=2 mesh equals the unsharded loss."""
    import optax as _optax
    from bayeformers_tpu.models import t5 as t5_lib
    from bayeformers_tpu.parallel import train as ptrain

    P = jax.sharding.PartitionSpec
    assert mesh_lib.t5_param_spec(
        "encoder/block/0/layer/0/SelfAttention/q/kernel") == P(None, "tp")
    assert mesh_lib.t5_param_spec(
        "decoder/block/1/layer/1/EncDecAttention/o/kernel") == P("tp", None)
    assert mesh_lib.t5_param_spec(
        "encoder/block/0/layer/1/DenseReluDense/wi/kernel") == P(None, "tp")
    assert mesh_lib.t5_param_spec(
        "encoder/block/0/layer/1/DenseReluDense/wo/kernel") == P("tp", None)
    assert mesh_lib.t5_param_spec("shared/embedding") == P()

    bundle = t5_lib.build_t5(size="tiny", seed=0)
    bmodel, bp = bf.to_bayesian(bundle.apply_fn, bundle.params, delta=0.05,
                                freeze=True)
    spec_fn, _, fused_ok = mesh_lib.family_tp_fns(bmodel.spec.paths)
    assert spec_fn is mesh_lib.t5_param_spec and not fused_ok

    mesh = mesh_lib.make_mesh(4, 2)
    tx = masked_optimizer(_optax.sgd(1e-3), bmodel.trainable_mask(bp))
    with pytest.raises(ValueError, match="GSPMD tier only"):
        ptrain.make_train_step(bmodel, tx, 2, 10, mesh, estimator="fused")

    batch = t5_lib.synthetic_seq2seq_batch(
        np.random.default_rng(0), 8, 12, 8, bundle.config.vocab_size
    )
    labels = batch["labels"]

    def loss_fn(bparams, batch, labels):
        out, aux = bmodel.mc_apply(bparams, jax.random.key(6), 2, **batch)
        lp = jax.nn.log_softmax(
            bf.elbo.mc_logits_mean(out).astype(jnp.float32), -1
        )
        nll = -jnp.sum(jnp.take_along_axis(lp, labels[..., None], axis=-1))
        return bf.elbo.elbo_loss(
            nll, aux["log_prior"], aux["log_variational_posterior"], 10
        )

    loss_single = float(jax.jit(loss_fn)(bp, batch, labels))
    bp_sh = mesh_lib.shard_bayes_params(bp, mesh)  # auto t5 specs
    qk = "encoder/block/0/layer/0/SelfAttention/q/kernel"
    assert len(bp_sh.rho[qk].sharding.device_set) == 8
    batch_sh = mesh_lib.shard_batch(batch, mesh)
    loss_sharded = float(jax.jit(loss_fn)(
        bp_sh, batch_sh, batch_sh["labels"]
    ))
    np.testing.assert_allclose(loss_single, loss_sharded, rtol=1e-4)


@pytest.mark.parametrize("family", ["llama", "gemma"])
@pytest.mark.slow
def test_shard_map_dp_tp_llama_fused(family):
    """Megatron dp=2 x tp=2 on the LLaMA-architecture families: at
    near-zero sigma the sharded fused step's NLL must match the
    frequentist NLL of the same batch — this exercises column-sharded
    q/k/v with LOCAL GQA head counts (kv heads divide tp), rotary on local
    heads, the in-kernel causal mha, the o/down row psums, and the sharded
    KL path. GQA shard widths here (kv tiny = 2 heads x 32 = 64 per
    device at tp=2) do NOT land on the 128-wide eps-unit grid, so this
    also covers the decorrelated per-shard noise path. Gemma additionally
    covers the decoupled head_dim + in-module sqrt(hidden) embedding
    scaling."""
    from bayeformers_tpu.models import llama as llama_lib
    from bayeformers_tpu.parallel import train as ptrain
    from bayeformers_tpu.workloads.gpt2_lm import lm_loss, lm_nll_sum
    from bayeformers_tpu.models.gpt2 import synthetic_lm_batch

    bundle = llama_lib.build_llama_family(family, size="tiny", seed=0)
    params = jax.tree.map(
        lambda a: jnp.where(a == 0, jnp.full_like(a, 0.01), a), bundle.params
    )
    ids = synthetic_lm_batch(
        np.random.default_rng(0), 8, 16, bundle.config.vocab_size
    )["input_ids"]
    batch = {"input_ids": ids}

    bmodel, bp = bf.to_bayesian(bundle.apply_fn, params, delta=1e-4,
                                freeze=True)
    mesh = mesh_lib.make_mesh(2, 2)
    bp_sh = mesh_lib.shard_bayes_params(bp, mesh)
    tx = masked_optimizer(optax.sgd(1e-3), bmodel.trainable_mask(bp))
    step = ptrain.make_train_step(
        bmodel, tx, 3, 10, mesh, loss_fn=lm_loss,
        input_keys=("input_ids",), estimator="fused",
    )
    batch_sh = _dp_shard(batch, mesh)
    bp2, opt2, m = step(bp_sh, tx.init(bp_sh), jax.random.key(3), batch_sh)

    freq_nll = float(lm_nll_sum(bundle.apply_fn(params, ids), ids))
    np.testing.assert_allclose(float(m["nll"]), freq_nll, rtol=2e-3)
    assert np.isfinite(float(m["loss"]))
    # tp leaves really are distributed and rho trains
    ck = "model/layers/0/self_attn/k_proj/kernel"
    assert len(bp2.rho[ck].sharding.device_set) == 4
    assert not np.array_equal(np.asarray(bp2.rho[ck]),
                              np.asarray(bp_sh.rho[ck]))
    bp3, _, m3 = step(bp2, opt2, jax.random.key(4), batch_sh)
    assert np.isfinite(float(m3["loss"]))


def test_sp_mesh_construction_and_batch_sharding():
    """sp>1 adds a third mesh axis; shard_batch shards rank>=2 leaves
    (B, L) over (dp, sp) and rank-1 leaves over dp only."""
    mesh = mesh_lib.make_mesh(2, 2, 2)
    assert mesh.shape == {"dp": 2, "tp": 2, "sp": 2}
    # sp=1 keeps the two-axis mesh (shard_map tier compatibility)
    assert mesh_lib.make_mesh(4, 2).shape == {"dp": 4, "tp": 2}
    mesh = mesh_lib.make_mesh(2, 1, 4)
    batch = {"input_ids": jnp.zeros((8, 16), jnp.int32),
             "labels": jnp.zeros((8,), jnp.int32)}
    sharded = mesh_lib.shard_batch(batch, mesh)
    P = jax.sharding.PartitionSpec
    assert sharded["input_ids"].sharding.spec == P("dp", "sp")
    assert sharded["labels"].sharding.spec == P("dp")


@pytest.mark.slow
def test_sequence_parallel_gspmd_matches_single_device(tiny_bert):
    """MC-ELBO loss with the token axis sharded over sp (GSPMD sequence
    parallelism — layout only, XLA inserts attention's collectives): same
    value as single-device, composed with dp and with tp."""
    _, bmodel, bp = tiny_bert
    batch = bert_lib.synthetic_batch(np.random.default_rng(7), 8, 16, 1024, 2)
    labels = batch.pop("labels")

    def loss_fn(bparams, inputs, labels):
        out, aux = bmodel.mc_apply(bparams, jax.random.key(11), 2, **inputs)
        nll = bf.elbo.cross_entropy_sum(bf.elbo.mc_logits_mean(out), labels)
        return bf.elbo.elbo_loss(
            nll, aux["log_prior"], aux["log_variational_posterior"], 10
        )

    loss_single = float(jax.jit(loss_fn)(bp, batch, labels))
    for dp, tp, sp in ((2, 1, 4), (2, 2, 2), (1, 1, 8)):
        mesh = mesh_lib.make_mesh(dp, tp, sp)
        bp_sharded = mesh_lib.shard_bayes_params(bp, mesh)
        inputs = mesh_lib.shard_batch(batch, mesh)
        labels_s = mesh_lib.shard_batch(labels, mesh)
        loss_sharded = float(jax.jit(loss_fn)(bp_sharded, inputs, labels_s))
        np.testing.assert_allclose(loss_single, loss_sharded, rtol=1e-4,
                                   err_msg=f"dp={dp} tp={tp} sp={sp}")


def test_sp_refused_on_the_fused_tier(tmp_path):
    """The workload CLIs must refuse sp>1 outside the GSPMD tier (Pallas
    kernels are opaque to the partitioner) rather than mis-shard."""
    from bayeformers_tpu.workloads import bert_glue

    with pytest.raises(ValueError, match="GSPMD tier"):
        bert_glue.train(
            logs=str(tmp_path), size="tiny", batch_size=4, samples=2,
            estimator="fused", sp=2, limit_batches=1,
        )
