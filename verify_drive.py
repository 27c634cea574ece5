"""Verify drive: 4-phase recipe through the public API on the real TPU.

``BAYEFORMERS_VERIFY_CPU=1`` forces the CPU backend — for tunnel-down
windows only; the canonical drive is the real chip."""
import os
import time
import jax

if os.environ.get("BAYEFORMERS_VERIFY_CPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np, optax
import flax.linen as nn

import bayeformers_tpu as bf
from bayeformers_tpu.utils.optim import masked_optimizer

print("backend:", jax.default_backend(), jax.devices(), flush=True)
if os.environ.get("BAYEFORMERS_VERIFY_CPU"):
    print("!!! CPU-FORCED RUN (tunnel-down fallback), not the real chip",
          flush=True)
else:
    assert jax.default_backend() != "cpu"

# synthetic separable data
rng = np.random.default_rng(0)
X = rng.normal(size=(512, 32)).astype(np.float32)
w_true = rng.normal(size=(32,))
y = (X @ w_true > 0).astype(np.int64)
X, y = jnp.asarray(X), jnp.asarray(y)

class Net(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(64)(x))
        return nn.Dense(2)(x)

net = Net()
params = net.init(jax.random.key(0), X[:1])["params"]
apply_fn = lambda p, x: net.apply({"params": p}, x)

# Phase A: frequentist
tx = optax.adam(1e-2)
opt = tx.init(params)
@jax.jit
def fstep(p, opt):
    def loss(p):
        return bf.elbo.cross_entropy_sum(apply_fn(p, X), y)
    l, g = jax.value_and_grad(loss)(p)
    u, opt = tx.update(g, opt, p)
    return optax.apply_updates(p, u), opt, l
for i in range(150):
    params, opt, l = fstep(params, opt)
acc_freq = float(jnp.mean(jnp.argmax(apply_fn(params, X), -1) == y))
print(f"phase A freq acc={acc_freq:.3f} loss={float(l):.3f}", flush=True)
assert acc_freq > 0.95

# probe: to_bayesian without rng -> ValueError
try:
    bf.to_bayesian(apply_fn, params)
    raise SystemExit("expected ValueError for missing rng")
except ValueError as e:
    print("probe rng ValueError ok:", str(e)[:50], flush=True)

# Phase B: conversion
bmodel, bp = bf.to_bayesian(apply_fn, params, delta=0.05, freeze=True)
assert set(bmodel.spec.paths) == {
    "Dense_0/kernel", "Dense_0/bias", "Dense_1/kernel", "Dense_1/bias"
}, bmodel.spec.paths

# Phase C: MOPED eval preserves accuracy (naive + fused tiers on TPU)
out, aux = bmodel.mc_apply(bp, jax.random.key(1), 10, X)
acc, acc_std = bf.elbo.accuracy_and_std(out, y)
print(f"phase C naive acc={float(acc):.3f} acc_std={float(acc_std):.4f}", flush=True)
# acc_std == 0 is CORRECT on a separable toy (margins >> MOPED jitter;
# probe_draws.py analysis) — draw disagreement is probed at the logit level
draw_std = float(jnp.std(out.astype(jnp.float32), axis=0).mean())
print(f"phase C cross-draw logit std={draw_std:.4f}", flush=True)
assert float(acc) > 0.93 and draw_std > 1e-4
outf, auxf = bmodel.mc_apply_fused(bp, jax.random.key(1), 10, X)
accf, _ = bf.elbo.accuracy_and_std(outf, y)
print(f"phase C fused acc={float(accf):.3f}", flush=True)
assert float(accf) > 0.93
# determinism probes on the fused TPU path
outf2, _ = bmodel.mc_apply_fused(bp, jax.random.key(1), 10, X)
assert np.array_equal(np.asarray(outf), np.asarray(outf2)), "same key differs"
outf3, _ = bmodel.mc_apply_fused(bp, jax.random.key(2), 10, X)
assert not np.allclose(np.asarray(outf), np.asarray(outf3)), "diff key equal"
print("determinism probes ok", flush=True)

# antithetic estimator on TPU
outa, auxa = bmodel.mc_apply_fused(bp, jax.random.key(3), 10, X, antithetic=True)
acca, _ = bf.elbo.accuracy_and_std(outa, y)
print(f"antithetic acc={float(acca):.3f}", flush=True)
assert float(acca) > 0.9

# local reparameterization estimator (nn/lrt.py): MOPED eval preserves
# accuracy, predictive spread matches the weight-space tier's scale
outl, auxl = bmodel.mc_apply_lrt(bp, jax.random.key(4), 10, X)
accl, _ = bf.elbo.accuracy_and_std(outl, y)
std_l = float(jnp.std(outl.astype(jnp.float32), axis=0).mean())
print(f"local acc={float(accl):.3f} logit-std={std_l:.4f} "
      f"kl={float(auxl['kl']):.1f}", flush=True)
assert float(accl) > 0.9 and std_l > 1e-4
assert 0.2 < std_l / draw_std < 5.0, (std_l, draw_std)

# Phase D: ELBO train, frozen mu bit-identical, loss trends down
btx = masked_optimizer(optax.adam(1e-3), bmodel.trainable_mask(bp))
bopt = btx.init(bp)
mu_before = np.asarray(bp.params["Dense_0"]["kernel"]).copy()
@jax.jit
def bstep(bp, bopt, key):
    def loss(bp):
        out, aux = bmodel.mc_apply_fused(bp, key, 10, X)
        nll = bf.elbo.cross_entropy_sum(bf.elbo.mc_logits_mean(out), y)
        return bf.elbo.elbo_loss(nll, aux["log_prior"],
                                 aux["log_variational_posterior"], 1)
    l, g = jax.value_and_grad(loss)(bp)
    u, bopt = btx.update(g, bopt, bp)
    return optax.apply_updates(bp, u), bopt, l
losses = []
for i in range(100):
    bp, bopt, l = bstep(bp, bopt, jax.random.fold_in(jax.random.key(9), i))
    losses.append(float(l))
print(f"phase D loss {losses[0]:.1f} -> {losses[-1]:.1f}", flush=True)
assert losses[-1] < losses[0]
assert np.array_equal(mu_before, np.asarray(bp.params["Dense_0"]["kernel"])), \
    "frozen mu changed"
print("phase D frozen-mu + loss-down ok", flush=True)

# round-3 surface: fused estimator INSIDE shard_map on the real chip (dp=1)
from bayeformers_tpu.models import bert as bert_lib
from bayeformers_tpu.parallel import train as ptrain
bundle = bert_lib.build_bert(task="classification", n_labels=2, size="tiny",
                             hidden_size=256, num_attention_heads=4,
                             intermediate_size=512)
bm2, bp2 = bf.to_bayesian(bundle.apply_fn, bundle.params, delta=0.05, freeze=True)
batch = bert_lib.synthetic_batch(np.random.default_rng(1), 8, 16, 1024, 2)
tx2 = masked_optimizer(optax.sgd(1e-3), bm2.trainable_mask(bp2))
mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:1]), ("dp",))
step = ptrain.make_train_step(bm2, tx2, 2, 10, mesh, estimator="fused")
bp2r = ptrain.replicate(bp2, mesh)
bsh = jax.tree.map(lambda a: jax.device_put(
    a, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("dp"))), batch)
t0 = time.time()
bp2r, _, m = step(bp2r, tx2.init(bp2r), jax.random.key(5), bsh)
print(f"shard_map+Pallas on TPU: loss={float(m['loss']):.2f} "
      f"nll={float(m['nll']):.2f} (compile+run {time.time()-t0:.1f}s)", flush=True)
assert np.isfinite(float(m["loss"]))

# round-3 surface: GPT-2 decoder family through the Conv1D interception on
# the real chip (fused + antithetic estimators)
from bayeformers_tpu.models import gpt2 as gpt2_lib
g = gpt2_lib.build_gpt2(size="tiny", seed=0)
gp = jax.tree.map(lambda a: jnp.where(a == 0, jnp.full_like(a, 0.01), a),
                  g.params)
gbm, gbp = bf.to_bayesian(g.apply_fn, gp, delta=0.05, freeze=True)
gids = gpt2_lib.synthetic_lm_batch(np.random.default_rng(3), 4, 32,
                                   g.config.vocab_size)["input_ids"]
gout, gaux = gbm.mc_apply_fused(gbp, jax.random.key(7), 2, gids)
assert gout.shape == (2, 4, 32, g.config.vocab_size)
assert np.isfinite(np.asarray(gaux["log_variational_posterior"])).all()
gout2, _ = gbm.mc_apply_fused(gbp, jax.random.key(7), 2, gids,
                              antithetic=True)
assert np.isfinite(np.asarray(gout2, np.float32)).all()
print("gpt2 conv1d interception on TPU ok", flush=True)

# posterior-predictive generation on the real chip (KV-cache decode loop)
from bayeformers_tpu.generation import mc_generate
gen = mc_generate(g.hf_model, gbm, gbp, jax.random.key(11), gids[:2, :8],
                  n_samples=2, max_new_tokens=4)
assert gen["sequences"].shape == (2, 2, 12)
print("mc_generate on TPU ok", flush=True)

# LLaMA-architecture family (GQA + rotary + gated MLP) through the fused
# GQA attention handler on the real chip, sigma->0 parity vs stock forward
from bayeformers_tpu.models import llama as llama_lib
ll = llama_lib.build_llama(size="tiny", seed=0)
lp = jax.tree.map(lambda a: jnp.where(a == 0, jnp.full_like(a, 0.01), a),
                  ll.params)
lbm, lbp = bf.to_bayesian(ll.apply_fn, lp, delta=1e-4, freeze=True)
lids = gpt2_lib.synthetic_lm_batch(np.random.default_rng(6), 2, 16,
                                   ll.config.vocab_size)["input_ids"]
lfreq = ll.apply_fn(lp, lids)
lout, laux = lbm.mc_apply_fused(lbp, jax.random.key(13), 2, lids)
# tolerance sized for the TPU's default bf16-multiply matmul precision
# (~0.8% relative per matmul; measured max diff 0.004 on logits ~0.3) —
# the tight rtol=2e-3 form of this check runs on CPU at 'highest'
# precision in tests/test_llama.py
np.testing.assert_allclose(np.asarray(lout[0], np.float32),
                           np.asarray(lfreq, np.float32),
                           rtol=2e-2, atol=2e-2)
assert np.isfinite(np.asarray(laux["log_variational_posterior"])).all()
lout2, _ = lbm.mc_apply_fused(lbp, jax.random.key(13), 2, lids)
assert np.array_equal(np.asarray(lout), np.asarray(lout2))
print("llama GQA fused attention on TPU ok (sigma->0 parity)", flush=True)

# T5 encoder-decoder family through both tiers on the real chip
from bayeformers_tpu.models import t5 as t5_lib
t = t5_lib.build_t5(size="tiny", seed=0)
tb = t5_lib.synthetic_seq2seq_batch(np.random.default_rng(5), 2, 12, 8,
                                    t.config.vocab_size)
tbm, tbp = bf.to_bayesian(t.apply_fn, t.params, delta=0.05, freeze=True)
tout, taux = tbm.mc_apply_fused(tbp, jax.random.key(12), 2, **tb)
assert tout.shape[:2] == (2, 2)
assert np.isfinite(np.asarray(taux["log_variational_posterior"])).all()
print("t5 fused tier on TPU ok", flush=True)
# native tier: GPT-2 byte-level BPE (bpe.cc) — native backend build, HF file
# format roundtrip, native==python backend agreement
import json, tempfile
from bayeformers_tpu.native import BPETokenizer, gpt2_byte_alphabet
with tempfile.TemporaryDirectory() as td:
    alphabet = gpt2_byte_alphabet()
    merges = ["h e", "l l", "he ll", "hell o", "Ġ w", "Ġw o", "r l",
              "Ġwo rl", "Ġworl d"]
    vocab = {alphabet[b]: b for b in range(256)}
    for i, m in enumerate(merges):
        a, b = m.split(" ")
        vocab[a + b] = 256 + i
    vp, mp = f"{td}/vocab.json", f"{td}/merges.txt"
    open(vp, "w").write(json.dumps(vocab, ensure_ascii=False))
    open(mp, "w").write("#version: 0.2\n" + "\n".join(merges) + "\n")
    bpe = BPETokenizer(vp, mp)
    pybpe = BPETokenizer(vp, mp, force_python=True)
    sample = "hello world  héllo\tworlds!! "
    assert bpe.decode(bpe.encode(sample)) == sample
    assert bpe.encode(sample) == pybpe.encode(sample)
    print(f"native BPE ok (backend={bpe.backend})", flush=True)
    # real-text causal-LM data path over the BPE tier
    from bayeformers_tpu.utils.data import load_lm_corpus
    open(f"{td}/doc.txt", "w").write("hello world " * 300)
    tr_ids, te_ids, v, eot = load_lm_corpus(f"{td}/doc.txt", seq=16)
    assert tr_ids.shape[1] == 16 and len(te_ids) >= 1 and tr_ids.max() < v
    print(f"load_lm_corpus ok ({len(tr_ids)} train windows, vocab {v})",
          flush=True)
    # raw-text serving: Predictor.predict_texts through the BPE tier
    from bayeformers_tpu.serving import Predictor
    from bayeformers_tpu.models import gpt2 as gpt2_lib2
    sg = gpt2_lib2.build_gpt2(size="tiny", seed=0, vocab_size=v)
    sgp = jax.tree.map(
        lambda a: jnp.where(a == 0, jnp.full_like(a, 0.01), a), sg.params
    )
    sbm, sbp = bf.to_bayesian(sg.apply_fn, sgp, delta=0.05, freeze=True)
    spred = Predictor(sbm, sbp, n_samples=2, batch_sizes=(2,),
                      seq_lens=(16,), task="causal-lm", top_k=4,
                      input_keys=("input_ids", "attention_mask"))
    sout = spred.predict_texts(["hello world", "hello"], tokenizer=bpe,
                               seed=7)
    assert sout["topk_ids"].shape == (2, 4)
    assert all(isinstance(t, str) for t in sout["topk_tokens"][0])
    print("raw-text serving (predict_texts) on TPU ok", flush=True)

# pipeline parallelism: the GPipe shard_map schedule on a 1-device pp mesh
# (the real chip) — compiles Pallas-inside-shard_map with ppermute/psum and
# must reproduce the sequential stacked forward exactly
from jax.sharding import NamedSharding, PartitionSpec as PS
from bayeformers_tpu.parallel import pipeline as pp_lib
stack = pp_lib.BlockStack(n_blocks=2, features=128)
sparams = stack.init_stack(jax.random.key(3))
px = jnp.asarray(rng.normal(size=(4, 128)).astype(np.float32))
pkey = jax.random.key(4)
h_ref, lq_ref, lp_ref = px, 0.0, 0.0
for l in range(2):
    leaf = {k: v[l] for k, v in sparams.items()}
    h_ref, lqi, lpi = stack.block_apply(leaf, pkey, jnp.int32(l), h_ref)
    lq_ref, lp_ref = lq_ref + lqi, lp_ref + lpi
pmesh = pp_lib.make_pp_mesh(1)
fn = jax.shard_map(
    lambda p, k, xx: pp_lib.pipeline_apply(stack, p, k, xx, pp=1,
                                           n_microbatches=2),
    mesh=pmesh, in_specs=(pp_lib.stack_specs(), PS(), PS()),
    out_specs=(PS(), PS(), PS()), check_vma=False,
)
h_pp, lq_pp, lp_pp = jax.jit(fn)(sparams, pkey, px)
np.testing.assert_allclose(np.asarray(h_pp), np.asarray(h_ref), rtol=2e-3,
                           atol=2e-3)
np.testing.assert_allclose(float(lq_pp), float(lq_ref), rtol=2e-3)
print("pipeline parallel shard_map on TPU ok", flush=True)
print("VERIFY OK", flush=True)
