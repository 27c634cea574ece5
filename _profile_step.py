"""Trace the fused bf16 train step and aggregate TPU op time from xplane."""
import glob
import os
import sys
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np
import optax

import bayeformers_tpu as bf
from bayeformers_tpu.models import bert as bert_lib
from bayeformers_tpu.utils.optim import masked_optimizer

S, B, L = 10, 8, 128
MODE = sys.argv[1] if len(sys.argv) > 1 else "fused"

bundle = bert_lib.build_bert(task="classification", n_labels=2, size="base",
                             dtype=jnp.bfloat16)
bmodel, bparams = bf.to_bayesian(bundle.apply_fn, bundle.params, delta=0.05,
                                 freeze=True)
batch = bert_lib.synthetic_batch(np.random.default_rng(0), B, L,
                                 bundle.config.vocab_size, 2)
labels = batch.pop("labels")
tx = masked_optimizer(optax.adamw(2e-5), bmodel.trainable_mask(bparams))
opt_state = tx.init(bparams)
mc = {"fused": bmodel.mc_apply_fused, "naive": bmodel.mc_apply,
      "flipout": bmodel.mc_apply_flipout, "floor": None}[MODE]
n_samples = 1 if MODE == "flipout" else S

if MODE == "floor":
    # frequentist floor: same S*B super-batch, shared weights
    big = {k: jnp.concatenate([v] * S, 0) for k, v in batch.items()}
    big_labels = jnp.concatenate([labels] * S, 0)
    ftx = optax.adamw(2e-5)
    fstate = ftx.init(bundle.params)

    @jax.jit
    def step(params, opt_state, key):
        def loss_fn(p):
            logits = bundle.apply_fn(p, **big)
            return bf.elbo.cross_entropy_sum(logits, big_labels)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = ftx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    bparams, opt_state = bundle.params, fstate


if MODE == "floor":
    step_defined = True
else:
    step_defined = False

@jax.jit
def _bayes_step(bparams, opt_state, key):
    def loss_fn(bparams):
        out, aux = mc(bparams, key, n_samples, **batch)
        nll = bf.elbo.cross_entropy_sum(bf.elbo.mc_logits_mean(out), labels)
        return bf.elbo.elbo_loss(
            nll, aux["log_prior"], aux["log_variational_posterior"], 100
        )
    loss, grads = jax.value_and_grad(loss_fn)(bparams)
    updates, opt_state = tx.update(grads, opt_state, bparams)
    return optax.apply_updates(bparams, updates), opt_state, loss


if not step_defined:
    step = _bayes_step

key = jax.random.key(0)
# warm up / compile
bparams, opt_state, loss = step(bparams, opt_state, key)
float(loss)

trace_dir = "/tmp/xprof_" + MODE
os.system(f"rm -rf {trace_dir}")
jax.profiler.start_trace(trace_dir)
for i in range(3):
    key, k = jax.random.split(key)
    bparams, opt_state, loss = step(bparams, opt_state, k)
float(loss)
jax.profiler.stop_trace()

# ---- parse xplane ----------------------------------------------------------
from tensorflow.tsl.profiler.protobuf import xplane_pb2

paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
assert paths, f"no xplane under {trace_dir}"
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(paths[0], "rb").read())

for plane in xs.planes:
    if "TPU" not in plane.name and "tpu" not in plane.name:
        continue
    ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
    tot = defaultdict(int)
    n = defaultdict(int)
    grp = defaultdict(int)
    plane_total = 0
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            name = ev_meta.get(ev.metadata_id, "?")
            base = name.lstrip("%").split(" ")[0].split(".")[0]
            tot[name] += ev.duration_ps
            grp[base] += ev.duration_ps
            n[name] += 1
            plane_total += ev.duration_ps
    if not tot:
        continue
    print(f"== plane: {plane.name}")
    print(f"total sync op time: {plane_total/1e12*1e3/3:.2f} ms/step (3 steps)")
    print("-- by op family:")
    for base, ps in sorted(grp.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{ps/1e12*1e3/3:8.3f} ms  {base}")
    print("-- top individual ops:")
    items = sorted(tot.items(), key=lambda kv: -kv[1])
    for name, ps in items[:12]:
        print(f"{ps/1e12*1e3/3:8.3f} ms  x{n[name]:4d}  {name[:120]}")
    print("-- top copy/reshape/slice ops:")
    shown = 0
    for name, ps in items:
        base = name.lstrip("%").split(" ")[0].split(".")[0]
        if base in ("copy", "reshape", "copy-done", "slice-done", "bitcast"):
            print(f"{ps/1e12*1e3/3:8.3f} ms  x{n[name]:4d}  {name[:140]}")
            shown += 1
            if shown >= 20:
                break
