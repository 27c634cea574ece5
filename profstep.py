"""Profile the antithetic train step and print top ops by self time."""
import glob
import gzip
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

import bench
from bayeformers_tpu.models import bert as bert_lib

mode = sys.argv[1] if len(sys.argv) > 1 else "antithetic"
outdir = f"/tmp/prof_{mode}"

bundle = bert_lib.build_bert(task="classification", n_labels=2, size="base")
batch = bert_lib.synthetic_batch(
    np.random.default_rng(0), bench.B, bench.L, bundle.config.vocab_size, 2
)
labels = batch.pop("labels")
inputs = batch

bmodel, bparams = bench.build(jnp.bfloat16)
import optax

from bayeformers_tpu import elbo as elbo_lib

opt = optax.adamw(2e-5)
opt_state = opt.init(bparams)
apply = {
    "antithetic": lambda bp, key: bmodel.mc_apply_fused(
        bp, key, bench.S, antithetic=True, **inputs
    ),
    "fused": lambda bp, key: bmodel.mc_apply_fused(bp, key, bench.S, **inputs),
}[mode]


@jax.jit
def step(bparams, opt_state, i):
    key = jax.random.fold_in(jax.random.key(0), i)

    def loss_fn(bp):
        out, aux = apply(bp, key)
        logits = out.logits if hasattr(out, "logits") else out
        nll = elbo_lib.cross_entropy_sum(elbo_lib.mc_logits_mean(logits), labels)
        return elbo_lib.elbo_loss(
            nll, aux["log_prior"], aux["log_variational_posterior"], bench.S
        )

    loss, grads = jax.value_and_grad(loss_fn)(bparams)
    updates, opt_state = opt.update(grads, opt_state, bparams)
    return optax.apply_updates(bparams, updates), opt_state, loss


bparams, opt_state, loss = step(bparams, opt_state, 0)
jax.block_until_ready(loss)
with jax.profiler.trace(outdir):
    for i in range(1, 4):
        bparams, opt_state, loss = step(bparams, opt_state, i)
    jax.block_until_ready(loss)

traces = glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True)
print("traces:", traces)
ev_by_name = {}
with gzip.open(traces[0], "rt") as f:
    data = json.load(f)
for ev in data.get("traceEvents", []):
    if ev.get("ph") != "X":
        continue
    pidname = ev.get("pid")
    name = ev.get("name", "")
    dur = ev.get("dur", 0)
    ev_by_name.setdefault(name, [0, 0])
    ev_by_name[name][0] += dur
    ev_by_name[name][1] += 1
top = sorted(ev_by_name.items(), key=lambda kv: -kv[1][0])[:45]
for name, (dur, cnt) in top:
    print(f"{dur/3e3:9.3f} ms/step  x{cnt:4d}  {name[:110]}")
