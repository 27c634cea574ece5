"""On-chip diagnosis: per-draw logit spread on the ambiguous dev rows after
a converged phase A + MOPED conversion (seed 1, template-ambiguity data)."""
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import bayeformers_tpu as bf
from bayeformers_tpu import training
from bayeformers_tpu.models import bert as bert_lib
from bayeformers_tpu.workloads.bert_glue import (
    load_glue, batch_iter, ADAM_EPSILON, CLIP_NORM,
)

EPOCHS, BATCH, LR = 2, 8, 3e-4
bundle = bert_lib.build_model(
    "bert", task="classification", n_labels=2, size="base", seed=1,
    dtype=jnp.bfloat16,
)
train_data, dev_data, _ = load_glue(None, bundle.config.vocab_size, 0)
n_batches = len(train_data["labels"]) // BATCH
total = n_batches * EPOCHS
w = int(total * 0.1)
schedule = optax.join_schedules(
    [optax.linear_schedule(0.0, LR, w), optax.linear_schedule(LR, 0.0, total - w)],
    [w],
)
tx = training.adamw_with_decay_groups(
    schedule, 0.0, training.default_no_decay, eps=ADAM_EPSILON,
    clip_norm=CLIP_NORM,
)
keys = ("input_ids", "attention_mask", "token_type_ids")


@jax.jit
def f_step(params, opt_state, batch):
    def objective(p):
        logits = bundle.apply_fn(p, **{k: batch[k] for k in keys})
        return bf.elbo.cross_entropy_sum(logits, batch["labels"])
    loss, grads = jax.value_and_grad(objective)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss


params = bundle.params
opt_state = tx.init(params)
t0 = time.time()
for ep in range(EPOCHS):
    for batch in batch_iter(train_data, BATCH, seed=ep):
        params, opt_state, loss = f_step(params, opt_state, batch)
print(f"phase A trained in {time.time() - t0:.0f}s", flush=True)

# ambiguous dev rows = signal block equals the interleaved conflict pattern
ids = np.asarray(dev_data["input_ids"])
conf = 4 + (np.arange(8) % 2) * 7
amb = (ids[:, 1:9] == conf[None, :]).all(1)
print("ambiguous dev rows:", int(amb.sum()))

for delta in (0.05, 0.2):
    bmodel, bparams = bf.to_bayesian(
        bundle.apply_fn, params, delta=delta, freeze=True
    )
    sel = np.where(amb)[0][:8]
    sub = {k: jnp.asarray(np.asarray(v)[sel]) for k, v in dev_data.items()}
    out, aux = bmodel.mc_apply_fused(
        bparams, jax.random.key(7), 10, antithetic=True,
        **{k: sub[k] for k in keys},
    )
    o = np.asarray(out, np.float32)  # (S, B, 2)
    margin = o[..., 1] - o[..., 0]   # (S, B)
    print(f"delta={delta}: per-row margin mean {margin.mean(0).round(2)}")
    print(f"           per-row margin std  {margin.std(0).round(3)}")
    flips = (np.sign(margin) != np.sign(margin.mean(0))[None, :]).mean()
    print(f"           argmax flip rate {flips:.3f}", flush=True)

# and on NON-ambiguous rows for contrast
sel = np.where(~amb)[0][:8]
sub = {k: jnp.asarray(np.asarray(v)[sel]) for k, v in dev_data.items()}
bmodel, bparams = bf.to_bayesian(bundle.apply_fn, params, delta=0.05, freeze=True)
out, _ = bmodel.mc_apply_fused(
    bparams, jax.random.key(7), 10, antithetic=True, **{k: sub[k] for k in keys},
)
o = np.asarray(out, np.float32)
margin = o[..., 1] - o[..., 0]
print("clear rows margin mean", margin.mean(0).round(2),
      "std", margin.std(0).round(3))
