"""Probe: can random-init bert-base learn the synthetic task? (phase A only)

One compile, lr injected as a hyperparam so several configs reuse it.
"""
import time
import jax, jax.numpy as jnp, numpy as np, optax
from bayeformers_tpu.workloads import bert_glue as wg
from bayeformers_tpu.models import bert as bert_lib
import bayeformers_tpu as bf

train_data, dev_data, _ = wg.load_glue(None, 30522, 0)
print("train n:", train_data["labels"].shape, flush=True)

bundle = bert_lib.build_bert(task="classification", n_labels=2, size="base",
                             dtype=jnp.bfloat16)
keys = ("input_ids", "attention_mask", "token_type_ids")

tx = optax.inject_hyperparams(optax.adamw)(learning_rate=1e-4)

@jax.jit
def f_step(params, opt_state, batch, lr):
    opt_state.hyperparams["learning_rate"] = lr
    def obj(p):
        logits = bundle.apply_fn(p, **{k: batch[k] for k in keys})
        return bf.elbo.cross_entropy_sum(logits, batch["labels"])
    loss, grads = jax.value_and_grad(obj)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss

@jax.jit
def f_eval(params, batch):
    logits = bundle.apply_fn(params, **{k: batch[k] for k in keys})
    return jnp.argmax(logits, -1)

def dev_acc(params):
    accs = []
    for b in wg.batch_iter(dev_data, 32):
        accs.append(np.asarray(f_eval(params, b)) == np.asarray(b["labels"]))
    return float(np.concatenate(accs).mean())

for peak_lr, wfrac, steps in ((3e-4, 0.1, 600),):
    params = bert_lib.build_bert(task="classification", n_labels=2,
                                 size="base", dtype=jnp.bfloat16, seed=0).params
    opt_state = tx.init(params)
    warm = int(steps * wfrac)
    t0 = time.time()
    it = 0
    for epoch in range(100):
        done = False
        for b in wg.batch_iter(train_data, 8, seed=epoch):
            lr = peak_lr * (it + 1) / warm if it < warm else \
                 peak_lr * max(0.0, 1 - (it - warm) / (steps - warm))
            params, opt_state, loss = f_step(params, opt_state, b,
                                             jnp.float32(lr))
            it += 1
            if it % 100 == 0:
                print(f"lr={peak_lr} step {it} loss={float(loss):.3f} "
                      f"dev_acc={dev_acc(params):.3f} "
                      f"({time.time()-t0:.0f}s)", flush=True)
            if it >= steps:
                done = True
                break
        if done:
            break
    print(f"FINAL lr={peak_lr} warmup={wfrac}: dev_acc={dev_acc(params):.3f}",
          flush=True)
