import time

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from bayeformers_tpu.parallel import transformer as tfm  # noqa: E402

V, T, D = 17, 8, 16


def _lm_batch(seed, B):
    rng = np.random.default_rng(seed)
    half = T // 2
    seq = rng.integers(0, V, size=(B, half)).astype(np.int32)
    seq = np.concatenate([seq, seq], axis=1)
    tokens, targets = seq[:, :-1], seq[:, 1:]
    mask = np.zeros_like(targets)
    mask[:, half - 1:] = 1
    return {"tokens": jnp.asarray(tokens), "targets": jnp.asarray(targets),
            "eval_mask": jnp.asarray(mask)}


stack = tfm.TransformerStack(n_blocks=2, d_model=D, n_heads=2, d_ff=32)
params = tfm.lm_init(stack, V, T, jax.random.key(2))
tx = optax.adam(3e-3)
step = tfm.make_single_lm_train_step(stack, tx, n_samples=1, n_batches=8)
opt_state = tx.init(params)
key = jax.random.key(5)
t0 = time.time()
for it in range(400):
    batch = _lm_batch(100 + (it % 8), 32)
    key, skey = jax.random.split(key)
    params, opt_state, metrics = step(params, opt_state, skey, batch)
    if it % 50 == 0 or it == 399:
        print(it, {k: round(float(v), 4) for k, v in metrics.items()},
              round(time.time() - t0, 1))
