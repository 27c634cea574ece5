"""S-sweep of the antithetic step: marginal per-sample cost + floor.

step(S) = a + b*S decomposition for the PERF.md wall analysis.
Run from /root/repo: python -u .scratch/ssweep.py
"""
import numpy as np
import jax.numpy as jnp

import bench
from bayeformers_tpu.models import bert as bert_lib

bundle = bert_lib.build_bert(task="classification", n_labels=2, size="base")
batch = bert_lib.synthetic_batch(
    np.random.default_rng(0), bench.B, bench.L, bundle.config.vocab_size, 2
)
labels = batch.pop("labels")
inputs = batch

t_floor = bench.bench_frequentist_floor(inputs, labels)
print(f"floor_bf16: {t_floor[0]*1e3:.2f} ms", flush=True)

bmodel16, bparams16 = bench.build(jnp.bfloat16)
for s in (2, 6, 10):
    t = bench.bench_train(bmodel16, bparams16, inputs, labels, "antithetic",
                          n_samples=s)
    print(f"anti_S{s}: {t[0]*1e3:.2f} ms", flush=True)
