"""Perf lab: targeted step/op timings for kernel experiments on the chip.

Usage (one TPU job at a time; run from /root/repo):

    python perf_lab.py step fused antithetic     # GLUE-recipe step timings
    python perf_lab.py micro                     # per-shape bayes_linear fwd
    python perf_lab.py floor                     # frequentist floor

Reuses bench.py's dispatch-floor-corrected in-jit scan timing so numbers
are comparable with BENCH_r*.json.
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

import bench
from bayeformers_tpu.models import bert as bert_lib


def main(argv):
    if argv and argv[0] == "step":
        argv = argv[1:]
    modes = argv or ["fused", "antithetic"]
    bundle = bert_lib.build_bert(task="classification", n_labels=2, size="base")
    batch = bert_lib.synthetic_batch(
        np.random.default_rng(0), bench.B, bench.L, bundle.config.vocab_size, 2
    )
    labels = batch.pop("labels")
    inputs = batch

    if modes[0] == "floor":
        t = bench.bench_frequentist_floor(inputs, labels)
        print(f"frequentist_floor_bf16: {t[0]*1e3:.2f} / {t[1]*1e3:.2f} ms")
        return
    if modes[0] == "micro":
        micro = bench.bench_matmul_ratio()
        for tag, (ratio, ts, td) in micro.items():
            print(f"{tag}: ratio={ratio:.3f} sampled={ts*1e3:.3f}ms "
                  f"dense={td*1e3:.3f}ms")
        return

    bmodel16, bparams16 = bench.build(jnp.bfloat16)
    for mode in modes:
        t = bench.bench_train(bmodel16, bparams16, inputs, labels, mode)
        print(f"{mode}_bf16_step_ms: {t[0]*1e3:.2f} (median {t[1]*1e3:.2f})",
              flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
