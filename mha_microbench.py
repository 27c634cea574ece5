"""Isolated mha kernel vs XLA attention math at the headline shape.

Times ONLY the attention op (fwd and fwd+bwd) at the BERT-base recipe's
super-batched shape (N=S*B=80, L=128, H=768, 12 heads), Pallas kernel vs
the XLA reference, using bench.py's chained-scan timing so numbers are
comparable with BENCH_r*.json. Grounds PERF.md's "22 ms vs ~12 ms across
12 layers" attention-gap claim with a direct per-op measurement.

    python mha_microbench.py [dtype]   # bf16 (default) | f32
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

import bench
from bayeformers_tpu.ops import attention as at

N, L, H, HEADS = 80, 128, 768, 12
# NSCAN must amortize the ~29 ms per-dispatch floor far below the signal:
# at 20 scans a 0.3 ms op gives only 6 ms signal per 29 ms dispatch and
# floor variance between runs swamps comparisons (measured fwd > fwd+bwd,
# unphysical); 200 scans puts the signal at 60+ ms
NSCAN, OUTER = 200, 4


def main():
    dtype = jnp.float32 if (len(sys.argv) > 1 and sys.argv[1] == "f32") \
        else jnp.bfloat16
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(N, L, H)), dtype)
    k = jnp.asarray(rng.normal(size=(N, L, H)), dtype)
    v = jnp.asarray(rng.normal(size=(N, L, H)), dtype)
    g = jnp.asarray(rng.normal(size=(N, L, H)), dtype)
    bias = at.mask_to_bias(jnp.ones((N, L), jnp.int32))

    def chain(op):
        """x-perturbed chained op so the runtime cannot dedupe dispatches."""
        def f(x, _):
            out = op(q + x, k, v)
            m = jnp.mean(out.astype(jnp.float32))
            return x + 0.0 * m.astype(x.dtype), m
        return f

    def grad_op(op):
        def f(q_, k_, v_):
            return jnp.sum((op(q_, k_, v_) * g).astype(jnp.float32))
        gfn = jax.grad(f, argnums=(0, 1, 2))
        def run(q_, k_, v_):
            dq, dk, dv = gfn(q_, k_, v_)
            return dq + dk + dv
        return run

    pallas = lambda q_, k_, v_: at.mha(q_, k_, v_, bias, HEADS)
    xla = lambda q_, k_, v_: at._mha_xla(q_, k_, v_, bias, HEADS)

    x0 = jnp.zeros((), dtype)
    for name, op in [("pallas", pallas), ("xla", xla)]:
        t_f, _ = bench.timeit_scan(chain(op), x0, NSCAN, OUTER)
        t_b, _ = bench.timeit_scan(chain(grad_op(op)), x0, NSCAN, OUTER)
        print(f"{name} {jnp.dtype(dtype).name}: fwd {t_f*1e3:.3f} ms  "
              f"fwd+bwd {t_b*1e3:.3f} ms  (x12 layers: "
              f"{t_b*12*1e3:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
