"""Probe: L=384 (SQuAD doc-stride) mha FORWARD — round-5 head-grouped
stacked kernel vs the round-4 per-head fallback vs XLA.

    python probe_mha_l384.py [f32]

Accept-or-revert evidence for the grouped _fwd_kernel_stacked
(ops/attention.py); not part of the library.
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import bench
from bayeformers_tpu.ops import attention as at

N, L, H, HEADS = 32, 384, 768, 12
NSCAN, OUTER = 100, 4


def mha_perhead_fwd(q, k, v, bias, n_heads):
    """The round-4 fallback path, forced: per-(example, head) chains."""
    Nq, L, H = q.shape
    nb = at._pick_nb(L, H, q.dtype.itemsize, 5)
    Np = -(-Nq // nb) * nb
    qp, kp, vp = (at._pad_n(a, Np) for a in (q, k, v))
    biasp = at._pad_n(bias.astype(jnp.float32), Np)[:, None, :]
    spec = pl.BlockSpec((nb, L, H), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((nb, 1, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(at._fwd_kernel, n_heads, False),
        grid=(Np // nb,),
        in_specs=[spec, spec, spec, bspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((Np, L, H), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * Np * L * L * H,
            bytes_accessed=4 * Np * L * H * q.dtype.itemsize,
            transcendentals=Np * n_heads * L * L,
        ),
    )(qp, kp, vp, biasp)
    return out[:Nq]


def main():
    dtype = jnp.float32 if (len(sys.argv) > 1 and sys.argv[1] == "f32") \
        else jnp.bfloat16
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(N, L, H)), dtype)
    k = jnp.asarray(rng.normal(size=(N, L, H)), dtype)
    v = jnp.asarray(rng.normal(size=(N, L, H)), dtype)
    mask = np.ones((N, L), np.int32)
    mask[::3, 300:] = 0
    bias = at.mask_to_bias(jnp.asarray(mask))

    print("pick_nb_stacked(L=384, bf16):",
          at._pick_nb_stacked(L, H, HEADS, 2), flush=True)
    ref = at._mha_xla(q, k, v, bias, HEADS)
    for name, op in [
        ("pallas-committed", lambda: at._mha_pallas_fwd(q, k, v, bias, HEADS)),
        ("pallas-perhead", lambda: mha_perhead_fwd(q, k, v, bias, HEADS)),
    ]:
        try:
            out = op()
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        print(f"{name}: max|diff vs xla| = {err:.2e}", flush=True)

    def chain(op):
        def f(x, _):
            out = op(q + x, k, v)
            m = jnp.mean(out.astype(jnp.float32))
            return x + 0.0 * m.astype(x.dtype), m
        return f

    ops = [
        ("xla fwd", lambda q_, k_, v_: at._mha_xla(q_, k_, v_, bias, HEADS)),
        ("pallas committed (grouped-stacked) fwd",
         lambda q_, k_, v_: at._mha_pallas_fwd(q_, k_, v_, bias, HEADS)),
        ("pallas per-head (r4 fallback) fwd",
         lambda q_, k_, v_: mha_perhead_fwd(q_, k_, v_, bias, HEADS)),
    ]
    x0 = jnp.zeros((), dtype)
    for name, op in ops:
        try:
            t, _ = bench.timeit_scan(chain(op), x0, NSCAN, OUTER)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            continue
        print(f"{name} {jnp.dtype(dtype).name} N={N}: {t*1e3:.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
