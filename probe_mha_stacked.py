"""Probe: stacked-softmax mha FORWARD variant vs the committed per-head kernel.

Round-4 microbench evidence (PERF.md) localized the Pallas-vs-XLA attention
gap to the FORWARD and ruled out dot dtype, store layout, and slice style.
Remaining hypothesis: the per-head chains (dot -> softmax -> dot, 48 of them
per grid step) serialize MXU and VPU phases that XLA's head-batched attention
overlaps. This variant runs all 48 score dots back-to-back, ONE softmax
chain over a stacked (nb*heads*L, L) f32 buffer (bias added via one repeated
add), then all 48 AV dots — the same math, phase-batched.

    python probe_mha_stacked.py [f32]

Accept-or-revert evidence for ops/attention.py; not part of the library.
"""
import functools
import math
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import bench
from bayeformers_tpu.ops import attention as at
from bayeformers_tpu.ops import config

N, L, H, HEADS = 80, 128, 768, 12
NSCAN, OUTER = 200, 4


def _fwd_kernel_stacked(n_heads, causal, q_ref, k_ref, v_ref, bias_ref, o_ref):
    nb, L, H = q_ref.shape
    d = H // n_heads
    scale = 1.0 / math.sqrt(d)
    prec = config.kernel_dot_precision(q_ref.dtype)
    # phase 1: all score dots, MXU back-to-back
    tiles = []
    for b in range(nb):
        qb = q_ref[b]
        kb = k_ref[b]
        for h in range(n_heads):
            qh = jax.lax.slice(qb, (0, h * d), (L, (h + 1) * d))
            kh = jax.lax.slice(kb, (0, h * d), (L, (h + 1) * d))
            tiles.append(jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            ))
    T = nb * n_heads * L
    s = jnp.concatenate(tiles, axis=0) * scale  # (T, L) f32, b-major
    # phase 2: one bias add + one softmax chain over the stacked buffer
    bias_rows = bias_ref[:, 0, :]  # (nb, L)
    s = s + jnp.repeat(bias_rows, n_heads * L, axis=0)
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (T, L), 0) % L
        cols = jax.lax.broadcasted_iota(jnp.int32, (T, L), 1)
        s = jnp.where(cols <= rows, s, at.NEG_BIG)
    p = jax.nn.softmax(s, axis=-1)
    # phase 3: all AV dots
    for b in range(nb):
        vb = v_ref[b]
        outs = []
        for h in range(n_heads):
            i = b * n_heads + h
            ph = jax.lax.slice(p, (i * L, 0), ((i + 1) * L, L)).astype(vb.dtype)
            outs.append(jnp.dot(
                ph, jax.lax.slice(vb, (0, h * d), (L, (h + 1) * d)),
                preferred_element_type=jnp.float32,
                precision=config.kernel_dot_precision(vb.dtype),
            ))
        o_ref[b] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def mha_stacked_fwd(q, k, v, bias, n_heads, causal=False, nb=None):
    Nq, L, H = q.shape
    nb = nb or at._pick_nb(L, H, q.dtype.itemsize, 5)
    Np = -(-Nq // nb) * nb
    qp, kp, vp = (at._pad_n(a, Np) for a in (q, k, v))
    biasp = at._pad_n(bias.astype(jnp.float32), Np)[:, None, :]
    spec = pl.BlockSpec((nb, L, H), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((nb, 1, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_stacked, n_heads, causal),
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
    bias = at.mask_to_bias(jnp.ones((N, L), jnp.int32))

    ref = at._mha_xla(q, k, v, bias, HEADS)
    for name, op in [
        ("pallas-committed", lambda: at._mha_pallas_fwd(q, k, v, bias, HEADS)),
        ("pallas-stacked-nb4", lambda: mha_stacked_fwd(q, k, v, bias, HEADS, nb=4)),
        ("pallas-stacked-nb2", lambda: mha_stacked_fwd(q, k, v, bias, HEADS, nb=2)),
        ("pallas-stacked-nb8", lambda: mha_stacked_fwd(q, k, v, bias, HEADS, nb=8)),
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
        ("pallas committed fwd",
         lambda q_, k_, v_: at._mha_pallas_fwd(q_, k_, v_, bias, HEADS)),
        ("pallas stacked nb4 fwd",
         lambda q_, k_, v_: mha_stacked_fwd(q_, k_, v_, bias, HEADS, nb=4)),
        ("pallas stacked nb8 fwd",
         lambda q_, k_, v_: mha_stacked_fwd(q_, k_, v_, bias, HEADS, nb=8)),
    ]
    x0 = jnp.zeros((), dtype)
    for name, op in ops:
        try:
            t, _ = bench.timeit_scan(chain(op), x0, NSCAN, OUTER)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            continue
        print(f"{name} {jnp.dtype(dtype).name}: {t*1e3:.3f} ms "
              f"(x12 layers {t*12*1e3:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
