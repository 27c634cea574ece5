"""Probe: copy-free stacked mha FORWARD variants vs the committed kernel.

Round-4 microbenches (PERF.md) localized the residual Pallas-vs-XLA forward
gap (0.184 vs 0.074 ms/layer) to fixed per-grid-step overhead that is NOT
dot-, store-, or slice-bound. Remaining suspects: the materialized full-
buffer passes the committed kernel still pays per grid step —
jnp.concatenate of 48 score tiles (3.1 MB write+read), the jnp.repeat bias
buffer (another (T, L) f32 materialize + add), and the 12-way output
concatenate per example. These variants eliminate them:

  v5a: score dots stored straight into a VMEM scratch slab with the bias
       row added AT STORE TIME (fused into the dot epilogue), ONE softmax
       chain reading the slab and writing a bf16 p-slab (halves the write
       + phase-3 read traffic), AV dots reading p-slab slices and storing
       strided into o_ref (no output concatenate).
  v5b: same, but the softmax chain runs per-example-slab (smaller live
       temps) instead of one (T, L) pass.

    python probe_mha_v5.py [f32]

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


def _kern_v5(n_heads, causal, slab_softmax, q_ref, k_ref, v_ref, bias_ref,
             o_ref, s_ref, p_ref):
    nb, L, H = q_ref.shape
    d = H // n_heads
    scale = 1.0 / math.sqrt(d)
    prec = config.kernel_dot_precision(q_ref.dtype)
    keep = None
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
        keep = cols <= rows
    # phase 1: score dots stored straight into the f32 slab, bias fused
    for b in range(nb):
        qb = q_ref[b]
        kb = k_ref[b]
        bias_row = bias_ref[b, 0, :]
        for h in range(n_heads):
            qh = jax.lax.slice(qb, (0, h * d), (L, (h + 1) * d))
            kh = jax.lax.slice(kb, (0, h * d), (L, (h + 1) * d))
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            ) * scale + bias_row[None, :]
            if causal:
                s = jnp.where(keep, s, at.NEG_BIG)
            i = b * n_heads + h
            s_ref[i * L:(i + 1) * L, :] = s
    # phase 2: softmax chain slab -> bf16 p-slab
    if slab_softmax:
        for b in range(nb):
            lo, hi = b * n_heads * L, (b + 1) * n_heads * L
            p_ref[lo:hi, :] = jax.nn.softmax(
                s_ref[lo:hi, :], axis=-1
            ).astype(p_ref.dtype)
    else:
        p_ref[:, :] = jax.nn.softmax(s_ref[:, :], axis=-1).astype(p_ref.dtype)
    # phase 3: AV dots, strided output stores
    for b in range(nb):
        vb = v_ref[b]
        for h in range(n_heads):
            i = b * n_heads + h
            ph = p_ref[i * L:(i + 1) * L, :]
            o = jnp.dot(
                ph, jax.lax.slice(vb, (0, h * d), (L, (h + 1) * d)),
                preferred_element_type=jnp.float32,
                precision=config.kernel_dot_precision(vb.dtype),
            )
            o_ref[b, :, h * d:(h + 1) * d] = o.astype(o_ref.dtype)


def mha_v5_fwd(q, k, v, bias, n_heads, causal=False, nb=4,
               slab_softmax=False):
    Nq, L, H = q.shape
    Np = -(-Nq // nb) * nb
    qp, kp, vp = (at._pad_n(a, Np) for a in (q, k, v))
    biasp = at._pad_n(bias.astype(jnp.float32), Np)[:, None, :]
    spec = pl.BlockSpec((nb, L, H), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((nb, 1, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    T = nb * n_heads * L
    out = pl.pallas_call(
        functools.partial(_kern_v5, n_heads, causal, slab_softmax),
        grid=(Np // nb,),
        in_specs=[spec, spec, spec, bspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((Np, L, H), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((T, L), jnp.float32),
            pltpu.VMEM((T, L), jnp.bfloat16 if q.dtype == jnp.bfloat16
                       else jnp.float32),
        ],
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
    variants = [
        ("pallas-committed", lambda: at._mha_pallas_fwd(q, k, v, bias, HEADS)),
        ("v5a-nb4", lambda: mha_v5_fwd(q, k, v, bias, HEADS, nb=4)),
        ("v5a-nb2", lambda: mha_v5_fwd(q, k, v, bias, HEADS, nb=2)),
        ("v5b-nb4-slab",
         lambda: mha_v5_fwd(q, k, v, bias, HEADS, nb=4, slab_softmax=True)),
        ("v5a-nb8", lambda: mha_v5_fwd(q, k, v, bias, HEADS, nb=8)),
    ]
    ok = {}
    for name, op in variants:
        try:
            out = op()
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            print(f"{name}: max|diff vs xla| = {err:.2e}", flush=True)
            ok[name] = op
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    def chain(op):
        def f(x, _):
            out = op()
            m = jnp.mean(out.astype(jnp.float32))
            return x + 0.0 * m.astype(x.dtype), m
        return f

    # timing chains perturb q so no two scanned steps are identical
    def chain_q(op):
        def f(x, _):
            out = op(q + x)
            m = jnp.mean(out.astype(jnp.float32))
            return x + 0.0 * m.astype(x.dtype), m
        return f

    x0 = jnp.zeros((), dtype)
    timed = [("xla fwd", lambda q_: at._mha_xla(q_, k, v, bias, HEADS)),
             ("pallas committed fwd",
              lambda q_: at._mha_pallas_fwd(q_, k, v, bias, HEADS))]
    timed += [(name, (lambda op: lambda q_: None)(None)) for name in []]
    for name, op in variants[1:]:
        if name in ok:
            def make(opname):
                if "nb2" in opname:
                    nbv = 2
                elif "nb8" in opname:
                    nbv = 8
                else:
                    nbv = 4
                slab = "slab" in opname
                return lambda q_: mha_v5_fwd(q_, k, v, bias, HEADS, nb=nbv,
                                             slab_softmax=slab)
            timed.append((name, make(name)))
    for name, op in timed:
        try:
            t, _ = bench.timeit_scan(chain_q(op), x0, NSCAN, OUTER)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            continue
        print(f"{name} {jnp.dtype(dtype).name}: {t*1e3:.3f} ms "
              f"(x12 layers {t*12*1e3:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
