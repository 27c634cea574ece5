"""Multi-head self-attention op that keeps activations in (N, L, H) layout.

Why this exists (measured, PERF.md): the Pallas ``bayes_linear`` custom
calls pin their operands/results to the default (N, L, H) layout, while
XLA's attention implementation wants head-split (N, heads, L, d) layouts —
so every converted attention projection is bracketed by physical transpose
copies (~14 ms/step on the BERT-base recipe, vs ~2 ms in the pure-XLA
frequentist floor where XLA fuses the transposes into neighbouring ops).
This op consumes q/k/v exactly as ``bayes_linear`` emits them and produces
the attention output in the same layout the out-projection consumes, so the
whole attention block runs with zero layout copies; head slicing happens
on-chip inside the kernel.

Semantics mirror HF FLAX attention (`transformers` FlaxBertSelfAttention:
scores = (q/sqrt(d)) @ k^T + bias, bias = 0 where mask>0 else finfo.min,
softmax over keys, @ v) with one deliberate divergence: score ACCUMULATION
and the softmax run in float32 even for bf16 activations (HF computes them
in the model dtype); the MXU dot operands stay in the model dtype — bf16
single-pass matmuls with f32 accumulation, the same contract as this
module's XLA fallback einsums. Forward-only dropout paths bail to the XLA
implementation at the interception layer (nn/fused.py), never here.

The kernel needs no online-softmax tiling: encoder sequences (BERT L<=512)
fit whole (L, L) score matrices in VMEM, so forward and backward are plain
dot/softmax loops over an example-blocked grid. The forward phase-batches
score and AV dots across a HEAD GROUP sized to VMEM (all 12 heads at
L=128, 6 at L=384) — the stacked-softmax formulation that measured 1.95x
over per-head chaining — so long sequences shrink the group instead of
falling back to per-head serialization or KV tiling.
"""
from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bayeformers_tpu.ops import config
from bayeformers_tpu.ops import sampled_linear as split_lib

NEG_BIG = float(jnp.finfo(jnp.float32).min)


def _causal_keep(L: int):
    """(L, L) bool: True where query position may attend key position."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    return cols <= rows


def _mha_xla(q, k, v, bias, n_heads: int, causal: bool = False):
    """Reference/fallback implementation (plain XLA), HF-parity math."""
    N, L, H = q.shape
    d = H // n_heads
    qh = q.reshape(N, L, n_heads, d)
    kh = k.reshape(N, L, n_heads, d)
    vh = v.reshape(N, L, n_heads, d)
    scores = jnp.einsum(
        "nqhd,nkhd->nhqk", qh, kh, preferred_element_type=jnp.float32
    ) * (1.0 / math.sqrt(d))
    scores = scores + bias[:, None, None, :].astype(jnp.float32)
    if causal:
        # where, not add: a causal-masked padded key would otherwise sum two
        # finfo.min terms to -inf and NaN the all-masked softmax rows
        scores = jnp.where(_causal_keep(L)[None, None], scores, NEG_BIG)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "nhqk,nkhd->nqhd", p.astype(q.dtype), vh,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(N, L, H).astype(q.dtype)


def _fwd_kernel(n_heads, causal, q_ref, k_ref, v_ref, bias_ref, o_ref):
    nb, L, H = q_ref.shape
    d = H // n_heads
    scale = 1.0 / math.sqrt(d)
    keep = _causal_keep(L) if causal else None
    # MXU operands stay in the STORED dtype (bf16 single-pass on v5e) with
    # f32 accumulation — exactly the XLA path's einsum contract. Casting to
    # f32 first (the original kernel) forced multi-pass f32 matmuls and was
    # the bulk of the measured 22ms-vs-12ms attention-math gap (PERF.md,
    # VERDICT r3 #4); scale is applied to the f32 scores AFTER the dot,
    # matching _mha_xla's ordering (and sparing bf16 q a rounding).
    prec = config.kernel_dot_precision(q_ref.dtype)
    for b in range(nb):
        bias_row = bias_ref[b, 0, :]  # (L,)
        # load each (L, H) block once; per-head slicing happens on values
        qb = q_ref[b]
        kb = k_ref[b]
        vb = v_ref[b]
        outs = []
        for h in range(n_heads):
            qh = jax.lax.slice(qb, (0, h * d), (L, (h + 1) * d))
            kh = jax.lax.slice(kb, (0, h * d), (L, (h + 1) * d))
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            ) * scale
            s = s + bias_row[None, :]
            if causal:
                s = jnp.where(keep, s, NEG_BIG)
            p = jax.nn.softmax(s, axis=-1)
            o = jnp.dot(
                p.astype(vb.dtype),
                jax.lax.slice(vb, (0, h * d), (L, (h + 1) * d)),
                preferred_element_type=jnp.float32,
                precision=config.kernel_dot_precision(vb.dtype),
            )
            outs.append(o)
        o_ref[b] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def _fwd_kernel_stacked(n_heads, causal, group, q_ref, k_ref, v_ref,
                        bias_ref, o_ref):
    """Phase-batched forward: per head GROUP, all nb*group score dots
    back-to-back on the MXU, one softmax chain over a stacked
    (nb*group*L, L) f32 buffer, then all the group's AV dots. Same math as
    ``_fwd_kernel``; measured 1.95x faster at the BERT-base shape (0.184 vs
    0.359 ms/layer, probe_mha_stacked.py) — the per-head dot->softmax->dot
    chains serialize MXU and VPU phases that this formulation (like XLA's
    head-batched attention) overlaps.

    ``group`` (<= n_heads, round-4 kernel = all heads in one group) bounds
    the stacked buffer to nb*group*L*L floats so LONG sequences keep the
    phase-batched win: SQuAD's L=384 blew VMEM at group=12 and was riding
    the per-head kernel (VERDICT r4 #2); group 4-6 fits at nb=1."""
    nb, L, H = q_ref.shape
    d = H // n_heads
    scale = 1.0 / math.sqrt(d)
    prec = config.kernel_dot_precision(q_ref.dtype)
    bias_rows = bias_ref[:, 0, :]  # (nb, L)
    outs = [[] for _ in range(nb)]
    for h0 in range(0, n_heads, group):
        g = min(group, n_heads - h0)
        # phase 1: the group's (example, head) score dots, MXU back-to-back
        tiles = []
        for b in range(nb):
            qb = q_ref[b]
            kb = k_ref[b]
            for h in range(h0, h0 + g):
                qh = jax.lax.slice(qb, (0, h * d), (L, (h + 1) * d))
                kh = jax.lax.slice(kb, (0, h * d), (L, (h + 1) * d))
                tiles.append(jax.lax.dot_general(
                    qh, kh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                ))
        T = nb * g * L
        s = jnp.concatenate(tiles, axis=0) * scale  # (T, L) f32, b-major
        # phase 2: one bias add + one softmax over the stacked buffer; each
        # example's (L,) bias row repeats over its g*L stacked score rows
        s = s + jnp.repeat(bias_rows, g * L, axis=0)
        if causal:
            # query index within each stacked (L, L) tile is the row mod L
            rows = jax.lax.broadcasted_iota(jnp.int32, (T, L), 0) % L
            cols = jax.lax.broadcasted_iota(jnp.int32, (T, L), 1)
            s = jnp.where(cols <= rows, s, NEG_BIG)
        p = jax.nn.softmax(s, axis=-1)
        # phase 3: the group's AV dots
        for b in range(nb):
            vb = v_ref[b]
            for j, h in enumerate(range(h0, h0 + g)):
                i = b * g + j
                ph = jax.lax.slice(
                    p, (i * L, 0), ((i + 1) * L, L)
                ).astype(vb.dtype)
                outs[b].append(jnp.dot(
                    ph, jax.lax.slice(vb, (0, h * d), (L, (h + 1) * d)),
                    preferred_element_type=jnp.float32,
                    precision=config.kernel_dot_precision(vb.dtype),
                ))
    for b in range(nb):
        o_ref[b] = jnp.concatenate(outs[b], axis=1).astype(o_ref.dtype)


def _bwd_kernel(n_heads, causal, q_ref, k_ref, v_ref, bias_ref, g_ref,
                dq_ref, dk_ref, dv_ref):
    nb, L, H = q_ref.shape
    d = H // n_heads
    scale = 1.0 / math.sqrt(d)
    f32 = jnp.float32
    keep = _causal_keep(L) if causal else None
    # same MXU-operand-dtype policy as the forward kernel: dots take the
    # stored dtype (bf16 single-pass) with f32 accumulation; the softmax
    # chain and dS stay f32. This is exactly what XLA's autodiff of the
    # bf16 einsum reference emits — the original all-f32 kernel quintupled
    # the backward's MXU passes for bf16 models (VERDICT r3 #4).
    cd = q_ref.dtype
    prec = config.kernel_dot_precision(cd)
    for b in range(nb):
        bias_row = bias_ref[b, 0, :]
        for h in range(n_heads):
            cols = slice(h * d, (h + 1) * d)
            qh = q_ref[b, :, cols]
            kh = k_ref[b, :, cols]
            vh = v_ref[b, :, cols]
            gh = g_ref[b, :, cols]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=f32, precision=prec,
            ) * scale + bias_row[None, :]
            if causal:
                # masked entries give p=0 -> ds=0: no masked-gradient leak
                s = jnp.where(keep, s, NEG_BIG)
            p = jax.nn.softmax(s, axis=-1)
            pc = p.astype(cd)
            # dV = P^T g
            dv = jax.lax.dot_general(
                pc, gh, (((0,), (0,)), ((), ())),
                preferred_element_type=f32, precision=prec,
            )
            # dP = g V^T ; dS = P * (dP - rowsum(dP * P))
            dp = jax.lax.dot_general(
                gh, vh, (((1,), (1,)), ((), ())),
                preferred_element_type=f32, precision=prec,
            )
            ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))).astype(cd)
            # dQ = (dS K) * scale ; dK = (dS^T Q) * scale
            dq = jnp.dot(
                ds, kh, preferred_element_type=f32, precision=prec
            ) * scale
            dk = jax.lax.dot_general(
                ds, qh, (((0,), (0,)), ((), ())),
                preferred_element_type=f32, precision=prec,
            ) * scale
            dq_ref[b, :, cols] = dq.astype(dq_ref.dtype)
            dk_ref[b, :, cols] = dk.astype(dk_ref.dtype)
            dv_ref[b, :, cols] = dv.astype(dv_ref.dtype)


# examples per grid step: VMEM holds 4-5 (L<=512, H=768) f32 operands per
# example; NB=4 keeps the unrolled (NB x heads) inner loop compile-friendly.
# TEMPS covers the per-head (L, L) score/softmax/grad chains plus Mosaic
# stack overhead — calibrated from a measured 16.85M scoped allocation for
# the nb=2 f32 backward (8 double-buffered arrays = 12.6M + ~4.2M temps).
NB = 4
VMEM_LIMIT = 14 * 1024 * 1024
TEMPS = 4 * 1024 * 1024


def _pick_nb(L: int, H: int, itemsize: int, n_arrays: int) -> int | None:
    """Largest example block that fits; None if even nb=1 exceeds VMEM
    (callers then fall back to the XLA implementation — e.g. SQuAD's
    L=384 at f32, where the backward's 8 arrays alone need ~19M).

    Honors the same BAYEFORMERS_VMEM_LIMIT_MB derating knob as the linear
    kernels' VMEM models (ops/fused_linear.py), so one env var governs every
    Pallas fit decision."""
    limit = (
        int(os.environ.get("BAYEFORMERS_VMEM_LIMIT_MB", "0")) * (1 << 20)
        or VMEM_LIMIT
    )
    nb = NB
    while nb >= 1:
        est = n_arrays * nb * L * H * itemsize * 2 + TEMPS
        if est <= limit:
            return nb
        nb //= 2
    return None


def _pick_nb_stacked(
    L: int, H: int, n_heads: int, itemsize: int
) -> tuple[int, int] | None:
    """(example block, head group) for the stacked forward, or None when no
    configuration with group >= 2 fits VMEM (the per-head forward runs
    instead — a group of 1 IS the per-head kernel with worse IO blocking).
    On top of the 4 double-buffered (nb, L, H) q/k/v/o arrays, the stacked
    formulation holds ~2 live (nb*group*L, L) f32 copies per group phase
    (the concatenated scores die into the biased/masked buffer, which dies
    into the softmax output). Calibrated to the measured fit points
    (probe_mha_stacked.py): BERT-base bf16 L=128 admits (nb=4, group=12)
    (12.6M, ran — the round-4 kernel's exact config), nb=8 models to 25.2M
    (compile failed). SQuAD's L=384 bf16 blows VMEM at group=12 (18.9M at
    nb=1) but fits (nb=1, group=6) at 11.8M — long sequences keep the
    phase-batched win via smaller head groups (VERDICT r4 #2).

    Group preference before block preference: the measured 1.95x came from
    phase batching (MXU dots back-to-back, softmax off the critical path),
    not from IO blocking, so a bigger group at nb=1 beats a bigger nb at
    group=1. Groups iterate over divisors of n_heads so phases stay
    uniform."""
    limit = (
        int(os.environ.get("BAYEFORMERS_VMEM_LIMIT_MB", "0")) * (1 << 20)
        or VMEM_LIMIT
    )
    groups = [g for g in range(n_heads, 1, -1) if n_heads % g == 0]
    for g in groups:
        nb = NB
        while nb >= 1:
            arrays = 4 * nb * L * H * itemsize * 2
            stacked = 2 * nb * g * L * L * 4
            if arrays + stacked <= limit:
                return nb, g
            nb //= 2
    return None


def pallas_fits(L: int, H: int, itemsize: int) -> bool:
    """True when BOTH the forward (5 arrays) and backward (8 arrays)
    kernels fit VMEM at some block size, AND the sequence length is
    8-aligned (Mosaic sublane granularity for the (L, H) blocks and (L, L)
    score tiles; ViT's L = n_patches + 1 CLS — e.g. 197 — is not, and rides
    the XLA implementation instead)."""
    return (
        L % 8 == 0
        and _pick_nb(L, H, itemsize, 5) is not None
        and _pick_nb(L, H, itemsize, 8) is not None
    )


def _pad_n(x, n_pad):
    return jnp.pad(x, ((0, n_pad - x.shape[0]),) + ((0, 0),) * (x.ndim - 1))


def _mha_pallas_fwd(q, k, v, bias, n_heads: int, causal: bool = False):
    N, L, H = q.shape
    nb_stacked = _pick_nb_stacked(L, H, n_heads, q.dtype.itemsize)
    if nb_stacked is not None:
        nb, group = nb_stacked
        kern = functools.partial(_fwd_kernel_stacked, n_heads, causal, group)
    else:
        nb = _pick_nb(L, H, q.dtype.itemsize, 5)
        kern = functools.partial(_fwd_kernel, n_heads, causal)
    Np = -(-N // nb) * nb
    qp, kp, vp = _pad_n(q, Np), _pad_n(k, Np), _pad_n(v, Np)
    # padded examples keep bias 0 -> uniform softmax, finite garbage rows
    # that are sliced away below. Bias rides as (N, 1, L): a 2D (nb, L)
    # block would violate Mosaic's (8, 128) sublane/lane divisibility rule.
    biasp = _pad_n(bias.astype(jnp.float32), Np)[:, None, :]
    spec = pl.BlockSpec((nb, L, H), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((nb, 1, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
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
    return out[:N]


def _mha_pallas_bwd(q, k, v, bias, g, n_heads: int, causal: bool = False):
    N, L, H = q.shape
    nb = _pick_nb(L, H, q.dtype.itemsize, 8)
    Np = -(-N // nb) * nb
    qp, kp, vp, gp = (_pad_n(a, Np) for a in (q, k, v, g))
    biasp = _pad_n(bias.astype(jnp.float32), Np)[:, None, :]
    spec = pl.BlockSpec((nb, L, H), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((nb, 1, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, n_heads, causal),
        grid=(Np // nb,),
        in_specs=[spec, spec, spec, bspec, spec],
        out_specs=(spec, spec, spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((Np, L, H), q.dtype) for _ in range(3)
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * Np * L * L * H,
            bytes_accessed=8 * Np * L * H * q.dtype.itemsize,
            transcendentals=Np * n_heads * L * L,
        ),
    )(qp, kp, vp, biasp, gp)
    return dq[:N], dk[:N], dv[:N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def mha(q, k, v, bias, n_heads: int, causal: bool = False):
    """Self-attention in flat (N, L, H) layout.

    ``bias`` is the additive attention bias per key position, shape (N, L)
    (0 to attend, a large negative to mask — see :func:`mask_to_bias`).

    ``causal=True`` (decoder families, GPT-2): lower-triangular masking is
    applied ON TOP of ``bias``, computed in-kernel from iota — the (L, L)
    mask never exists in HBM, matching HF's combine_masks semantics at zero
    bandwidth cost.
    """
    if split_lib.use_pallas() and pallas_fits(
        q.shape[1], q.shape[2], q.dtype.itemsize
    ):
        return _mha_pallas_fwd(q, k, v, bias, n_heads, causal)
    return _mha_xla(q, k, v, bias, n_heads, causal)


def _mha_fwd(q, k, v, bias, n_heads, causal):
    return mha(q, k, v, bias, n_heads, causal), (q, k, v, bias)


def _mha_bwd(n_heads, causal, res, g):
    q, k, v, bias = res
    if (
        split_lib.use_pallas()
        and pallas_fits(q.shape[1], q.shape[2], q.dtype.itemsize)
        and os.environ.get("BAYEFORMERS_MHA_XLA_BWD", "0") != "1"
    ):
        dq, dk, dv = _mha_pallas_bwd(q, k, v, bias, g, n_heads, causal)
    else:
        _, vjp = jax.vjp(
            lambda q, k, v: _mha_xla(q, k, v, bias, n_heads, causal), q, k, v
        )
        dq, dk, dv = vjp(g)
    return dq, dk, dv, jnp.zeros_like(bias)


mha.defvjp(_mha_fwd, _mha_bwd)


def mask_to_bias(attention_mask, dtype=jnp.float32):
    """(N, L) 1/0 keep-mask -> additive bias (0 / finfo.min), HF semantics
    (`FlaxBertSelfAttention.__call__`: lax.select on mask > 0)."""
    m = attention_mask > 0
    return jnp.where(m, 0.0, float(jnp.finfo(dtype).min)).astype(jnp.float32)
