"""The combined Bayesian linear op: one kernel for matmul + both log-probs.

``bayes_linear(x, mu, rho, seeds, prior)`` returns ``(y, log_q, log_p)``:

    y[s]     = x[s] @ (mu + softplus(rho) * eps[s])
    log_q[s] = log N(w[s]; mu, sigma^2).sum()         (posterior)
    log_p[s] = prior log-density at w[s]              (mixture or MOPED)

Design (driven by measured HBM traffic, see bench.py):

- Grid ``(j, s, i)`` with FULL-K weight tiles: the (Kp, BN) mu/rho blocks
  have a grid-index independent of (s, i), so Pallas fetches them once per
  output-column tile j — the same weight traffic as a dense matmul, except
  two arrays (mu, rho) instead of one (W).
- The sampled tile lives in VMEM scratch, regenerated once per (j, s) and
  reused across batch tiles i; eps comes from the deterministic per-tile
  stream (ops/common.py).
- The log-prob partial sums are accumulated at ``i == 0`` — at that moment
  eps and w are already on-chip, so both KL terms cost zero extra HBM
  traffic (the reference pays a full extra pass over W for them,
  `bayeformers/nn/layers/linear.py:99-102`).
- One custom VJP for the whole op: backward regenerates W once and computes
  dx / dmu / drho (matmul + entropy + prior-score terms) in dense XLA. The
  split ops in sampled_linear.py / logprob.py each regenerated W separately.

Layers with Kp > MAX_FULLK fall back to the split implementation.
"""
from __future__ import annotations

import functools
import os
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bayeformers_tpu.core.distributions import LOG_SQRT_2PI
from bayeformers_tpu.core.prior import MOPED_PRIOR_SIGMA
from bayeformers_tpu.ops import common, config
from bayeformers_tpu.ops import fused_backward as bwd_lib
from bayeformers_tpu.ops import logprob as logprob_lib
from bayeformers_tpu.ops import sampled_linear as split_lib

MAX_FULLK = 4096
VMEM_LIMIT = 15 * 1024 * 1024
# Pipeline-buffering headroom beyond the naive block-size sum, plus ~1MB of
# Box-Muller unit temporaries (eps is generated in (256,128) units).
VMEM_FUDGE = 1.2
TEMPS_BYTES = 1 << 20


def _pick_bn_bm(
    k_pad: int, n_pad: int, m: int, n_weight_arrays: int, x_bytes: int = 4,
    w_bytes: int = 4,
) -> tuple[int, int] | None:
    """(BN, BM) minimizing grid steps under the VMEM budget; None if none fit.

    Each TPU grid step carries a fixed ~2-3us pipeline cost (measured; it
    dominated the first kernel version at 960 steps/call), so the objective
    is FEWEST grid steps ``(Np/BN)*(Mp/BM)``, tie-broken toward larger BM
    (better MXU row utilization). VMEM model: ``n_weight_arrays`` (mu, rho
    [, prior_mu]) double-buffered at (Kp, BN), the W scratch, the
    double-buffered x and output blocks (``x_bytes`` per element — bf16
    activations halve them), and ~1MB of eps-unit temps.
    """
    bm_cap = min(1024, common.round_up(m, 8))
    best = None
    best_cost = None
    for bm in (1024, 512, 256, 128, 64, 32, 16, 8):
        if bm > bm_cap:
            continue
        for bn in (512, 256, 128):
            if n_pad % bn:
                continue
            # The W buffer is counted once. With save_weights it is a
            # pipelined output and could in principle double-buffer, but all
            # BERT-shaped configs chosen by this model compile and run with
            # save_weights on a real v5e (empirically calibrated; counting it
            # twice demotes the FFN down-proj to bm=64 and costs ~2x grid
            # steps). If a larger model ever hits a Mosaic VMEM error, derate
            # via BAYEFORMERS_VMEM_LIMIT_MB.
            est = (
                4 * n_weight_arrays * k_pad * bn * 2
                + w_bytes * k_pad * bn
                + x_bytes * (bm * k_pad * 2 + bm * bn * 2)
                + TEMPS_BYTES
            )
            limit = (
                int(os.environ.get("BAYEFORMERS_VMEM_LIMIT_MB", "0")) * (1 << 20)
                or VMEM_LIMIT
            )
            if est * VMEM_FUDGE > limit:
                continue
            m_pad = common.round_up(m, bm)
            steps = (n_pad // bn) * (m_pad // bm)
            cost = (steps, -bm, -bn)
            if best_cost is None or cost < best_cost:
                best_cost = cost
                best = (bn, bm)
    return best


def _kernel(k_act, n_act, prior, save_w, seed_ref, off_ref, x_ref, mu_ref,
            rho_ref, *rest):
    # With save_w the sampled-weight buffer is a kernel OUTPUT (block
    # (1, Kp, bn) at (s, 0, j)): it doubles as the on-chip scratch and its
    # single write-back per (s, j) hands the backward pass W for free —
    # ~6x cheaper than regenerating 850M normals (measured).
    if prior[0] == "gaussian":
        pmu_ref, o_ref, logq_ref, logp_ref, ls_ref, w_raw = rest
    else:
        o_ref, logq_ref, logp_ref, ls_ref, w_raw = rest
    w_ref = w_raw.at[0] if save_w else w_raw
    j = pl.program_id(0)
    s = pl.program_id(1)
    i = pl.program_id(2)
    kp, bn = w_ref.shape
    UK, UN = common.UNIT_K, common.UNIT_N
    # Global unit offsets (tensor-parallel shards; zero when unsharded).
    off_k, off_n = off_ref[0], off_ref[1]

    # sum(log sigma) is sample-independent: accumulate it once (first
    # sample, first batch tile) per column tile while rho is resident in
    # VMEM - the XLA wrapper previously paid a full extra HBM pass over
    # rho (plus ~85M log+softplus VPU ops at BERT-base) every step for it.
    @pl.when(jnp.logical_and(i == 0, s == 0))
    def _logsig():
        t_ls = jnp.zeros((), jnp.float32)
        for c in range(kp // UK):
            for t in range(bn // UN):
                rows = slice(c * UK, (c + 1) * UK)
                cols = slice(t * UN, (t + 1) * UN)
                ls = jnp.log(jax.nn.softplus(rho_ref[rows, cols]))
                aligned = (kp == k_act) and (
                    pl.num_programs(0) * bn == n_act
                )
                if not aligned:
                    r_idx = (
                        jax.lax.broadcasted_iota(jnp.int32, (UK, UN), 0)
                        + c * UK
                    )
                    c_idx = (
                        jax.lax.broadcasted_iota(jnp.int32, (UK, UN), 1)
                        + j * bn + t * UN
                    )
                    ls = jnp.where(
                        (r_idx < k_act) & (c_idx < n_act), ls,
                        jnp.zeros_like(ls),
                    )
                t_ls += jnp.sum(ls)

        @pl.when(j == 0)
        def _init_ls():
            ls_ref[0, 0] = t_ls

        @pl.when(j > 0)
        def _acc_ls():
            ls_ref[0, 0] += t_ls

    @pl.when(i == 0)
    def _regen_and_logprob():
        t_q = jnp.zeros((), jnp.float32)
        t_p = jnp.zeros((), jnp.float32)
        # Sample the tile unit-by-unit; each (UK, UN) unit also contributes
        # its masked log-prob partial sums while eps/w are in registers.
        for c in range(kp // UK):
            for t in range(bn // UN):
                rows = slice(c * UK, (c + 1) * UK)
                cols = slice(t * UN, (t + 1) * UN)
                eps = common.unit_eps(
                    seed_ref[s], j * (bn // UN) + t + off_n, c + off_k
                )
                rho_u = rho_ref[rows, cols]
                sigma = jax.nn.softplus(rho_u)
                w = mu_ref[rows, cols] + sigma * eps
                # bf16-activation runs store W in bf16: the matmul casts W to
                # bf16 anyway, so forward values are bit-identical, and the
                # W residual costs half the HBM in fwd-write + the two
                # backward reads. Log-prob terms below use the local f32 w.
                w_ref[rows, cols] = w.astype(w_raw.dtype)

                # Aligned layers (all BERT shapes) need no masking: the padded
                # dims equal the actual ones, so the mask is a compile-time
                # constant True and the iota/compare/select work is skipped.
                aligned = (kp == k_act) and (pl.num_programs(0) * bn == n_act)
                if aligned:
                    mask = None
                else:
                    r_idx = (
                        jax.lax.broadcasted_iota(jnp.int32, (UK, UN), 0) + c * UK
                    )
                    c_idx = (
                        jax.lax.broadcasted_iota(jnp.int32, (UK, UN), 1)
                        + j * bn + t * UN
                    )
                    mask = (r_idx < k_act) & (c_idx < n_act)
                zero = jnp.zeros_like(w)

                # The kernel accumulates ONLY the eps-dependent parts of the
                # log-probs; the sample-independent constants (n*log sqrt(2pi),
                # sum(log sigma), n*log sigma_p) are added once per step in
                # XLA by the host wrapper — that removes a per-element
                # transcendental (log sigma) from the per-sample hot loop.
                logq_terms = -0.5 * eps * eps
                if prior[0] == "gaussian":
                    z = (w - pmu_ref[rows, cols]) / MOPED_PRIOR_SIGMA
                    logp_terms = -0.5 * z * z
                elif prior[0] == "gaussian_on_mu":
                    # frozen-MOPED fast path: prior centered on mu itself, so
                    # w - prior_mu = sigma*eps; no third weight array needed
                    z = sigma * eps / MOPED_PRIOR_SIGMA
                    logp_terms = -0.5 * z * z
                else:
                    _, pi, s1, s2 = prior
                    logp_terms = logprob_lib._mixture_log_pdf(w, pi, s1, s2)

                if mask is None:
                    t_q += jnp.sum(logq_terms)
                    t_p += jnp.sum(logp_terms)
                else:
                    t_q += jnp.sum(jnp.where(mask, logq_terms, zero))
                    t_p += jnp.sum(jnp.where(mask, logp_terms, zero))

        @pl.when(j == 0)
        def _init():
            logq_ref[s, 0] = t_q
            logp_ref[s, 0] = t_p

        @pl.when(j > 0)
        def _acc():
            logq_ref[s, 0] += t_q
            logp_ref[s, 0] += t_p

    # bf16 activations: x arrives bf16, w (kept f32 for the log-prob math)
    # is cast at the dot; accumulation is always f32, output keeps x's dtype.
    x_tile = x_ref[0]
    dt = x_tile.dtype if x_tile.dtype == jnp.bfloat16 else config.dot_dtype()
    acc = jnp.dot(
        x_tile.astype(dt), w_ref[:, :].astype(dt),
        preferred_element_type=jnp.float32,
        precision=config.kernel_dot_precision(dt),
    )
    o_ref[0] = acc.astype(o_ref.dtype)


def _n_weight_arrays(prior: tuple) -> int:
    return 3 if prior[0] == "gaussian" else 2


def _w_dtype(x_dtype):
    """Storage dtype for the sampled-weight scratch/residual.

    bf16 activations -> bf16 W (the matmul casts W to bf16 regardless, so
    forward values are unchanged; backward's eps reconstruction from bf16 W
    adds ~1% relative noise to drho's dw.eps term — well under the MC
    sampling noise). BAYEFORMERS_SAVE_W_F32=1 forces f32 residuals.
    """
    if x_dtype == jnp.bfloat16 and os.environ.get("BAYEFORMERS_SAVE_W_F32") != "1":
        return jnp.bfloat16
    return jnp.float32


def _pad_kn(k: int, n: int) -> tuple[int, int]:
    # K rounds to the eps-unit height so tiles divide into whole units.
    return common.round_up(k, common.UNIT_K), common.round_up(n, 128)


def _unit_offsets(offsets) -> jax.Array:
    """Element offsets -> (UNIT_K, UNIT_N)-unit offsets for the kernels."""
    if offsets is None:
        return jnp.zeros((2,), jnp.int32)
    offsets = jnp.asarray(offsets, jnp.int32)
    return jnp.stack(
        [offsets[0] // common.UNIT_K, offsets[1] // common.UNIT_N]
    )


def _pallas_bayes_linear(x, mu, rho, seeds, prior_mu, prior: tuple,
                         save_w: bool = False, offsets=None):
    S, M, K = x.shape
    _, N = mu.shape
    Kp, Np = _pad_kn(K, N)
    w_dtype = _w_dtype(x.dtype)
    bk_tall = _ktall_bk(Kp, Np, M, x.dtype.itemsize, jnp.dtype(w_dtype).itemsize)
    if bk_tall is not None:
        return _pallas_bayes_linear_ktall(
            x, mu, rho, seeds, prior_mu, prior, bk_tall, save_w=save_w,
            offsets=offsets,
        )
    bn, bm = _pick_bn_bm(
        Kp, Np, M, _n_weight_arrays(prior), x_bytes=x.dtype.itemsize,
        w_bytes=jnp.dtype(w_dtype).itemsize,
    )
    Mp = common.round_up(M, bm)
    xp = jnp.pad(x, ((0, 0), (0, Mp - M), (0, Kp - K)))
    mup = jnp.pad(mu, ((0, Kp - K), (0, Np - N)))
    rhop = jnp.pad(rho, ((0, Kp - K), (0, Np - N)))
    grid = (Np // bn, S, Mp // bm)

    weight_spec = pl.BlockSpec(
        (Kp, bn), lambda j, s, i: (0, j), memory_space=pltpu.VMEM
    )
    inputs = [seeds.astype(jnp.int32), _unit_offsets(offsets), xp, mup, rhop]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, bm, Kp), lambda j, s, i: (s, i, 0),
                     memory_space=pltpu.VMEM),
        weight_spec,
        weight_spec,
    ]
    if prior[0] == "gaussian":
        inputs.append(jnp.pad(prior_mu, ((0, Kp - K), (0, Np - N))))
        in_specs.append(weight_spec)

    out_specs = [
        pl.BlockSpec((1, bm, bn), lambda j, s, i: (s, i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((S, 1), lambda j, s, i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((S, 1), lambda j, s, i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1), lambda j, s, i: (0, 0), memory_space=pltpu.SMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((S, Mp, Np), x.dtype),
        jax.ShapeDtypeStruct((S, 1), jnp.float32),
        jax.ShapeDtypeStruct((S, 1), jnp.float32),
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
    ]
    scratch_shapes = []
    if save_w:
        out_specs.append(
            pl.BlockSpec((1, Kp, bn), lambda j, s, i: (s, 0, j),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((S, Kp, Np), w_dtype))
    else:
        scratch_shapes.append(pltpu.VMEM((Kp, bn), w_dtype))

    outs = pl.pallas_call(
        functools.partial(_kernel, K, N, prior, save_w),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=2 * S * Mp * Kp * Np,
            bytes_accessed=4 * (S * Mp * Kp + 2 * Kp * Np + S * Mp * Np),
            transcendentals=S * Kp * Np * 4,
        ),
    )(*inputs)
    y, logq, logp = outs[0][:, :M, :N], outs[1][:, 0], outs[2][:, 0]
    # add the sample-independent log-prob constants (sum log sigma comes
    # from the kernel's in-VMEM accumulation - no extra rho pass)
    n_elems = K * N
    logq = logq - outs[3][0, 0] - n_elems * LOG_SQRT_2PI
    if prior[0] in ("gaussian", "gaussian_on_mu"):
        logp = logp - n_elems * (LOG_SQRT_2PI + math.log(MOPED_PRIOR_SIGMA))
    if save_w:
        return y, logq, logp, outs[4][:, :K, :N]
    return y, logq, logp


# ---------------------------------------------------------------------------
# K-tall variant (e.g. BERT's FFN down-projection, K=3072 -> N=768).
#
# The full-K kernel above re-reads x once per output-column tile — for
# K-tall layers x is the LARGE array (S*M*K) and bn is VMEM-starved, so that
# multiplies into ~6x re-reads of a 126MB activation. Here the whole (M, Np)
# output stays resident instead: grid (s, kk) streams K-blocks of x and
# (mu, rho), accumulating the matmul over kk; x is read exactly once and the
# weights are re-streamed once per sample. eps uses the same absolute
# (k_chunk, col_strip) unit coordinates as every other kernel, so forward,
# regeneration, and backward all agree on the draw.
# ---------------------------------------------------------------------------

KTALL_MIN_K = 2048
KTALL_MAX_ACC = 4 * 1024 * 1024  # (Mp, Np) f32 accumulator cap


def _ktall_bk(kp: int, np_: int, m: int, x_bytes: int, w_bytes: int):
    """Largest K-block that fits the VMEM model; None if the route is off."""
    if kp < KTALL_MIN_K or m * np_ * 4 > KTALL_MAX_ACC:
        return None
    limit = (
        int(os.environ.get("BAYEFORMERS_VMEM_LIMIT_MB", "0")) * (1 << 20)
        or VMEM_LIMIT
    )
    mp = common.round_up(m, 8)
    for bk in (512, 256):
        if kp % bk:
            continue
        # o is revisited in place across the kk sweep and only written back
        # at sample change, so it is NOT pipeline double-buffered (validated
        # empirically: the f32 bk=256 FFN2 config compiles at ~12.4M modeled)
        est = (
            (mp * np_ * 4 if x_bytes == 2 else 0)  # f32 acc (bf16 o only)
            + mp * np_ * x_bytes              # o block
            + x_bytes * mp * bk * 2           # x block (double-buffered)
            + 4 * 2 * bk * np_ * 2            # mu, rho blocks
            + w_bytes * bk * np_ * 2          # w out/scratch
            + TEMPS_BYTES
        )
        if est * 1.15 <= limit:
            return bk
    return None


def _ktall_kernel(k_act, n_act, prior, save_w, seed_ref, off_ref, x_ref,
                  mu_ref, rho_ref, *rest):
    if prior[0] == "gaussian":
        pmu_ref, o_ref, logq_ref, logp_ref, ls_ref = rest[:5]
        rest = rest[5:]
    else:
        o_ref, logq_ref, logp_ref, ls_ref = rest[:4]
        rest = rest[4:]
    w_raw = rest[0]
    acc_ref = rest[1] if len(rest) > 1 else None  # bf16 o: separate f32 acc
    w_ref = w_raw.at[0] if save_w else w_raw
    s = pl.program_id(0)
    kk = pl.program_id(1)
    bk, np_pad = w_ref.shape
    UK, UN = common.UNIT_K, common.UNIT_N
    off_k, off_n = off_ref[0], off_ref[1]

    # sum(log sigma): once per K-block, first sample only (see _kernel)
    @pl.when(s == 0)
    def _logsig():
        t_ls = jnp.zeros((), jnp.float32)
        for c in range(bk // UK):
            for t in range(np_pad // UN):
                rows = slice(c * UK, (c + 1) * UK)
                cols = slice(t * UN, (t + 1) * UN)
                c_abs = kk * (bk // UK) + c
                ls = jnp.log(jax.nn.softplus(rho_ref[rows, cols]))
                aligned = (pl.num_programs(1) * bk == k_act) and (
                    np_pad == n_act
                )
                if not aligned:
                    r_idx = (
                        jax.lax.broadcasted_iota(jnp.int32, (UK, UN), 0)
                        + c_abs * UK
                    )
                    c_idx = (
                        jax.lax.broadcasted_iota(jnp.int32, (UK, UN), 1)
                        + t * UN
                    )
                    ls = jnp.where(
                        (r_idx < k_act) & (c_idx < n_act), ls,
                        jnp.zeros_like(ls),
                    )
                t_ls += jnp.sum(ls)

        @pl.when(kk == 0)
        def _init_ls():
            ls_ref[0, 0] = t_ls

        @pl.when(kk > 0)
        def _acc_ls():
            ls_ref[0, 0] += t_ls

    t_q = jnp.zeros((), jnp.float32)
    t_p = jnp.zeros((), jnp.float32)
    for c in range(bk // UK):
        for t in range(np_pad // UN):
            rows = slice(c * UK, (c + 1) * UK)
            cols = slice(t * UN, (t + 1) * UN)
            c_abs = kk * (bk // UK) + c
            eps = common.unit_eps(seed_ref[s], t + off_n, c_abs + off_k)
            rho_u = rho_ref[rows, cols]
            sigma = jax.nn.softplus(rho_u)
            w = mu_ref[rows, cols] + sigma * eps
            w_ref[rows, cols] = w.astype(w_raw.dtype)

            aligned = (pl.num_programs(1) * bk == k_act) and (np_pad == n_act)
            if aligned:
                mask = None
            else:
                r_idx = (
                    jax.lax.broadcasted_iota(jnp.int32, (UK, UN), 0)
                    + c_abs * UK
                )
                c_idx = (
                    jax.lax.broadcasted_iota(jnp.int32, (UK, UN), 1) + t * UN
                )
                mask = (r_idx < k_act) & (c_idx < n_act)
            logq_terms = -0.5 * eps * eps
            if prior[0] == "gaussian":
                z = (w - pmu_ref[rows, cols]) / MOPED_PRIOR_SIGMA
                logp_terms = -0.5 * z * z
            elif prior[0] == "gaussian_on_mu":
                z = sigma * eps / MOPED_PRIOR_SIGMA
                logp_terms = -0.5 * z * z
            else:
                _, pi, s1, s2 = prior
                logp_terms = logprob_lib._mixture_log_pdf(w, pi, s1, s2)
            if mask is None:
                t_q += jnp.sum(logq_terms)
                t_p += jnp.sum(logp_terms)
            else:
                zero = jnp.zeros_like(w)
                t_q += jnp.sum(jnp.where(mask, logq_terms, zero))
                t_p += jnp.sum(jnp.where(mask, logp_terms, zero))

    @pl.when(kk == 0)
    def _init_kl():
        logq_ref[s, 0] = t_q
        logp_ref[s, 0] = t_p

    @pl.when(kk > 0)
    def _acc_kl():
        logq_ref[s, 0] += t_q
        logp_ref[s, 0] += t_p

    x_tile = x_ref[0]
    dt = x_tile.dtype if x_tile.dtype == jnp.bfloat16 else config.dot_dtype()
    partial = jnp.dot(
        x_tile.astype(dt), w_ref[:, :].astype(dt),
        preferred_element_type=jnp.float32,
        precision=config.kernel_dot_precision(dt),
    )
    nk = pl.num_programs(1)
    if acc_ref is None:  # f32 output doubles as the accumulator
        @pl.when(kk == 0)
        def _init():
            o_ref[0] = partial

        @pl.when(kk > 0)
        def _acc():
            o_ref[0] += partial
    else:
        @pl.when(kk == 0)
        def _init():
            acc_ref[:] = partial

        @pl.when(kk > 0)
        def _acc():
            acc_ref[:] += partial

        @pl.when(kk == nk - 1)
        def _emit():
            o_ref[0] = acc_ref[:].astype(o_ref.dtype)


def _pallas_bayes_linear_ktall(x, mu, rho, seeds, prior_mu, prior: tuple,
                               bk: int, save_w: bool = False, offsets=None):
    S, M, K = x.shape
    _, N = mu.shape
    Kp, Np = _pad_kn(K, N)
    w_dtype = _w_dtype(x.dtype)
    Mp = common.round_up(M, 8)
    xp = jnp.pad(x, ((0, 0), (0, Mp - M), (0, Kp - K)))
    mup = jnp.pad(mu, ((0, Kp - K), (0, Np - N)))
    rhop = jnp.pad(rho, ((0, Kp - K), (0, Np - N)))
    grid = (S, Kp // bk)

    weight_spec = pl.BlockSpec(
        (bk, Np), lambda s, kk: (kk, 0), memory_space=pltpu.VMEM
    )
    inputs = [seeds.astype(jnp.int32), _unit_offsets(offsets), xp, mup, rhop]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, Mp, bk), lambda s, kk: (s, 0, kk),
                     memory_space=pltpu.VMEM),
        weight_spec,
        weight_spec,
    ]
    if prior[0] == "gaussian":
        inputs.append(jnp.pad(prior_mu, ((0, Kp - K), (0, Np - N))))
        in_specs.append(weight_spec)

    out_specs = [
        pl.BlockSpec((1, Mp, Np), lambda s, kk: (s, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((S, 1), lambda s, kk: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((S, 1), lambda s, kk: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1), lambda s, kk: (0, 0), memory_space=pltpu.SMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((S, Mp, Np), x.dtype),
        jax.ShapeDtypeStruct((S, 1), jnp.float32),
        jax.ShapeDtypeStruct((S, 1), jnp.float32),
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
    ]
    scratch_shapes = []
    if save_w:
        out_specs.append(
            pl.BlockSpec((1, bk, Np), lambda s, kk: (s, kk, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((S, Kp, Np), w_dtype))
    else:
        scratch_shapes.append(pltpu.VMEM((bk, Np), w_dtype))
    if x.dtype == jnp.bfloat16:  # separate f32 accumulator for bf16 outputs
        scratch_shapes.append(pltpu.VMEM((Mp, Np), jnp.float32))

    outs = pl.pallas_call(
        functools.partial(_ktall_kernel, K, N, prior, save_w),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=2 * S * Mp * Kp * Np,
            bytes_accessed=4 * (S * Mp * Kp + S * 2 * Kp * Np + S * Mp * Np),
            transcendentals=S * Kp * Np * 4,
        ),
    )(*inputs)
    y, logq, logp = outs[0][:, :M, :N], outs[1][:, 0], outs[2][:, 0]
    n_elems = K * N
    logq = logq - outs[3][0, 0] - n_elems * LOG_SQRT_2PI
    if prior[0] in ("gaussian", "gaussian_on_mu"):
        logp = logp - n_elems * (LOG_SQRT_2PI + math.log(MOPED_PRIOR_SIGMA))
    if save_w:
        return y, logq, logp, outs[4][:, :K, :N]
    return y, logq, logp


# ---------------------------------------------------------------------------
# Antithetic pair variant (extension estimator): samples (2t, 2t+1) share one
# eps draw with opposite signs, w± = mu ± sigma*eps. Classic antithetic
# variates — the MC-ELBO stays unbiased (eps is symmetric) with lower
# variance, and the kernel generates HALF the Gaussian noise: one Box-Muller
# pass covers two samples, with w_minus = 2*mu - w_plus costing only adds.
# log_q is even in eps so both pair members share it; the frozen-MOPED
# prior's log_p is even too (w - mu = ±sigma*eps); the general MOPED /
# mixture priors get both signs evaluated explicitly.
# ---------------------------------------------------------------------------


def _anti_kernel(k_act, n_act, prior, save_w, seed_ref, off_ref, x_ref,
                 mu_ref, rho_ref, *rest):
    if prior[0] == "gaussian":
        pmu_ref, o_ref, logq_ref, logp_ref, ls_ref, w_ref = rest
    else:
        o_ref, logq_ref, logp_ref, ls_ref, w_ref = rest
    j = pl.program_id(0)
    s2 = pl.program_id(1)
    i = pl.program_id(2)
    _, kp, bn = w_ref.shape
    UK, UN = common.UNIT_K, common.UNIT_N
    off_k, off_n = off_ref[0], off_ref[1]

    # sum(log sigma): once per column tile, first pair only (see _kernel)
    @pl.when(jnp.logical_and(i == 0, s2 == 0))
    def _logsig():
        t_ls = jnp.zeros((), jnp.float32)
        for c in range(kp // UK):
            for t in range(bn // UN):
                rows = slice(c * UK, (c + 1) * UK)
                cols = slice(t * UN, (t + 1) * UN)
                ls = jnp.log(jax.nn.softplus(rho_ref[rows, cols]))
                aligned = (kp == k_act) and (
                    pl.num_programs(0) * bn == n_act
                )
                if not aligned:
                    r_idx = (
                        jax.lax.broadcasted_iota(jnp.int32, (UK, UN), 0)
                        + c * UK
                    )
                    c_idx = (
                        jax.lax.broadcasted_iota(jnp.int32, (UK, UN), 1)
                        + j * bn + t * UN
                    )
                    ls = jnp.where(
                        (r_idx < k_act) & (c_idx < n_act), ls,
                        jnp.zeros_like(ls),
                    )
                t_ls += jnp.sum(ls)

        @pl.when(j == 0)
        def _init_ls():
            ls_ref[0, 0] = t_ls

        @pl.when(j > 0)
        def _acc_ls():
            ls_ref[0, 0] += t_ls

    @pl.when(i == 0)
    def _regen_and_logprob():
        t_q = jnp.zeros((), jnp.float32)
        t_p0 = jnp.zeros((), jnp.float32)
        t_p1 = jnp.zeros((), jnp.float32)
        for c in range(kp // UK):
            for t in range(bn // UN):
                rows = slice(c * UK, (c + 1) * UK)
                cols = slice(t * UN, (t + 1) * UN)
                eps = common.unit_eps(
                    seed_ref[s2], j * (bn // UN) + t + off_n, c + off_k
                )
                mu_u = mu_ref[rows, cols]
                se = jax.nn.softplus(rho_ref[rows, cols]) * eps
                w0 = mu_u + se
                w1 = mu_u - se
                w_ref[0, rows, cols] = w0.astype(w_ref.dtype)
                w_ref[1, rows, cols] = w1.astype(w_ref.dtype)

                aligned = (kp == k_act) and (pl.num_programs(0) * bn == n_act)
                if aligned:
                    mask = None
                else:
                    r_idx = (
                        jax.lax.broadcasted_iota(jnp.int32, (UK, UN), 0)
                        + c * UK
                    )
                    c_idx = (
                        jax.lax.broadcasted_iota(jnp.int32, (UK, UN), 1)
                        + j * bn + t * UN
                    )
                    mask = (r_idx < k_act) & (c_idx < n_act)
                zero = jnp.zeros_like(w0)

                logq_terms = -0.5 * eps * eps  # even in eps: shared by pair
                if prior[0] == "gaussian":
                    d = (mu_u - pmu_ref[rows, cols]) / MOPED_PRIOR_SIGMA
                    zs = se / MOPED_PRIOR_SIGMA
                    logp0 = -0.5 * (d + zs) * (d + zs)
                    logp1 = -0.5 * (d - zs) * (d - zs)
                elif prior[0] == "gaussian_on_mu":
                    zs = se / MOPED_PRIOR_SIGMA
                    logp0 = -0.5 * zs * zs  # even: shared by pair
                    logp1 = None
                else:
                    _, pi, s1_, s2_ = prior
                    logp0 = logprob_lib._mixture_log_pdf(w0, pi, s1_, s2_)
                    logp1 = logprob_lib._mixture_log_pdf(w1, pi, s1_, s2_)

                if mask is None:
                    t_q += jnp.sum(logq_terms)
                    t_p0 += jnp.sum(logp0)
                    if logp1 is not None:
                        t_p1 += jnp.sum(logp1)
                else:
                    t_q += jnp.sum(jnp.where(mask, logq_terms, zero))
                    t_p0 += jnp.sum(jnp.where(mask, logp0, zero))
                    if logp1 is not None:
                        t_p1 += jnp.sum(jnp.where(mask, logp1, zero))
        if prior[0] == "gaussian_on_mu":
            t_p1 = t_p0

        @pl.when(j == 0)
        def _init():
            logq_ref[2 * s2, 0] = t_q
            logq_ref[2 * s2 + 1, 0] = t_q
            logp_ref[2 * s2, 0] = t_p0
            logp_ref[2 * s2 + 1, 0] = t_p1

        @pl.when(j > 0)
        def _acc():
            logq_ref[2 * s2, 0] += t_q
            logq_ref[2 * s2 + 1, 0] += t_q
            logp_ref[2 * s2, 0] += t_p0
            logp_ref[2 * s2 + 1, 0] += t_p1

    dt = x_ref.dtype if x_ref.dtype == jnp.bfloat16 else config.dot_dtype()
    prec = config.kernel_dot_precision(dt)
    for half in range(2):
        acc = jnp.dot(
            x_ref[half].astype(dt), w_ref[half].astype(dt),
            preferred_element_type=jnp.float32, precision=prec,
        )
        o_ref[half] = acc.astype(o_ref.dtype)


def _pallas_bayes_linear_anti(x, mu, rho, seeds_half, prior_mu, prior: tuple,
                              bn: int, bm: int, save_w: bool = False,
                              offsets=None):
    S, M, K = x.shape
    S2 = S // 2
    _, N = mu.shape
    Kp, Np = _pad_kn(K, N)
    w_dtype = _w_dtype(x.dtype)
    Mp = common.round_up(M, bm)
    xp = jnp.pad(x, ((0, 0), (0, Mp - M), (0, Kp - K)))
    mup = jnp.pad(mu, ((0, Kp - K), (0, Np - N)))
    rhop = jnp.pad(rho, ((0, Kp - K), (0, Np - N)))
    grid = (Np // bn, S2, Mp // bm)

    weight_spec = pl.BlockSpec(
        (Kp, bn), lambda j, s2, i: (0, j), memory_space=pltpu.VMEM
    )
    inputs = [
        seeds_half.astype(jnp.int32), _unit_offsets(offsets), xp, mup, rhop
    ]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        # sample-dim block of 2: one grid step sees both pair members
        pl.BlockSpec((2, bm, Kp), lambda j, s2, i: (s2, i, 0),
                     memory_space=pltpu.VMEM),
        weight_spec,
        weight_spec,
    ]
    if prior[0] == "gaussian":
        inputs.append(jnp.pad(prior_mu, ((0, Kp - K), (0, Np - N))))
        in_specs.append(weight_spec)

    out_specs = [
        pl.BlockSpec((2, bm, bn), lambda j, s2, i: (s2, i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((S, 1), lambda j, s2, i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((S, 1), lambda j, s2, i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1), lambda j, s2, i: (0, 0), memory_space=pltpu.SMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((S, Mp, Np), x.dtype),
        jax.ShapeDtypeStruct((S, 1), jnp.float32),
        jax.ShapeDtypeStruct((S, 1), jnp.float32),
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
    ]
    scratch_shapes = []
    if save_w:
        out_specs.append(
            pl.BlockSpec((2, Kp, bn), lambda j, s2, i: (s2, 0, j),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((S, Kp, Np), w_dtype))
    else:
        scratch_shapes.append(pltpu.VMEM((2, Kp, bn), w_dtype))

    outs = pl.pallas_call(
        functools.partial(_anti_kernel, K, N, prior, save_w),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=2 * S * Mp * Kp * Np,
            bytes_accessed=4 * (S * Mp * Kp + 2 * Kp * Np + S * Mp * Np),
            transcendentals=S2 * Kp * Np * 4,
        ),
    )(*inputs)
    y = outs[0][:, :M, :N]
    logq, logp = outs[1][:, 0], outs[2][:, 0]
    n_elems = K * N
    logq = logq - outs[3][0, 0] - n_elems * LOG_SQRT_2PI
    if prior[0] in ("gaussian", "gaussian_on_mu"):
        logp = logp - n_elems * (LOG_SQRT_2PI + math.log(MOPED_PRIOR_SIGMA))
    if save_w:
        return y, logq, logp, outs[4][:, :K, :N]
    return y, logq, logp


# ---------------------------------------------------------------------------
# Paired-antithetic K-tall variant (FFN down-projection shapes). The fullk
# pair kernel above is VMEM-starved to bn=128 / bm=128 at K=3072, which
# re-reads the (2, Mp, Kp) activation pair 6x; here the (2, Mp, bn) output
# stays resident in f32 across the K-block sweep (grid (s2, jn, kk), kk
# innermost) so x is read only Np/bn (=2)x and each weight tile is
# regenerated exactly once per pair. y is emitted f32 and downcast in the
# wrapper - the downcast fuses into the consumer elementwise (bias+residual
# +LayerNorm), costing one extra f32 stream vs a resident-accumulator pair
# that would not fit VMEM. sum(log sigma) is accumulated in-kernel on the
# first pair (s2 == 0), saving the wrapper's per-step XLA pass over rho.
# ---------------------------------------------------------------------------


def _ktall_anti_tiles(kp: int, np_: int, m: int, n_arr: int, x_bytes: int,
                      w_bytes: int):
    """(bk, bn) for the paired K-tall kernel; None if the route is off.

    Objective: fewest x re-reads (max bn), then fewest grid steps (max bk).
    VMEM model: resident (2, Mp, bn) f32 output, double-buffered x pair and
    weight blocks, w pair out/scratch, eps-unit temps.
    """
    if kp < KTALL_MIN_K:
        return None
    limit = (
        int(os.environ.get("BAYEFORMERS_VMEM_LIMIT_MB", "0")) * (1 << 20)
        or VMEM_LIMIT
    )
    mp = common.round_up(m, 8)
    bns = [b for b in range(np_, 127, -128) if np_ % b == 0 and b % 128 == 0]
    for bn in bns:
        if 2 * mp * bn * 4 > 2 * KTALL_MAX_ACC:
            continue
        for bk in (512, 256):
            if kp % bk:
                continue
            est = (
                2 * mp * bn * 4                  # resident f32 o pair
                + x_bytes * 2 * mp * bk * 2      # x pair block, double-buffered
                + 4 * n_arr * bk * bn * 2        # mu, rho [, pmu] blocks
                + w_bytes * 2 * bk * bn * 2      # w pair out/scratch
                + TEMPS_BYTES
            )
            # 1.35: Mosaic's actual scoped-vmem stack for this kernel runs
            # ~1.24x the naive block-sum (measured 16.30M vs 13.11M modeled
            # at bk=512/bn=384 in the full bf16 train step) - the fatter
            # fudge demotes the recipe shape to bk=256, which compiles with
            # ~5M headroom
            if est * 1.35 <= limit:
                return bk, bn
    return None


def _ktall_anti_route(x, mu, prior: tuple):
    kp, np_ = _pad_kn(x.shape[-1], mu.shape[1])
    w_bytes = jnp.dtype(_w_dtype(x.dtype)).itemsize
    return _ktall_anti_tiles(
        kp, np_, x.shape[1], _n_weight_arrays(prior), x.dtype.itemsize,
        w_bytes,
    )


def _ktall_anti_kernel(k_act, n_act, prior, save_w, seed_ref, off_ref, x_ref,
                       mu_ref, rho_ref, *rest):
    if prior[0] == "gaussian":
        pmu_ref, o_ref, logq_ref, logp_ref, ls_ref, w_ref = rest
    else:
        o_ref, logq_ref, logp_ref, ls_ref, w_ref = rest
    s2 = pl.program_id(0)
    jn = pl.program_id(1)
    kk = pl.program_id(2)
    _, bk, bn = w_ref.shape
    UK, UN = common.UNIT_K, common.UNIT_N
    off_k, off_n = off_ref[0], off_ref[1]

    first = jnp.logical_and(jn == 0, kk == 0)

    # sum(log sigma) is pair-independent: compute on the first pair only
    # (a guarded separate pass so the log chain is skipped for s2 > 0)
    @pl.when(s2 == 0)
    def _logsig():
        t_ls = jnp.zeros((), jnp.float32)
        for c in range(bk // UK):
            for t in range(bn // UN):
                rows = slice(c * UK, (c + 1) * UK)
                cols = slice(t * UN, (t + 1) * UN)
                c_abs = kk * (bk // UK) + c
                ls = jnp.log(jax.nn.softplus(rho_ref[rows, cols]))
                aligned = (pl.num_programs(2) * bk == k_act) and (
                    pl.num_programs(1) * bn == n_act
                )
                if not aligned:
                    r_idx = (
                        jax.lax.broadcasted_iota(jnp.int32, (UK, UN), 0)
                        + c_abs * UK
                    )
                    c_idx = (
                        jax.lax.broadcasted_iota(jnp.int32, (UK, UN), 1)
                        + jn * bn + t * UN
                    )
                    ls = jnp.where(
                        (r_idx < k_act) & (c_idx < n_act), ls,
                        jnp.zeros_like(ls),
                    )
                t_ls += jnp.sum(ls)

        @pl.when(first)
        def _init_ls():
            ls_ref[0, 0] = t_ls

        @pl.when(jnp.logical_not(first))
        def _acc_ls():
            ls_ref[0, 0] += t_ls

    t_q = jnp.zeros((), jnp.float32)
    t_p0 = jnp.zeros((), jnp.float32)
    t_p1 = jnp.zeros((), jnp.float32)
    for c in range(bk // UK):
        for t in range(bn // UN):
            rows = slice(c * UK, (c + 1) * UK)
            cols = slice(t * UN, (t + 1) * UN)
            c_abs = kk * (bk // UK) + c
            t_abs = jn * (bn // UN) + t
            eps = common.unit_eps(seed_ref[s2], t_abs + off_n, c_abs + off_k)
            mu_u = mu_ref[rows, cols]
            sigma = jax.nn.softplus(rho_ref[rows, cols])
            se = sigma * eps
            w0 = mu_u + se
            w1 = mu_u - se
            w_ref[0, rows, cols] = w0.astype(w_ref.dtype)
            w_ref[1, rows, cols] = w1.astype(w_ref.dtype)

            aligned = (pl.num_programs(2) * bk == k_act) and (
                pl.num_programs(1) * bn == n_act
            )
            if aligned:
                mask = None
            else:
                r_idx = (
                    jax.lax.broadcasted_iota(jnp.int32, (UK, UN), 0)
                    + c_abs * UK
                )
                c_idx = (
                    jax.lax.broadcasted_iota(jnp.int32, (UK, UN), 1)
                    + jn * bn + t * UN
                )
                mask = (r_idx < k_act) & (c_idx < n_act)
            zero = jnp.zeros_like(w0)

            logq_terms = -0.5 * eps * eps  # even in eps: shared by the pair
            if prior[0] == "gaussian":
                d = (mu_u - pmu_ref[rows, cols]) / MOPED_PRIOR_SIGMA
                zs = se / MOPED_PRIOR_SIGMA
                logp0 = -0.5 * (d + zs) * (d + zs)
                logp1 = -0.5 * (d - zs) * (d - zs)
            elif prior[0] == "gaussian_on_mu":
                zs = se / MOPED_PRIOR_SIGMA
                logp0 = -0.5 * zs * zs  # even: shared by the pair
                logp1 = None
            else:
                _, pi, s1_, s2_ = prior
                logp0 = logprob_lib._mixture_log_pdf(w0, pi, s1_, s2_)
                logp1 = logprob_lib._mixture_log_pdf(w1, pi, s1_, s2_)

            if mask is None:
                t_q += jnp.sum(logq_terms)
                t_p0 += jnp.sum(logp0)
                if logp1 is not None:
                    t_p1 += jnp.sum(logp1)
            else:
                t_q += jnp.sum(jnp.where(mask, logq_terms, zero))
                t_p0 += jnp.sum(jnp.where(mask, logp0, zero))
                if logp1 is not None:
                    t_p1 += jnp.sum(jnp.where(mask, logp1, zero))
    if prior[0] == "gaussian_on_mu":
        t_p1 = t_p0

    @pl.when(first)
    def _init_kl():
        logq_ref[2 * s2, 0] = t_q
        logq_ref[2 * s2 + 1, 0] = t_q
        logp_ref[2 * s2, 0] = t_p0
        logp_ref[2 * s2 + 1, 0] = t_p1

    @pl.when(jnp.logical_not(first))
    def _acc_kl():
        logq_ref[2 * s2, 0] += t_q
        logq_ref[2 * s2 + 1, 0] += t_q
        logp_ref[2 * s2, 0] += t_p0
        logp_ref[2 * s2 + 1, 0] += t_p1

    dt = x_ref.dtype if x_ref.dtype == jnp.bfloat16 else config.dot_dtype()
    prec = config.kernel_dot_precision(dt)
    for half in range(2):
        partial = jnp.dot(
            x_ref[half].astype(dt), w_ref[half].astype(dt),
            preferred_element_type=jnp.float32, precision=prec,
        )

        @pl.when(kk == 0)
        def _init(half=half, partial=partial):
            o_ref[half] = partial

        @pl.when(kk > 0)
        def _acc(half=half, partial=partial):
            o_ref[half] += partial


def _pallas_bayes_linear_ktall_anti(x, mu, rho, seeds_half, prior_mu,
                                    prior: tuple, bk: int, bn: int,
                                    save_w: bool = False, offsets=None):
    S, M, K = x.shape
    S2 = S // 2
    _, N = mu.shape
    Kp, Np = _pad_kn(K, N)
    w_dtype = _w_dtype(x.dtype)
    Mp = common.round_up(M, 8)
    xp = jnp.pad(x, ((0, 0), (0, Mp - M), (0, Kp - K)))
    mup = jnp.pad(mu, ((0, Kp - K), (0, Np - N)))
    rhop = jnp.pad(rho, ((0, Kp - K), (0, Np - N)))
    grid = (S2, Np // bn, Kp // bk)

    weight_spec = pl.BlockSpec(
        (bk, bn), lambda s2, jn, kk: (kk, jn), memory_space=pltpu.VMEM
    )
    inputs = [
        seeds_half.astype(jnp.int32), _unit_offsets(offsets), xp, mup, rhop
    ]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((2, Mp, bk), lambda s2, jn, kk: (s2, 0, kk),
                     memory_space=pltpu.VMEM),
        weight_spec,
        weight_spec,
    ]
    if prior[0] == "gaussian":
        inputs.append(jnp.pad(prior_mu, ((0, Kp - K), (0, Np - N))))
        in_specs.append(weight_spec)

    out_specs = [
        # f32 output doubles as the K-sweep accumulator (resident per (s2, jn))
        pl.BlockSpec((2, Mp, bn), lambda s2, jn, kk: (s2, 0, jn),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((S, 1), lambda s2, jn, kk: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((S, 1), lambda s2, jn, kk: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1), lambda s2, jn, kk: (0, 0),
                     memory_space=pltpu.SMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((S, Mp, Np), jnp.float32),
        jax.ShapeDtypeStruct((S, 1), jnp.float32),
        jax.ShapeDtypeStruct((S, 1), jnp.float32),
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
    ]
    scratch_shapes = []
    if save_w:
        out_specs.append(
            pl.BlockSpec((2, bk, bn), lambda s2, jn, kk: (s2, kk, jn),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((S, Kp, Np), w_dtype))
    else:
        scratch_shapes.append(pltpu.VMEM((2, bk, bn), w_dtype))

    outs = pl.pallas_call(
        functools.partial(_ktall_anti_kernel, K, N, prior, save_w),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=2 * S * Mp * Kp * Np,
            bytes_accessed=4 * (
                (Np // bn) * S * Mp * Kp + 2 * Kp * Np + S * Mp * Np
            ),
            transcendentals=S2 * Kp * Np * 4,
        ),
    )(*inputs)
    y = outs[0][:, :M, :N].astype(x.dtype)
    logq, logp = outs[1][:, 0], outs[2][:, 0]
    n_elems = K * N
    logq = logq - outs[3][0, 0] - n_elems * LOG_SQRT_2PI
    if prior[0] in ("gaussian", "gaussian_on_mu"):
        logp = logp - n_elems * (LOG_SQRT_2PI + math.log(MOPED_PRIOR_SIGMA))
    if save_w:
        return y, logq, logp, outs[4][:, :K, :N]
    return y, logq, logp


def _fullk_regen_kernel(seed_ref, off_ref, mu_ref, rho_ref, w_ref):
    """Regenerate W with the same unit-canonical eps stream as _kernel."""
    j = pl.program_id(0)
    s = pl.program_id(1)
    kp, bn = w_ref.shape[1], w_ref.shape[2]
    UK, UN = common.UNIT_K, common.UNIT_N
    off_k, off_n = off_ref[0], off_ref[1]
    for c in range(kp // UK):
        for t in range(bn // UN):
            rows = slice(c * UK, (c + 1) * UK)
            cols = slice(t * UN, (t + 1) * UN)
            eps = common.unit_eps(
                seed_ref[s], j * (bn // UN) + t + off_n, c + off_k
            )
            w_ref[0, rows, cols] = (
                mu_ref[rows, cols] + jax.nn.softplus(rho_ref[rows, cols]) * eps
            )


def _pallas_fullk_regen(mu, rho, seeds, offsets=None):
    K, N = mu.shape
    S = seeds.shape[0]
    Kp, Np = _pad_kn(K, N)
    bn = 128  # smallest strip: regen traffic is output-dominated anyway
    mup = jnp.pad(mu, ((0, Kp - K), (0, Np - N)))
    rhop = jnp.pad(rho, ((0, Kp - K), (0, Np - N)))
    w = pl.pallas_call(
        _fullk_regen_kernel,
        grid=(Np // bn, S),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((Kp, bn), lambda j, s: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, bn), lambda j, s: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Kp, bn), lambda j, s: (s, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, Kp, Np), jnp.float32),
    )(seeds.astype(jnp.int32), _unit_offsets(offsets), mup, rhop)
    return w[:, :K, :N]


def _naive_from_w(x, w, mu, rho, prior_mu, prior: tuple):
    """Matmul + both log-probs from already-materialized weights (XLA)."""
    y = jnp.einsum(
        "smk,skn->smn", x, w.astype(x.dtype), preferred_element_type=jnp.float32
    ).astype(x.dtype)
    sigma = jax.nn.softplus(rho)
    eps = (w - mu[None]) / sigma[None]
    logq = jnp.sum(
        -LOG_SQRT_2PI - jnp.log(sigma)[None] - 0.5 * eps * eps, axis=(1, 2)
    )
    if prior[0] in ("gaussian", "gaussian_on_mu"):
        z = (w - prior_mu[None]) / MOPED_PRIOR_SIGMA
        logp = jnp.sum(
            -LOG_SQRT_2PI - math.log(MOPED_PRIOR_SIGMA) - 0.5 * z * z,
            axis=(1, 2),
        )
    else:
        _, pi, s1, s2 = prior
        logp = jnp.sum(logprob_lib._mixture_log_pdf(w, pi, s1, s2), axis=(1, 2))
    return y, logq, logp


def _naive_bayes_linear(x, mu, rho, seeds, prior_mu, prior: tuple,
                        offsets=None):
    return _naive_from_w(
        x, split_lib.naive_weights(mu, rho, seeds, offsets), mu, rho,
        prior_mu, prior,
    )


def interleave_antithetic(w_half: jax.Array, mu: jax.Array) -> jax.Array:
    """(S/2, K, N) independent draws -> (S, K, N) antithetic pairs
    ``(w, 2*mu - w)`` at (2t, 2t+1)."""
    pair = jnp.stack([w_half, 2.0 * mu[None] - w_half], axis=1)
    return pair.reshape((-1,) + w_half.shape[1:])


def _naive_bayes_linear_anti(x, mu, rho, seeds_half, prior_mu, prior: tuple,
                             offsets=None):
    w = interleave_antithetic(
        split_lib.naive_weights(mu, rho, seeds_half, offsets), mu
    )
    return _naive_from_w(x, w, mu, rho, prior_mu, prior)


def _regen(mu, rho, seeds, offsets=None):
    """Regenerate exactly the weights the forward used (same dispatch).

    Shapes beyond the full-K kernel (e.g. vocab-sized embedding tables used
    via sampled_weights) fall back to the naive stream; bayes_linear never
    reaches this path for such shapes because its public wrapper already
    routed them to the split ops.
    """
    kp = common.round_up(mu.shape[0], common.UNIT_K)
    if split_lib.use_pallas() and kp <= MAX_FULLK:
        return _pallas_fullk_regen(mu, rho, seeds, offsets)
    return split_lib.naive_weights(mu, rho, seeds, offsets)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _bayes_linear(x, mu, rho, seeds, offsets, prior_mu, prior: tuple):
    if split_lib.use_pallas():
        return _pallas_bayes_linear(x, mu, rho, seeds, prior_mu, prior,
                                    offsets=offsets)
    return _naive_bayes_linear(x, mu, rho, seeds, prior_mu, prior, offsets)


def _fwd(x, mu, rho, seeds, offsets, prior_mu, prior):
    return _bayes_linear(x, mu, rho, seeds, offsets, prior_mu, prior), (
        x, mu, rho, seeds, offsets, prior_mu,
    )


def _bwd(prior, res, cotangents):
    x, mu, rho, seeds, offsets, prior_mu = res
    w = _regen(mu, rho, seeds, offsets)
    return _bwd_common(prior, x, mu, rho, prior_mu, w, seeds, offsets,
                       cotangents)


def _zero_offsets_ct(offsets):
    return None if offsets is None else np.zeros(
        offsets.shape, dtype=jax.dtypes.float0
    )


def _bwd_common(prior, x, mu, rho, prior_mu, w, seeds, offsets, cotangents):
    g_y, g_q, g_p = cotangents

    # dx matmul: bf16 inputs when activations are bf16, f32 accumulation
    dt = x.dtype if x.dtype == jnp.bfloat16 else config.dot_dtype()
    f32 = jnp.float32
    dx = jnp.einsum(
        "smn,skn->smk", g_y.astype(dt), w.astype(dt), preferred_element_type=f32
    ).astype(x.dtype)

    # dmu/drho: tile-fused reduction — the per-sample dw (S, K, N) never
    # materializes in HBM (ops/fused_backward.py); on CPU the same four
    # accumulators come from an equivalent dense XLA path.
    mixture = prior[1:] if prior[0] == "mixture" else None
    a, b, u, v = bwd_lib.reduce_abuv(
        x, g_y.astype(x.dtype), w, mu, g_p, mixture=mixture,
        want_u=prior[0] != "gaussian_on_mu",
    )
    dmu, drho, dprior_mu = bwd_lib.finalize(
        prior, a, b, u, v, mu, rho, prior_mu, g_q, g_p
    )
    if prior[0] != "gaussian":
        dprior_mu = jnp.zeros_like(prior_mu)
    dseeds = np.zeros(seeds.shape, dtype=jax.dtypes.float0)
    return dx, dmu, drho, dseeds, _zero_offsets_ct(offsets), dprior_mu


_bayes_linear.defvjp(_fwd, _bwd)


# Public alias: the regeneration matching bayes_linear's eps stream (the
# split ops' regenerate_weights uses a different tiling and therefore a
# different stream on TPU).
regenerate_weights = _regen


@jax.custom_vjp
def sampled_weights(mu, rho, seeds):
    """Differentiable (S, K, N) sampled weights with bayes_linear's eps
    stream. Needed where the weights themselves flow into the loss (e.g.
    converted embedding tables): the raw regeneration kernel has no AD rule,
    so this wrapper supplies the reparametrization VJP."""
    return _regen(mu, rho, seeds)


def _sampled_weights_fwd(mu, rho, seeds):
    w = _regen(mu, rho, seeds)
    return w, (mu, rho, w, seeds)


def _sampled_weights_bwd(res, g):
    mu, rho, w, seeds = res
    sigma = jax.nn.softplus(rho)
    eps = (w - mu[None]) / sigma[None]
    dmu = jnp.sum(g, axis=0)
    drho = jnp.sum(g * eps, axis=0) * jax.nn.sigmoid(rho)
    dseeds = np.zeros(seeds.shape, dtype=jax.dtypes.float0)
    return dmu, drho, dseeds


sampled_weights.defvjp(_sampled_weights_fwd, _sampled_weights_bwd)


# ---------------------------------------------------------------------------
# Saved-W variant: forward emits the sampled weights as a residual, so the
# backward pass costs one HBM read instead of a full PRNG regeneration.
# ---------------------------------------------------------------------------

def _impl_saved(x, mu, rho, seeds, prior_mu, prior: tuple, offsets=None):
    if split_lib.use_pallas():
        return _pallas_bayes_linear(x, mu, rho, seeds, prior_mu, prior,
                                    save_w=True, offsets=offsets)
    y, lq, lp = _naive_bayes_linear(x, mu, rho, seeds, prior_mu, prior,
                                    offsets)
    return y, lq, lp, split_lib.naive_weights(mu, rho, seeds, offsets)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _bayes_linear_saved(x, mu, rho, seeds, offsets, prior_mu, prior: tuple):
    # Primal (non-differentiated calls, i.e. inference): identical values
    # WITHOUT writing W to HBM; only the AD forward (_fwd_saved) pays the
    # residual write, which backward then reads instead of regenerating.
    return _bayes_linear(x, mu, rho, seeds, offsets, prior_mu, prior)


def _fwd_saved(x, mu, rho, seeds, offsets, prior_mu, prior):
    y, lq, lp, w = _impl_saved(x, mu, rho, seeds, prior_mu, prior, offsets)
    return (y, lq, lp), (x, mu, rho, prior_mu, w, seeds, offsets)


def _bwd_saved(prior, res, cotangents):
    x, mu, rho, prior_mu, w, seeds, offsets = res
    return _bwd_common(prior, x, mu, rho, prior_mu, w, seeds, offsets,
                       cotangents)


_bayes_linear_saved.defvjp(_fwd_saved, _bwd_saved)


# ---------------------------------------------------------------------------
# Antithetic custom VJPs. Odd samples are exact reparametrized draws at
# eps' = -eps, i.e. w1 = 2mu - w0 and (w1 - mu) = -(w0 - mu), so the
# dmu/drho reductions only ever need the even members' weights: every
# accumulator is a ±-combination of the even member's centered weights
# (reduce_abuv_anti reads only the even sample blocks of the residual —
# half the reduce's weight traffic). dx keeps XLA's batched matmul over the
# full pair: it is already at roofline, and both a paired Pallas dx kernel
# (NT-form tile transposes) and a shared-mu-matmul XLA reformulation
# measured slower at recipe shapes.
# ---------------------------------------------------------------------------


def _regen_anti(mu, rho, seeds_half, offsets=None):
    return interleave_antithetic(_regen(mu, rho, seeds_half, offsets), mu)


def _bwd_common_anti(prior, x, mu, rho, prior_mu, w, seeds_half, offsets,
                     cotangents):
    """Antithetic backward: full-pair ``w`` for dx, even-members-only
    weight reads for the dmu/drho reduce (see block comment above)."""
    g_y, g_q, g_p = cotangents

    dt = x.dtype if x.dtype == jnp.bfloat16 else config.dot_dtype()
    f32 = jnp.float32
    dx = jnp.einsum(
        "smn,skn->smk", g_y.astype(dt), w.astype(dt),
        preferred_element_type=f32,
    ).astype(x.dtype)

    mixture = prior[1:] if prior[0] == "mixture" else None
    a, b, u, v = bwd_lib.reduce_abuv_anti(
        x, g_y.astype(x.dtype), w, mu, g_p, mixture=mixture,
        want_u=prior[0] != "gaussian_on_mu",
    )
    dmu, drho, dprior_mu = bwd_lib.finalize(
        prior, a, b, u, v, mu, rho, prior_mu, g_q, g_p
    )
    if prior[0] != "gaussian":
        dprior_mu = jnp.zeros_like(prior_mu)
    dseeds = np.zeros(seeds_half.shape, dtype=jax.dtypes.float0)
    return dx, dmu, drho, dseeds, _zero_offsets_ct(offsets), dprior_mu


def _anti_tiles(x, mu, prior: tuple):
    """(bn, bm) for the paired kernel (doubled x/o/w VMEM); None if unfit."""
    kp, np_ = _pad_kn(x.shape[-1], mu.shape[1])
    if kp > MAX_FULLK:
        return None
    w_bytes = jnp.dtype(_w_dtype(x.dtype)).itemsize
    return _pick_bn_bm(
        kp, np_, x.shape[1], _n_weight_arrays(prior),
        x_bytes=2 * x.dtype.itemsize, w_bytes=2 * w_bytes,
    )


def _impl_anti(x, mu, rho, seeds_half, prior_mu, prior: tuple, save_w: bool,
               offsets=None):
    if split_lib.use_pallas():
        kt = _ktall_anti_route(x, mu, prior)
        if kt is not None:
            return _pallas_bayes_linear_ktall_anti(
                x, mu, rho, seeds_half, prior_mu, prior, *kt, save_w=save_w,
                offsets=offsets,
            )
        tiles = _anti_tiles(x, mu, prior)
        if tiles is not None:
            return _pallas_bayes_linear_anti(
                x, mu, rho, seeds_half, prior_mu, prior, *tiles, save_w=save_w,
                offsets=offsets,
            )
    out = _naive_bayes_linear_anti(x, mu, rho, seeds_half, prior_mu, prior,
                                   offsets)
    if save_w:
        w = interleave_antithetic(
            split_lib.naive_weights(mu, rho, seeds_half, offsets), mu
        )
        return (*out, w)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _bayes_linear_anti(x, mu, rho, seeds_half, offsets, prior_mu, prior: tuple):
    return _impl_anti(x, mu, rho, seeds_half, prior_mu, prior, save_w=False,
                      offsets=offsets)[:3]


def _fwd_anti(x, mu, rho, seeds_half, offsets, prior_mu, prior):
    return _bayes_linear_anti(x, mu, rho, seeds_half, offsets, prior_mu,
                              prior), (x, mu, rho, seeds_half, offsets,
                                       prior_mu)


def _bwd_anti(prior, res, cotangents):
    x, mu, rho, seeds_half, offsets, prior_mu = res
    if split_lib.use_pallas() and (
        _ktall_anti_route(x, mu, prior) is not None
        or _anti_tiles(x, mu, prior) is not None
    ):
        w = _regen_anti(mu, rho, seeds_half, offsets)
    else:
        w = interleave_antithetic(
            split_lib.naive_weights(mu, rho, seeds_half, offsets), mu
        )
    return _bwd_common_anti(prior, x, mu, rho, prior_mu, w, seeds_half,
                            offsets, cotangents)


_bayes_linear_anti.defvjp(_fwd_anti, _bwd_anti)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _bayes_linear_saved_anti(x, mu, rho, seeds_half, offsets, prior_mu,
                             prior: tuple):
    return _bayes_linear_anti(x, mu, rho, seeds_half, offsets, prior_mu, prior)


def _fwd_saved_anti(x, mu, rho, seeds_half, offsets, prior_mu, prior):
    y, lq, lp, w = _impl_anti(x, mu, rho, seeds_half, prior_mu, prior,
                              save_w=True, offsets=offsets)
    return (y, lq, lp), (x, mu, rho, prior_mu, w, seeds_half, offsets)


def _bwd_saved_anti(prior, res, cotangents):
    x, mu, rho, prior_mu, w, seeds_half, offsets = res
    return _bwd_common_anti(prior, x, mu, rho, prior_mu, w, seeds_half,
                            offsets, cotangents)


_bayes_linear_saved_anti.defvjp(_fwd_saved_anti, _bwd_saved_anti)


def bayes_linear(
    x, mu, rho, seeds, *, mixture=None, prior_mu=None, prior_on_mu: bool = False,
    save_weights: bool = True, antithetic: bool = False, unit_offsets=None,
):
    """Combined sampled matmul + per-sample log-probs in one op.

    Prior selection (exactly one):
    - ``mixture=(pi, sigma1, sigma2)`` — scale-mixture prior;
    - ``prior_mu`` — MOPED Gaussian prior centered on the given (pretrained)
      weights;
    - ``prior_on_mu=True`` — MOPED prior centered on ``mu`` itself: valid
      when mu is frozen at the pretrained weights (``freeze=True``, the
      reference GLUE/SQuAD recipe `examples/bert_glue.py:167`); saves a third
      weight-array stream in the kernel.

    ``antithetic=True`` (extension estimator): samples (2t, 2t+1) share one
    eps draw with opposite signs — ``seeds`` must then have length S/2 and x
    an even sample dim. Unbiased with lower MC variance, and the paired
    kernel generates half the Gaussian noise.

    ``unit_offsets`` (tensor parallelism): (2,) int32 global element offsets
    (k0, n0) of this weight shard within the logical unsharded layer. When
    the offsets are unit-aligned (multiples of the backend's eps-unit sizes
    — the caller's responsibility, see nn/fused.py), the shard draws exactly
    the corresponding slice of the unsharded layer's noise stream, so a
    tp-sharded forward reproduces the single-device draws.

    Returns ``(y, log_q, log_p)`` with ``log_*`` of shape (S,).
    """
    given = sum(v is not None and v is not False for v in (mixture, prior_mu)) + int(
        prior_on_mu
    )
    if given != 1:
        raise ValueError("pass exactly one of `mixture`, `prior_mu`, `prior_on_mu`")
    if prior_on_mu:
        prior = ("gaussian_on_mu",)
        prior_mu = mu  # dummy; kernel never reads it, backward returns zeros
    elif prior_mu is not None:
        prior = ("gaussian",)
    else:
        prior = ("mixture",) + tuple(float(v) for v in mixture)
        prior_mu = mu  # unused dummy; zero cotangent in backward

    offsets = (
        None if unit_offsets is None else jnp.asarray(unit_offsets, jnp.int32)
    )

    if antithetic:
        if x.shape[0] % 2 or x.shape[0] != 2 * seeds.shape[0]:
            raise ValueError(
                f"antithetic needs an even sample dim with len(seeds) == S/2; "
                f"got S={x.shape[0]}, len(seeds)={seeds.shape[0]}"
            )
        # Mosaic crashes compiling the pair kernel's W-residual output for
        # f32 HIGHEST-precision dots at Kp > 2048 (reproduced: every tile
        # choice at K=3072 f32; bf16 and all K <= 2048 are fine). Those
        # layers take the non-saved VJP — backward regenerates the pair
        # from the half-seeds instead of reading residuals.
        kp_anti = common.round_up(x.shape[-1], common.UNIT_K)
        if save_weights and not (x.dtype == jnp.float32 and kp_anti > 2048):
            return _bayes_linear_saved_anti(x, mu, rho, seeds, offsets,
                                            prior_mu, prior)
        return _bayes_linear_anti(x, mu, rho, seeds, offsets, prior_mu, prior)

    # Experimental routing: layers at or below this size run the pure-XLA
    # naive path (jnp sampling + autodiff) even on TPU — XLA then owns the
    # layout choices end-to-end, avoiding the normalization copies that
    # custom calls force at attention-head boundaries.
    thresh = int(os.environ.get("BAYEFORMERS_NAIVE_BELOW", "0"))
    if (
        thresh
        and split_lib.use_pallas()
        and max(x.shape[-1], mu.shape[1]) <= thresh
        and offsets is None
    ):
        return _naive_bayes_linear(x, mu, rho, seeds, prior_mu, prior)

    # Layers too large for the full-K kernel take the split multi-tile path
    # (its own custom VJPs; decision made here so fwd/bwd always agree).
    # The split ops have no offset plumbing; an offset-carrying (tp-sharded)
    # layer that doesn't fit the combined kernels runs the naive path
    # instead — correct, just slower, and no transformer shard hits it.
    kp, np_ = _pad_kn(x.shape[-1], mu.shape[1])
    w_bytes = jnp.dtype(_w_dtype(x.dtype)).itemsize
    fullk_ok = kp <= MAX_FULLK and _pick_bn_bm(
        kp, np_, x.shape[1], _n_weight_arrays(prior),
        x_bytes=x.dtype.itemsize, w_bytes=w_bytes,
    ) is not None
    ktall_ok = _ktall_bk(kp, np_, x.shape[1], x.dtype.itemsize, w_bytes) is not None
    if split_lib.use_pallas() and not (fullk_ok or ktall_ok):
        if offsets is not None:
            # plain-XLA autodiff: eps is key-derived (constant under AD), so
            # the reparametrization gradients fall out without a custom VJP
            return _naive_bayes_linear(x, mu, rho, seeds, prior_mu, prior,
                                       offsets)
        y = split_lib.sampled_dense(x, mu, rho, seeds)
        if prior[0] == "mixture":
            lq, lp = logprob_lib.sampled_logprobs(mu, rho, seeds, mixture=mixture)
        else:
            lq, lp = logprob_lib.sampled_logprobs(mu, rho, seeds, prior_mu=prior_mu)
        return y, lq, lp
    if save_weights:
        return _bayes_linear_saved(x, mu, rho, seeds, offsets, prior_mu, prior)
    return _bayes_linear(x, mu, rho, seeds, offsets, prior_mu, prior)
