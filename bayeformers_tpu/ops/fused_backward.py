"""Fused backward reduction for the Bayesian linear op.

The reference's backward (torch autograd over `bayeformers/nn/layers/
linear.py:97-104`) and our round-1 XLA backward both materialize the
per-sample weight gradient ``dw[s] = x[s]^T @ g[s]`` — an (S, K, N) float32
intermediate written to and re-read from HBM — before reducing it to
``dmu``/``drho``. For BERT-base at S=10 that is ~3.4 GB of pure intermediate
traffic per training step.

This kernel computes the reductions *tile-wise during the contraction*, so
no (S, K, N) array ever exists. The key identity: everything downstream
needs only four (K, N) accumulators,

    A = sum_s dw_s                      (the dmu matmul term)
    B = sum_s dw_s * (w_s - mu)         (= sigma * sum_s dw_s eps_s)
    U = sum_s g_p[s] * (w_s - mu)       (prior score terms, Gaussian priors)
    V = sum_s g_p[s] * (w_s - mu)^2
      [mixture prior: U, V are replaced by F = sum_s g_p[s] score(w_s) and
       G = sum_s g_p[s] score(w_s) (w_s - mu)]

after which every prior variant's dmu/drho is cheap elementwise XLA algebra
on (K, N) arrays (see ``finalize``):

    drho = (B / sigma + prior_eps_term - sum_s g_q[s] / sigma) * sigmoid(rho)

Grid ``(jk, jn, s, i)``: each (bk, bn) output tile accumulates over all
(s, i) contraction steps in VMEM scratch; the saved sampled weights are read
once (per-tile block whose index ignores i), x is re-read (Np/bn) times and
g (Kp/bk) times — the same re-read structure as any tiled matmul, with tile
sizes chosen by a VMEM model to minimize that traffic.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bayeformers_tpu.core.prior import MOPED_PRIOR_SIGMA
from bayeformers_tpu.ops import logprob as logprob_lib

VMEM_LIMIT = 15 * 1024 * 1024
# Mosaic's scoped-vmem accounting exceeds the naive sum of block buffers
# (measured 16.4M actual vs 12.6M modeled on a (384,384,512) config — extra
# pipeline buffering); the model multiplies by this calibrated factor.
VMEM_FUDGE = 1.35


def _divisor_tiles(dim: int) -> list[int]:
    """Lane-aligned tile sizes that divide ``dim`` (dim is 128-padded)."""
    return [t for t in (1536, 1024, 768, 512, 384, 256, 128) if dim % t == 0]


def pick_tiles(kp: int, np_: int, m: int, s: int, x_bytes: int = 4,
               n_acc: int = 4):
    """(bk, bn, bm) minimizing HBM traffic under the VMEM model; None if
    nothing fits (caller falls back to the XLA path).

    Traffic model: x re-read (Np/bn) times, g re-read (Kp/bk) times, plus a
    fixed ~2.8us pipeline cost per grid step (pushes bm up on ties). VMEM
    model (validated against Mosaic scoped-vmem errors): ``n_acc`` f32
    scratch accumulators (single-buffered) + ``n_acc`` f32 outputs
    (double-buffered by the pipeline even though written once) + the w and
    mu input blocks (double-buffered) + the x and g blocks (double-buffered).
    """
    limit = (
        int(os.environ.get("BAYEFORMERS_VMEM_LIMIT_MB", "0")) * (1 << 20)
        or VMEM_LIMIT
    )
    best = None
    best_cost = None
    for bk in _divisor_tiles(kp):
        for bn in _divisor_tiles(np_):
            fixed = 4 * bk * bn * (n_acc + 2 * n_acc + 2 * 2)
            for bm in (512, 256, 128, 64, 8):
                if bm > m and bm != 8:
                    continue
                est = (fixed + x_bytes * 2 * bm * (bk + bn)) * VMEM_FUDGE
                if est > limit:
                    continue
                mp = -(-m // bm) * bm
                traffic = (
                    s * mp * kp * (np_ // bn) + s * mp * np_ * (kp // bk)
                )
                steps = (kp // bk) * (np_ // bn) * s * (mp // bm)
                cost = (traffic + steps * 2500, steps)
                if best_cost is None or cost < best_cost:
                    best_cost = cost
                    best = (bk, bn, bm)
                break  # larger bm always preferred at same (bk, bn)
    return best


def _kernel(mixture, want_u, x_ref, g_ref, w_ref, mu_ref, gp_ref, *rest):
    if want_u:
        a_out, b_out, u_out, v_out, a_acc, b_acc, u_acc, v_acc = rest
    else:
        a_out, b_out, v_out, a_acc, b_acc, v_acc = rest
        u_out = u_acc = None
    s = pl.program_id(2)
    i = pl.program_id(3)
    ns = pl.num_programs(2)
    ni = pl.num_programs(3)

    @pl.when(jnp.logical_and(s == 0, i == 0))
    def _zero():
        a_acc[:] = jnp.zeros_like(a_acc)
        b_acc[:] = jnp.zeros_like(b_acc)
        v_acc[:] = jnp.zeros_like(v_acc)
        if want_u:
            u_acc[:] = jnp.zeros_like(u_acc)

    # dw partial for this (s, i): (bk, bm) x (bm, bn) on the MXU
    from bayeformers_tpu.ops import config as _config

    partial = jax.lax.dot_general(
        x_ref[0], g_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_config.kernel_dot_precision(x_ref.dtype),
    )
    wc = w_ref[0] - mu_ref[:]  # = sigma * eps, exact (no cancellation)
    a_acc[:] += partial
    b_acc[:] += partial * wc

    # prior accumulators touch only (w, gp): once per sample
    @pl.when(i == 0)
    def _prior_acc():
        gp = gp_ref[s]
        if mixture is None:
            if want_u:
                u_acc[:] += gp * wc
            v_acc[:] += gp * wc * wc
        else:
            score = logprob_lib._mixture_score(w_ref[0], *mixture)
            u_acc[:] += gp * score
            v_acc[:] += gp * score * wc

    @pl.when(jnp.logical_and(s == ns - 1, i == ni - 1))
    def _finalize():
        a_out[:] = a_acc[:]
        b_out[:] = b_acc[:]
        v_out[:] = v_acc[:]
        if want_u:
            u_out[:] = u_acc[:]


def _pallas_reduce(x, g, w, mu, g_p, tiles, mixture, want_u: bool = True):
    """Returns (A, B, U, V) — U is None when ``want_u`` is False — as
    (K, N) f32 arrays (see module docstring)."""
    S, M, K = x.shape
    _, N = mu.shape
    bk, bn, bm = tiles
    mp = -(-M // bm) * bm
    kp = -(-K // 128) * 128
    np_ = -(-N // 128) * 128
    xp = jnp.pad(x, ((0, 0), (0, mp - M), (0, kp - K)))
    gp_arr = jnp.pad(g, ((0, 0), (0, mp - M), (0, np_ - N)))
    wp = jnp.pad(w, ((0, 0), (0, kp - K), (0, np_ - N)))
    mup = jnp.pad(mu, ((0, kp - K), (0, np_ - N)))

    n_out = 4 if want_u else 3
    grid = (kp // bk, np_ // bn, S, mp // bm)
    out_spec = pl.BlockSpec((bk, bn), lambda jk, jn, s, i: (jk, jn),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_kernel, mixture, want_u),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bm, bk), lambda jk, jn, s, i: (s, i, jk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm, bn), lambda jk, jn, s, i: (s, i, jn),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, bn), lambda jk, jn, s, i: (s, jk, jn),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda jk, jn, s, i: (jk, jn),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(out_spec,) * n_out,
        out_shape=tuple(
            jax.ShapeDtypeStruct((kp, np_), jnp.float32) for _ in range(n_out)
        ),
        scratch_shapes=[pltpu.VMEM((bk, bn), jnp.float32) for _ in range(n_out)],
        cost_estimate=pl.CostEstimate(
            flops=2 * S * mp * kp * np_,
            bytes_accessed=4 * (
                S * mp * kp * (np_ // bn) + S * mp * np_ * (kp // bk)
                + S * kp * np_
            ),
            transcendentals=0,
        ),
    )(xp, gp_arr, wp, mup, g_p.astype(jnp.float32))
    outs = tuple(o[:K, :N] for o in outs)
    if want_u:
        return outs
    return outs[0], outs[1], None, outs[2]


def _kernel_anti(mixture, want_u, x_ref, g_ref, w_ref, mu_ref, gp_ref, *rest):
    """Paired-antithetic variant of :func:`_kernel`.

    One grid step processes a full ± pair: the odd member's weights are
    never read — ``w1 - mu = -(w0 - mu)`` turns every accumulator into a
    ±-combination of the even member's centered weights, halving the W
    residual traffic (the dominant non-x/g stream of the reduce).
    """
    if want_u:
        a_out, b_out, u_out, v_out, a_acc, b_acc, u_acc, v_acc = rest
    else:
        a_out, b_out, v_out, a_acc, b_acc, v_acc = rest
        u_out = u_acc = None
    s2 = pl.program_id(2)
    i = pl.program_id(3)
    ns = pl.num_programs(2)
    ni = pl.num_programs(3)

    @pl.when(jnp.logical_and(s2 == 0, i == 0))
    def _zero():
        a_acc[:] = jnp.zeros_like(a_acc)
        b_acc[:] = jnp.zeros_like(b_acc)
        v_acc[:] = jnp.zeros_like(v_acc)
        if want_u:
            u_acc[:] = jnp.zeros_like(u_acc)

    from bayeformers_tpu.ops import config as _config

    prec = _config.kernel_dot_precision(x_ref.dtype)
    p0 = jax.lax.dot_general(
        x_ref[0], g_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    p1 = jax.lax.dot_general(
        x_ref[1], g_ref[1], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    wc = w_ref[0] - mu_ref[:]  # = sigma * eps of the even member
    a_acc[:] += p0 + p1
    b_acc[:] += (p0 - p1) * wc

    @pl.when(i == 0)
    def _prior_acc():
        gp0 = gp_ref[2 * s2]
        gp1 = gp_ref[2 * s2 + 1]
        if mixture is None:
            if want_u:
                u_acc[:] += (gp0 - gp1) * wc
            v_acc[:] += (gp0 + gp1) * (wc * wc)
        else:
            score0 = logprob_lib._mixture_score(w_ref[0], *mixture)
            score1 = logprob_lib._mixture_score(mu_ref[:] - wc, *mixture)
            u_acc[:] += gp0 * score0 + gp1 * score1
            v_acc[:] += (gp0 * score0 - gp1 * score1) * wc

    @pl.when(jnp.logical_and(s2 == ns - 1, i == ni - 1))
    def _finalize():
        a_out[:] = a_acc[:]
        b_out[:] = b_acc[:]
        v_out[:] = v_acc[:]
        if want_u:
            u_out[:] = u_acc[:]


def _pallas_reduce_anti(x, g, w, mu, g_p, tiles, mixture,
                        want_u: bool = True):
    """Paired reduce over an interleaved antithetic batch: returns the same
    (A, B, U, V) as :func:`_pallas_reduce` while fetching only the EVEN
    sample blocks of ``w`` (index map 2*s) — the odd members are implied by
    w1 - mu = -(w0 - mu), so half the residual's weight traffic is never
    read. x/g pair members are read straight out of the interleaved
    (S, M, .) arrays with sample-dim blocks of 2 — never reshape to a
    (S/2, 2, ...) XLA array: every dot/custom-call consumer of that shape
    materializes its own copy (measured ~0.6 ms x 12 layers per such copy
    at BERT-base recipe shapes)."""
    S, M, K = x.shape
    S2 = S // 2
    _, N = mu.shape
    bk, bn, bm = tiles
    mp = -(-M // bm) * bm
    kp = -(-K // 128) * 128
    np_ = -(-N // 128) * 128
    xp = jnp.pad(x, ((0, 0), (0, mp - M), (0, kp - K)))
    gp_arr = jnp.pad(g, ((0, 0), (0, mp - M), (0, np_ - N)))
    wp = jnp.pad(w, ((0, 0), (0, kp - K), (0, np_ - N)))
    mup = jnp.pad(mu, ((0, kp - K), (0, np_ - N)))

    n_out = 4 if want_u else 3
    grid = (kp // bk, np_ // bn, S2, mp // bm)
    out_spec = pl.BlockSpec((bk, bn), lambda jk, jn, s, i: (jk, jn),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_kernel_anti, mixture, want_u),
        grid=grid,
        in_specs=[
            pl.BlockSpec((2, bm, bk), lambda jk, jn, s, i: (s, i, jk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, bm, bn), lambda jk, jn, s, i: (s, i, jn),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, bn), lambda jk, jn, s, i: (2 * s, jk, jn),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda jk, jn, s, i: (jk, jn),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(out_spec,) * n_out,
        out_shape=tuple(
            jax.ShapeDtypeStruct((kp, np_), jnp.float32) for _ in range(n_out)
        ),
        scratch_shapes=[pltpu.VMEM((bk, bn), jnp.float32) for _ in range(n_out)],
        cost_estimate=pl.CostEstimate(
            flops=2 * S * mp * kp * np_,
            bytes_accessed=4 * (
                S * mp * kp * (np_ // bn) + S * mp * np_ * (kp // bk)
                + S2 * kp * np_
            ),
            transcendentals=0,
        ),
    )(xp, gp_arr, wp, mup, g_p.astype(jnp.float32))
    outs = tuple(o[:K, :N] for o in outs)
    if want_u:
        return outs
    return outs[0], outs[1], None, outs[2]


def _xla_reduce(x, g, w, mu, g_p, mixture):
    """Reference/fallback path: same four accumulators via dense XLA (the
    (S, K, N) dw intermediate exists here; used off-TPU and for parity)."""
    f32 = jnp.float32
    dw = jnp.einsum("smk,smn->skn", x.astype(f32), g.astype(f32),
                    preferred_element_type=f32)
    wc = w - mu[None]
    a = jnp.sum(dw, axis=0)
    b = jnp.sum(dw * wc, axis=0)
    gp = g_p[:, None, None].astype(f32)
    if mixture is None:
        u = jnp.sum(gp * wc, axis=0)
        v = jnp.sum(gp * wc * wc, axis=0)
    else:
        score = logprob_lib._mixture_score(w, *mixture)
        u = jnp.sum(gp * score, axis=0)
        v = jnp.sum(gp * score * wc, axis=0)
    return a, b, u, v


def _xla_reduce_anti(x, g, w, mu, g_p, mixture):
    """Fallback paired reduce (off-TPU and parity): explicit ±-combination
    of the even member's accumulators — see :func:`_kernel_anti`."""
    f32 = jnp.float32
    S, M, K = x.shape
    S2 = S // 2
    N = mu.shape[1]
    w0 = w[0::2]
    x2 = x.reshape(S2, 2, M, K)
    g2 = g.reshape(S2, 2, M, N)
    dw0 = jnp.einsum("tmk,tmn->tkn", x2[:, 0].astype(f32),
                     g2[:, 0].astype(f32), preferred_element_type=f32)
    dw1 = jnp.einsum("tmk,tmn->tkn", x2[:, 1].astype(f32),
                     g2[:, 1].astype(f32), preferred_element_type=f32)
    wc = w0.astype(f32) - mu[None]
    a = jnp.sum(dw0 + dw1, axis=0)
    b = jnp.sum((dw0 - dw1) * wc, axis=0)
    gp2 = g_p.reshape(S2, 2).astype(f32)
    gp0 = gp2[:, 0, None, None]
    gp1 = gp2[:, 1, None, None]
    if mixture is None:
        u = jnp.sum((gp0 - gp1) * wc, axis=0)
        v = jnp.sum((gp0 + gp1) * wc * wc, axis=0)
    else:
        score0 = logprob_lib._mixture_score(mu[None] + wc, *mixture)
        score1 = logprob_lib._mixture_score(mu[None] - wc, *mixture)
        u = jnp.sum(gp0 * score0 + gp1 * score1, axis=0)
        v = jnp.sum((gp0 * score0 - gp1 * score1) * wc, axis=0)
    return a, b, u, v


def reduce_abuv_anti(x, g, w, mu, g_p, mixture=None, want_u: bool = True):
    """(A, B, U, V) for an antithetic batch: ``x``/``g``/``w`` carry all S
    samples (pair-interleaved, even index = the + member); only the even
    members' weights are ever read. Same contract as :func:`reduce_abuv`."""
    from bayeformers_tpu.ops import sampled_linear as split_lib

    S, M, K = x.shape
    kp = -(-K // 128) * 128
    np_ = -(-mu.shape[1] // 128) * 128
    if split_lib.use_pallas():
        n_acc = 4 if want_u else 3
        tiles = pick_tiles(kp, np_, M, S // 2, x_bytes=2 * x.dtype.itemsize,
                           n_acc=n_acc)
        if tiles is not None:
            return _pallas_reduce_anti(x, g, w, mu, g_p, tiles, mixture,
                                       want_u)
    return _xla_reduce_anti(x, g, w, mu, g_p, mixture)


def reduce_abuv(x, g, w, mu, g_p, mixture=None, want_u: bool = True):
    """(A, B, U, V) accumulators; Pallas on TPU when a tiling fits.

    ``want_u=False`` (the ``gaussian_on_mu`` frozen-MOPED hot path, which
    never reads U) drops one accumulator+output, freeing VMEM for bigger
    tiles.
    """
    from bayeformers_tpu.ops import sampled_linear as split_lib

    S, M, K = x.shape
    kp = -(-K // 128) * 128
    np_ = -(-mu.shape[1] // 128) * 128
    if split_lib.use_pallas():
        n_acc = 4 if want_u else 3
        tiles = pick_tiles(kp, np_, M, S, x_bytes=x.dtype.itemsize,
                           n_acc=n_acc)
        if tiles is not None:
            return _pallas_reduce(x, g, w, mu, g_p, tiles, mixture, want_u)
    return _xla_reduce(x, g, w, mu, g_p, mixture)


def finalize(prior, a, b, u, v, mu, rho, prior_mu, g_q, g_p):
    """(dmu, drho, dprior_mu) from the four accumulators — elementwise
    algebra on (K, N) arrays only. Matches fused_linear._bwd_common's closed
    forms exactly:

      dmu  = A + sum_s g_p[s] score_s
      drho = (B/sigma + sum_s g_p[s] score_s eps_s - sum_s g_q[s]/sigma)
             * sigmoid(rho)
    """
    sigma = jax.nn.softplus(rho)
    sigmoid = jax.nn.sigmoid(rho)
    sum_gq = jnp.sum(g_q)
    ps2 = MOPED_PRIOR_SIGMA**2
    if prior[0] == "gaussian":
        e = jnp.sum(g_p)
        pr = -(u + (mu - prior_mu) * e) / ps2
        dmu = a + pr
        dprior_mu = -pr
        prior_eps = -(v + (mu - prior_mu) * u) / (ps2 * sigma)
    elif prior[0] == "gaussian_on_mu":
        dmu = a
        dprior_mu = jnp.zeros_like(mu)
        prior_eps = -v / (ps2 * sigma)
    else:  # mixture: U = sum gp*score, V = sum gp*score*(w-mu)
        dmu = a + u
        dprior_mu = jnp.zeros_like(mu)
        prior_eps = v / sigma
    drho = (b / sigma + prior_eps - sum_gq / sigma) * sigmoid
    return dmu, drho, dprior_mu
