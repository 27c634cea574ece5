"""Fused sampled matmul: ``y[s] = x[s] @ (mu + softplus(rho) * eps[s])``.

The reference's hot loop samples a full weight matrix into memory and then
matmuls it, once per layer per MC sample (`bayeformers/nn/layers/linear.py:
97-104` via `gaussian.py:90-101`) — on TPU that is an HBM round-trip of the
whole weight per forward. The Pallas kernel here generates eps *on-chip* per
(BK, BN) weight tile (seeded deterministically, see ops/common.py), forms the
sampled tile in VMEM, and feeds the MXU directly — sampled weights never
touch HBM in the forward pass.

Layout follows Flax ``nn.Dense``: ``mu, rho: (K, N)``; ``x: (S, M, K)`` with
an explicit leading Monte-Carlo sample axis (the TPU-first replacement for
the reference's sequential S-loop, SURVEY.md §3.2); ``seeds: (S,) int32``.

Backward (custom VJP) regenerates the sampled weights once with the same
deterministic eps stream, then uses dense XLA matmuls:

    dx[s] = g[s] @ W[s]^T          dW[s] = x[s]^T @ g[s]
    dmu   = sum_s dW[s]            drho  = sum_s (dW[s]*eps[s]) * sigmoid(rho)

On non-TPU backends (CPU test mesh, multichip dry-run) the op dispatches to a
numerically-equivalent jnp path whose eps comes from ``jax.random.normal``;
within a backend all ops share one eps stream, so forward/log-prob/backward
always see the same draw.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bayeformers_tpu.ops import common


def use_pallas() -> bool:
    if os.environ.get("BAYEFORMERS_FORCE_NAIVE") == "1":
        return False
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# Naive (reference-style) path: shared eps via jax.random
# ---------------------------------------------------------------------------

# The naive stream is generated in (128, 128) units keyed by ABSOLUTE unit
# coordinates (mirroring the Pallas kernels' absolute (UNIT_K, UNIT_N)
# seeding, ops/common.py): eps for element (k, n) is a pure function of
# (seed, k // 128, n // 128, k % 128, n % 128). A tensor-parallel shard whose
# global element offsets (multiples of 128) are passed via ``offsets`` draws
# exactly the corresponding slice of the unsharded array's noise — the
# invariant behind the dp x tp vs single-device parity tests.
NAIVE_UNIT = 128


def naive_eps(
    seeds: jax.Array, shape: tuple[int, int], offsets=None
) -> jax.Array:
    """(S, K, N) standard normals, deterministic per (seed, global coords).

    ``offsets``: optional (2,) int32 global element offsets (k0, n0) of this
    array's [0, 0] corner within the logical unsharded weight; both must be
    multiples of ``NAIVE_UNIT`` (callers fall back to decorrelated per-shard
    seeds when a sharding cannot satisfy that — see nn/fused.py).
    """
    K, N = shape
    ku = -(-K // NAIVE_UNIT)
    nu = -(-N // NAIVE_UNIT)
    if offsets is None:
        k0 = n0 = jnp.int32(0)
    else:
        offsets = jnp.asarray(offsets, jnp.int32)
        k0, n0 = offsets[0] // NAIVE_UNIT, offsets[1] // NAIVE_UNIT
    ik = jnp.repeat(jnp.arange(ku, dtype=jnp.int32), nu) + k0
    in_ = jnp.tile(jnp.arange(nu, dtype=jnp.int32), ku) + n0

    def one(seed):
        key = jax.random.key(seed)

        def unit(a, b):
            return jax.random.normal(
                jax.random.fold_in(jax.random.fold_in(key, a), b),
                (NAIVE_UNIT, NAIVE_UNIT), jnp.float32,
            )

        units = jax.vmap(unit)(ik, in_)
        full = units.reshape(ku, nu, NAIVE_UNIT, NAIVE_UNIT).transpose(
            0, 2, 1, 3
        ).reshape(ku * NAIVE_UNIT, nu * NAIVE_UNIT)
        return full[:K, :N]

    return jax.vmap(one)(seeds)


def naive_weights(
    mu: jax.Array, rho: jax.Array, seeds: jax.Array, offsets=None
) -> jax.Array:
    eps = naive_eps(seeds, mu.shape, offsets)
    return mu[None] + jax.nn.softplus(rho)[None] * eps


def naive_sampled_dense(x, mu, rho, seeds):
    w = naive_weights(mu, rho, seeds)
    return jnp.einsum(
        "smk,skn->smn", x, w.astype(x.dtype), preferred_element_type=jnp.float32
    ).astype(x.dtype)


# ---------------------------------------------------------------------------
# Pallas fused forward
# ---------------------------------------------------------------------------

def _fused_kernel(bk: int, seed_ref, x_ref, mu_ref, rho_ref, o_ref, w_ref):
    # x_ref: (1, bm, bk), mu/rho_ref: (bk, bn), o_ref: (1, bm, bn),
    # w_ref scratch: (Kp, bn) — holds the sampled weight column for this j,
    # regenerated once per (s, j) and reused across all batch tiles i.
    s = pl.program_id(0)
    j = pl.program_id(1)
    i = pl.program_id(2)
    kk = pl.program_id(3)
    rows = pl.ds(pl.multiple_of(kk * bk, bk), bk)

    nk = pl.num_programs(3)
    @pl.when(i == 0)
    def _regen():
        eps = common.tile_eps(seed_ref[s], j, kk, nk, (bk, w_ref.shape[1]))
        w_ref[rows, :] = mu_ref[:] + jax.nn.softplus(rho_ref[:]) * eps

    from bayeformers_tpu.ops import config as _config

    partial = jnp.dot(
        x_ref[0], w_ref[rows, :].astype(x_ref.dtype),
        preferred_element_type=jnp.float32,
        precision=_config.kernel_dot_precision(x_ref.dtype),
    )

    @pl.when(kk == 0)
    def _init():
        o_ref[0] = partial

    @pl.when(kk > 0)
    def _acc():
        o_ref[0] += partial


def _pad2(a: jax.Array, r: int, c: int) -> jax.Array:
    return jnp.pad(a, ((0, r - a.shape[0]), (0, c - a.shape[1])))


# The W scratch is full-K: beyond this the kernel cannot fit VMEM and the
# op falls back to the (slow but correct) naive path.
MAX_SCRATCH_BYTES = 8 * 1024 * 1024


def scratch_fits(k: int, n: int) -> bool:
    kp, np_ = common.pad_amounts(k, n)
    _, bn = common.pick_tiles(kp, np_)
    return 4 * kp * bn <= MAX_SCRATCH_BYTES


def pallas_sampled_dense(x, mu, rho, seeds):
    S, M, K = x.shape
    _, N = mu.shape
    Kp, Np = common.pad_amounts(K, N)
    bk, bn = common.pick_tiles(Kp, Np)
    bm = min(128, common.round_up(M, 8))
    Mp = common.round_up(M, bm)
    xp = jnp.pad(x, ((0, 0), (0, Mp - M), (0, Kp - K)))
    mup, rhop = _pad2(mu, Kp, Np), _pad2(rho, Kp, Np)
    grid = (S, Np // bn, Mp // bm, Kp // bk)

    out = pl.pallas_call(
        functools.partial(_fused_kernel, bk),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bm, bk), lambda s, j, i, kk: (s, i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda s, j, i, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda s, j, i, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bm, bn), lambda s, j, i, kk: (s, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, Mp, Np), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Kp, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * S * Mp * Kp * Np,
            bytes_accessed=4 * (S * Mp * Kp + 2 * Kp * Np + S * Mp * Np),
            transcendentals=S * Kp * Np * 3,
        ),
    )(seeds.astype(jnp.int32), xp, mup, rhop)
    return out[:, :M, :N]


# ---------------------------------------------------------------------------
# Weight regeneration (backward + parity checks)
# ---------------------------------------------------------------------------

def _regen_kernel(seed_ref, mu_ref, rho_ref, w_ref):
    s = pl.program_id(0)
    j = pl.program_id(1)
    kk = pl.program_id(2)
    nk = pl.num_programs(2)
    shape = (w_ref.shape[1], w_ref.shape[2])
    eps = common.tile_eps(seed_ref[s], j, kk, nk, shape)
    w_ref[0] = mu_ref[:] + jax.nn.softplus(rho_ref[:]) * eps


def pallas_regenerate_weights(mu, rho, seeds):
    K, N = mu.shape
    S = seeds.shape[0]
    Kp, Np = common.pad_amounts(K, N)
    bk, bn = common.pick_tiles(Kp, Np)
    mup, rhop = _pad2(mu, Kp, Np), _pad2(rho, Kp, Np)
    out = pl.pallas_call(
        _regen_kernel,
        grid=(S, Np // bn, Kp // bk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bk, bn), lambda s, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda s, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bk, bn), lambda s, j, kk: (s, kk, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, Kp, Np), jnp.float32),
    )(seeds.astype(jnp.int32), mup, rhop)
    return out[:, :K, :N]


def regenerate_weights(mu, rho, seeds):
    """(S, K, N) sampled weights, same eps stream as the split-op forward
    (NOT the full-K bayes_linear stream — use fused_linear.regenerate_weights
    for that one)."""
    if use_pallas() and scratch_fits(*mu.shape):
        return pallas_regenerate_weights(mu, rho, seeds)
    return naive_weights(mu, rho, seeds)


# ---------------------------------------------------------------------------
# Public op with custom VJP
# ---------------------------------------------------------------------------

@jax.custom_vjp
def sampled_dense(x: jax.Array, mu: jax.Array, rho: jax.Array, seeds: jax.Array):
    """``(S, M, K) @ sampled (K, N) -> (S, M, N)`` with per-sample weights."""
    if use_pallas() and scratch_fits(*mu.shape):
        return pallas_sampled_dense(x, mu, rho, seeds).astype(x.dtype)
    return naive_sampled_dense(x, mu, rho, seeds)


def _sampled_dense_fwd(x, mu, rho, seeds):
    return sampled_dense(x, mu, rho, seeds), (x, mu, rho, seeds)


def _sampled_dense_bwd(res, g):
    x, mu, rho, seeds = res
    w = regenerate_weights(mu, rho, seeds)
    sigma = jax.nn.softplus(rho)
    eps = (w - mu[None]) / sigma[None]
    # mirror fused_linear._bwd_common: bf16 matmul inputs are fine but the
    # accumulation must be f32 (dmu/drho are f32 parameters; dx is cast back
    # to the activation dtype)
    f32 = jnp.float32
    dx = jnp.einsum(
        "smn,skn->smk", g, w.astype(g.dtype), preferred_element_type=f32
    ).astype(x.dtype)
    dw = jnp.einsum("smk,smn->skn", x, g, preferred_element_type=f32)
    dmu = jnp.sum(dw, axis=0)
    drho = jnp.sum(dw * eps, axis=0) * jax.nn.sigmoid(rho)
    dseeds = np.zeros(seeds.shape, dtype=jax.dtypes.float0)
    return dx, dmu, drho, dseeds


sampled_dense.defvjp(_sampled_dense_fwd, _sampled_dense_bwd)
