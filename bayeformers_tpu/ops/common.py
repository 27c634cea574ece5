"""Shared tiling and RNG plumbing for the Pallas sampled-weight kernels.

Determinism contract (SURVEY.md §7 "hard parts"): the Gaussian noise for
weight element (k, n) of sample s must be a pure function of
``(layer_seed[s], j, kk)`` where (j, kk) are the (BN, BK) tile coordinates —
independent of batch tiling and of which kernel regenerates it. All three
kernels (fused matmul, fused log-prob reduction, weight regeneration) seed
``pltpu.prng_seed(seed, j, kk)`` and draw the same two uint32 tensors per
tile, so the same eps is reused for the forward matmul, both log-prob terms,
and the backward pass — the invariant the reference keeps by materializing W
(`bayeformers/nn/layers/linear.py:97-104`).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

TWO_PI = 2.0 * math.pi
# Max elements a (BK, BN) weight tile may hold; keeps VMEM usage bounded.
BN = 256
_BK_CANDIDATES = (512, 256, 128)


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pick_tiles(k_pad: int, n_pad: int) -> tuple[int, int]:
    """(BK, BN) for a padded (k_pad, n_pad) weight. Pure function of the
    padded shape so every kernel touching the same layer agrees."""
    bn = BN if n_pad % BN == 0 else 128
    for bk in _BK_CANDIDATES:
        if k_pad % bk == 0:
            return bk, bn
    return 128, bn


def pad_amounts(k: int, n: int) -> tuple[int, int]:
    return round_up(k, 128), round_up(n, 128)


def uniform_from_bits(bits: jax.Array) -> jax.Array:
    """uint32 -> float32 uniform in (0, 1): top 24 bits scaled, offset off 0."""
    u24 = jax.lax.shift_right_logical(
        pltpu.bitcast(bits, jnp.uint32), jnp.uint32(8)
    )
    # Mosaic has no uint32->f32 cast; the top-24-bit value is < 2^24 so a
    # bitcast to int32 is lossless and int32->f32 lowers fine.
    i24 = pltpu.bitcast(u24, jnp.int32)
    return i24.astype(jnp.float32) * (1.0 / (1 << 24)) + (0.5 / (1 << 24))


def box_muller(bits1: jax.Array, bits2: jax.Array) -> jax.Array:
    """Two uint32 tensors -> one standard-normal tensor (Box-Muller)."""
    u1 = uniform_from_bits(bits1)
    u2 = uniform_from_bits(bits2)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(TWO_PI * u2)


def box_muller_pair(bits1: jax.Array, bits2: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Both Box-Muller outputs (cos AND sin branch): two independent normal
    tensors from two uniform tensors — half the PRNG draws and half the
    log/sqrt work per generated normal vs the single-output form."""
    u1 = uniform_from_bits(bits1)
    u2 = uniform_from_bits(bits2)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta = TWO_PI * u2
    return r * jnp.cos(theta), r * jnp.sin(theta)


# The canonical eps-generation unit for the full-K kernels: a fixed
# (UNIT_K, UNIT_N) block independently seeded by its absolute grid position.
# Small units keep the Box-Muller temporaries tiny in VMEM, and absolute
# seeding lets any kernel (forward, regeneration, future transposed backward)
# reconstruct any sub-block regardless of its own tiling.
UNIT_K = 256
UNIT_N = 128
_UNIT_STRIDE = 1 << 16  # unit id = k_chunk * stride + col_strip (no collisions)


def unit_eps(seed: jax.Array, col_strip, k_chunk) -> jax.Array:
    """Standard-normal (UNIT_K, UNIT_N) block for absolute unit coords.

    Uses both Box-Muller branches: draws bits for only half the block and
    fills the two halves with the cos/sin outputs.
    """
    pltpu.prng_seed(seed, k_chunk * _UNIT_STRIDE + col_strip)
    half = UNIT_K // 2
    bits1 = pltpu.prng_random_bits((half, UNIT_N))
    bits2 = pltpu.prng_random_bits((half, UNIT_N))
    z0, z1 = box_muller_pair(bits1, bits2)
    return jnp.concatenate([z0, z1], axis=0)


def tile_eps(
    seed: jax.Array, j: jax.Array, kk: jax.Array, nk: int, shape: tuple[int, int]
) -> jax.Array:
    """The canonical eps stream for weight tile (j, kk). TPU-only.

    Mosaic's prng_seed takes at most two values, so the tile coordinates are
    folded into one id ``j * nk + kk``; ``nk`` (number of K tiles) is a pure
    function of the padded layer shape, so every kernel agrees.
    """
    pltpu.prng_seed(seed, j * nk + kk)
    bits1 = pltpu.prng_random_bits(shape)
    bits2 = pltpu.prng_random_bits(shape)
    return box_muller(bits1, bits2)


def seed_from_key(key: jax.Array) -> jax.Array:
    """Derive an int32 kernel seed from a JAX PRNG key (or pass ints through)."""
    if jnp.issubdtype(key.dtype, jnp.integer):
        return key.astype(jnp.int32)
    data = jax.random.key_data(key).astype(jnp.uint32)
    folded = data[..., 0] if data.shape[-1] == 1 else data[..., 0] ^ data[..., 1]
    return folded.astype(jnp.int32)
