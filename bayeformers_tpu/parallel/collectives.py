"""Megatron-style collective ops with explicit VJPs for the fused tp tier.

Tensor parallelism for the Pallas tier runs inside ``shard_map``, where each
device executes the same program on its local weight shard. The two conjugate
collectives of Megatron-LM (Shoeybi et al., arXiv:1909.08053 §3) are written
as ``jax.custom_vjp`` ops so gradient correctness never depends on the
transpose rule JAX picks for ``lax.psum`` under ``check_vma=False``:

- :func:`copy_to_shards` ("f"): forward identity on a replicated activation
  that is about to be consumed by column-parallel shards; backward
  all-reduces the partial cotangents so upstream (replicated) layers see the
  full gradient on every device.
- :func:`reduce_from_shards` ("g"): forward all-reduce of row-parallel
  partial outputs (or per-shard KL partial sums); backward identity — the
  cotangent of the replicated sum is already device-invariant.

The reference has no tensor parallelism at all (its only multi-device path
is ``torch.nn.DataParallel``, `examples/bert_squad.py:245`); this module is
TPU-native surplus.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def copy_to_shards(x, axis: str):
    """Identity forward / psum backward (Megatron "f")."""
    return x


def _f_fwd(x, axis):
    return x, None


def _f_bwd(axis, _, g):
    return (jax.lax.psum(g, axis),)


copy_to_shards.defvjp(_f_fwd, _f_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def reduce_from_shards(x, axis: str):
    """psum forward / identity backward (Megatron "g")."""
    return jax.lax.psum(x, axis)


def _g_fwd(x, axis):
    return reduce_from_shards(x, axis), None


def _g_bwd(axis, _, g):
    return (g,)


reduce_from_shards.defvjp(_g_fwd, _g_bwd)


@dataclasses.dataclass(frozen=True)
class TPContext:
    """Static description of the tensor-parallel environment inside a
    ``shard_map`` region.

    ``kind_fn(path)`` classifies a converted leaf: ``'col'`` (out-features
    sharded over ``axis``), ``'row'`` (in-features sharded), or ``'rep'``
    (replicated). Must match how the caller actually sharded the arrays
    (see parallel/mesh.py — kind_from_spec derives it from the same rules).
    """

    axis: str
    size: int
    kind_fn: Callable[[str], str]
