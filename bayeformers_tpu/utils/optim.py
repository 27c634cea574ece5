"""Optimizer helpers for Bayesian parameter trees.

The reference freezes MOPED ``mu`` by flipping ``requires_grad``
(`layers/linear.py:145,161`) so the optimizer never sees it. In optax,
``masked`` alone is a trap: updates for masked-out leaves pass through
*unchanged* (i.e. the raw gradient would be added at lr=1). The correct
freeze-aware composition transforms trainable leaves with the base optimizer
and hard-zeroes everything else.
"""
from __future__ import annotations

import jax
import optax


def masked_optimizer(tx: optax.GradientTransformation, mask) -> optax.GradientTransformation:
    """Apply ``tx`` only to leaves where ``mask`` is True; zero all others.

    ``mask`` is a pytree of Python bools with the same structure as the
    params (e.g. from ``BayesianModel.trainable_mask``). Weight decay inside
    ``tx`` (e.g. adamw) also respects the mask — frozen leaves are never
    decayed, matching the reference's requires_grad=False semantics.
    """
    inverted = jax.tree.map(lambda b: not b, mask)
    return optax.chain(
        optax.masked(tx, mask),
        optax.masked(optax.set_to_zero(), inverted),
    )
