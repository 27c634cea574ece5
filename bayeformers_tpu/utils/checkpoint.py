"""Checkpoint save/restore via Orbax.

The reference only saves: a final ``torch.save({hyperparams, metrics,
model: state_dict}, .pth)`` per run (`examples/bert_glue.py:303-309`,
`bert_squad.py:563-570`) with no resume path. Here both directions work:
the Bayesian parameter pytree (mu/rho/prior_mu) plus a JSON metadata blob
are saved per step, and training can restore to continue (a gap-fill over
the reference, SURVEY.md §5).
"""
from __future__ import annotations

import json
import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from bayeformers_tpu.nn.surgery import BayesParams


def save_checkpoint(
    directory: str,
    bparams: BayesParams,
    *,
    step: int = 0,
    metadata: Optional[dict] = None,
) -> str:
    """Write ``{directory}/step_{N}`` with the full variational state."""
    directory = os.path.abspath(directory)
    path = os.path.join(directory, f"step_{step}")
    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(
        path,
        {"params": bparams.params, "rho": bparams.rho, "prior_mu": bparams.prior_mu},
        force=True,
    )
    checkpointer.wait_until_finished()
    if metadata is not None:
        with open(os.path.join(directory, f"step_{step}.meta.json"), "w") as fh:
            json.dump(metadata, fh, indent=2, default=float)
    return path


def load_checkpoint(directory: str, template: BayesParams, *, step: int = 0):
    """Restore a BayesParams saved by :func:`save_checkpoint`.

    ``template`` supplies the tree structure/shapes (e.g. a freshly converted
    model). Returns ``(bparams, metadata)``.
    """
    directory = os.path.abspath(directory)
    path = os.path.join(directory, f"step_{step}")
    checkpointer = ocp.StandardCheckpointer()
    target = {
        "params": template.params,
        "rho": template.rho,
        "prior_mu": template.prior_mu,
    }
    restored = checkpointer.restore(
        path, target=jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
    )
    meta_path = os.path.join(directory, f"step_{step}.meta.json")
    metadata = None
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            metadata = json.load(fh)
    return (
        BayesParams(
            params=restored["params"],
            rho=restored["rho"],
            prior_mu=restored["prior_mu"],
        ),
        metadata,
    )


def latest_step(directory: str) -> Optional[int]:
    """Highest step number present under ``directory``, or None."""
    if not os.path.isdir(directory):
        return None
    steps = [
        int(name.split("_", 1)[1])
        for name in os.listdir(directory)
        if name.startswith("step_") and not name.endswith(".json")
        and name.split("_", 1)[1].isdigit()
    ]
    return max(steps) if steps else None
