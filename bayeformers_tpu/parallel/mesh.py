"""Device mesh + GSPMD sharding rules.

The reference's only multi-device support is single-process
``torch.nn.DataParallel`` over 4 GPUs (`examples/bert_squad.py:245`) — no
process groups, no collectives library (SURVEY.md §2). The TPU-native
replacement: a ``jax.sharding.Mesh`` over ICI with

- **dp**: batch axis sharded over data-parallel devices; gradient all-reduce
  falls out of GSPMD (or an explicit ``psum`` in the shard_map path);
- **tp**: Megatron-style tensor parallelism over BERT's dense layers —
  attention QKV and MLP-intermediate kernels column-sharded, attention-output
  and MLP-output kernels row-sharded, so each transformer block needs one
  all-reduce per sublayer and activations stay sharded in between.

Variational extras shard like their base weight: ``rho`` and ``prior_mu`` for
a leaf use the same PartitionSpec as its ``mu``, so sampling and KL terms are
elementwise-local under tp.
"""
from __future__ import annotations

import re


import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flax.traverse_util import flatten_dict, unflatten_dict

from bayeformers_tpu.nn.surgery import BayesParams, SEP


def make_mesh(dp: int, tp: int = 1, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    if dp * tp > devices.size:
        raise ValueError(f"mesh {dp}x{tp} needs {dp*tp} devices, have {devices.size}")
    return Mesh(devices[: dp * tp].reshape(dp, tp), ("dp", "tp"))


# Megatron sharding for HF FlaxBert parameter paths ('/'-joined).
# Column-parallel (shard out_features): QKV projections, MLP intermediate.
# Row-parallel (shard in_features): attention output, MLP output.
_BERT_TP_RULES: list[tuple[re.Pattern, P]] = [
    (re.compile(r"attention/self/(query|key|value)/kernel$"), P(None, "tp")),
    (re.compile(r"attention/self/(query|key|value)/bias$"), P("tp")),
    (re.compile(r"attention/output/dense/kernel$"), P("tp", None)),
    (re.compile(r"(?<!attention/)intermediate/dense/kernel$"), P(None, "tp")),
    (re.compile(r"intermediate/dense/bias$"), P("tp")),
    (re.compile(r"\d+/output/dense/kernel$"), P("tp", None)),
]


def bert_param_spec(path: str) -> P:
    for pattern, spec in _BERT_TP_RULES:
        if pattern.search(path):
            return spec
    return P()  # replicate: embeddings, layernorms, pooler, classifier, biases


def shard_bayes_params(
    bparams: BayesParams, mesh: Mesh, spec_fn=bert_param_spec
) -> BayesParams:
    """device_put every leaf with its NamedSharding (rho/prior_mu follow mu)."""
    def put(a, path: str):
        return jax.device_put(a, NamedSharding(mesh, spec_fn(path)))

    flat = flatten_dict(bparams.params, sep=SEP)
    params = unflatten_dict(
        {k: put(v, k) for k, v in flat.items()}, sep=SEP
    )
    rho = {k: put(v, k) for k, v in bparams.rho.items()}
    prior_mu = {k: put(v, k) for k, v in bparams.prior_mu.items()}
    return BayesParams(params=params, rho=rho, prior_mu=prior_mu)


def shard_batch(batch, mesh: Mesh):
    """Shard every array leaf's leading (batch) axis over dp."""
    sharding = NamedSharding(mesh, P("dp"))
    return jax.tree.map(lambda a: jax.device_put(a, sharding), batch)


def param_shardings(bparams: BayesParams, mesh: Mesh, spec_fn=bert_param_spec):
    """The NamedSharding pytree matching shard_bayes_params (for jit in_shardings)."""
    flat = flatten_dict(bparams.params, sep=SEP)
    params = unflatten_dict(
        {k: NamedSharding(mesh, spec_fn(k)) for k in flat}, sep=SEP
    )
    return BayesParams(
        params=params,
        rho={k: NamedSharding(mesh, spec_fn(k)) for k in bparams.rho},
        prior_mu={k: NamedSharding(mesh, spec_fn(k)) for k in bparams.prior_mu},
    )
