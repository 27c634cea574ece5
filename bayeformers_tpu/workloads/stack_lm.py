"""Hand-built-tier stacked-block workload: the pp/ep training CLI.

The reference composes hand-built Bayesian layers into models and trains
them with the MC-ELBO idiom (`README.md:34-56`, `examples/mlp_mnist.py`);
it has no pipeline or expert parallelism (SURVEY.md §2: PP/EP "absent").
This workload is the drivable counterpart of the TPU-native surplus axes:

- ``--pp N`` trains a :class:`~bayeformers_tpu.parallel.pipeline.BlockStack`
  as an N-stage GPipe pipeline (depth-sharded weights, microbatched
  activations over ``lax.ppermute``) via ``make_pp_train_step``.
- ``--ep N`` trains a :class:`~bayeformers_tpu.parallel.moe.BayesMoE` with
  its expert axis sharded over N devices via ``make_ep_train_step``.
- ``--arch transformer`` swaps the dense stacks for the depth-stacked
  Bayesian transformer tier (`parallel/transformer.py`): ``--pp N``
  pipelines a causal-LM :class:`~bayeformers_tpu.parallel.transformer.
  TransformerStack`; ``--ep N`` shards a MoE-FFN stack's expert axis.
  The LM task is the repeated-half copy corpus — position-based induction
  with a checkable ceiling (``copy_acc`` -> 1.0 on the predictable half).
- ``--pp 1`` / ``--ep 1`` run the same code paths single-device, so the CLI
  is also the single-chip entry point for the hand-built stacked tiers.

Dense task: synthetic separable binary classification in ``--features``
dims (zero-egress environments; the MC-ELBO recipe, metrics, and logging
follow the reference workload shape — frequentist phase skipped because
the hand-built tier initializes its own variational parameters, reference
`README.md:34-56` composition rather than `to_bayesian` surgery).

Logs one JSON line per eval interval to ``--logs/stack_lm.jsonl`` and
prints the final metrics as JSON on stdout.
"""
from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bayeformers_tpu import elbo as elbo_lib
from bayeformers_tpu.parallel import moe as moe_lib
from bayeformers_tpu.parallel import pipeline as pp_lib
from bayeformers_tpu.parallel import transformer as tfm_lib


def synthetic_task(seed: int, n: int, d: int):
    """Linearly separable two-class data with label noise: the ELBO has a
    real NLL floor, accuracy has a checkable ceiling (~0.97)."""
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d)).astype(np.float32)
    w = rng.normal(size=(d,))
    y = (X @ w > 0).astype(np.int64)
    flip = rng.random(n) < 0.03
    y[flip] = 1 - y[flip]
    return jnp.asarray(X), jnp.asarray(y)


def classification_loss(out: jax.Array, batch: dict):
    """(nll_sum, metrics) on the stacked tier's (B, d) output: the first
    two features are the class logits (no extra readout head — keeps every
    trained parameter Bayesian and depth/expert-sharded)."""
    logits = out[:, :2]
    nll = elbo_lib.cross_entropy_sum(logits, batch["y"])
    acc = jnp.mean((jnp.argmax(logits, -1) == batch["y"]).astype(jnp.float32))
    return nll, {"acc": acc}


def build_pp(args, mesh):
    stack = pp_lib.BlockStack(
        n_blocks=args.blocks, features=args.features, residual=True
    )
    params = stack.init_stack(jax.random.key(args.seed))
    tx = optax.adam(args.lr)
    step = pp_lib.make_pp_train_step(
        stack, tx, mesh=mesh, n_samples=args.samples,
        n_batches=args.n_batches, n_microbatches=args.microbatches,
        loss_fn=classification_loss,
    )
    return params, tx.init(params), step


def build_ep(args, mesh):
    moe = moe_lib.BayesMoE(
        n_experts=args.experts, features=args.features, ffn=args.ffn
    )
    params = moe.init_params(jax.random.key(args.seed))
    tx = optax.adam(args.lr)
    step = moe_lib.make_ep_train_step(
        moe, tx, mesh=mesh, n_samples=args.samples,
        n_batches=args.n_batches, loss_fn=classification_loss,
    )
    return params, tx.init(params), step


# --- transformer arch: repeated-half copy LM -------------------------------

def synthetic_copy_corpus(seed: int, n: int, T: int, V: int):
    """(tokens, targets, eval_mask): sequences whose second half repeats the
    first, so positions >= T//2 - 1 of the (T-1)-long target row are exactly
    predictable (ceiling copy_acc = 1.0) while the first half is noise
    (floor nll = log V there)."""
    rng = np.random.default_rng(seed)
    half = T // 2
    seq = rng.integers(0, V, size=(n, half)).astype(np.int32)
    seq = np.concatenate([seq, seq], axis=1)
    tokens, targets = seq[:, :-1], seq[:, 1:]
    mask = np.zeros_like(targets)
    mask[:, half - 1:] = 1
    return (jnp.asarray(tokens), jnp.asarray(targets), jnp.asarray(mask))


def build_transformer(args, mesh, mode: str):
    moe = None
    if mode == "ep":
        moe = moe_lib.BayesMoE(
            n_experts=args.experts, features=args.features, ffn=args.ffn
        )
    stack = tfm_lib.TransformerStack(
        n_blocks=args.blocks, d_model=args.features, n_heads=args.heads,
        d_ff=args.ffn, moe=moe,
    )
    params = tfm_lib.lm_init(stack, args.vocab, args.seq_len,
                             jax.random.key(args.seed))
    tx = optax.adam(args.lr)
    if mode == "pp":
        step = tfm_lib.make_pp_lm_train_step(
            stack, tx, mesh=mesh, n_samples=args.samples,
            n_batches=args.n_batches, n_microbatches=args.microbatches,
        )
    elif mode == "ep":
        step = tfm_lib.make_ep_lm_train_step(
            stack, tx, mesh=mesh, n_samples=args.samples,
            n_batches=args.n_batches,
        )
    else:
        step = tfm_lib.make_single_lm_train_step(
            stack, tx, n_samples=args.samples, n_batches=args.n_batches,
        )
    return params, tx.init(params), step


def run(args) -> dict:
    if not hasattr(args, "arch"):
        args.arch = "dense"   # pre-transformer callers (round-4 tests)
    if (args.pp > 1) == (args.ep > 1) and args.pp > 1:
        raise ValueError("--pp and --ep are separate modes; pick one axis")
    if args.arch == "transformer":
        mode = "pp" if args.pp > 1 else ("ep" if args.ep > 1 else "single")
    else:
        mode = "pp" if args.pp > 1 or args.ep == 1 else "ep"
    n_dev = {"pp": args.pp, "ep": args.ep, "single": 1}[mode]
    if n_dev > len(jax.devices()):
        raise ValueError(
            f"--{mode} {n_dev} needs {n_dev} devices, "
            f"have {len(jax.devices())}"
        )

    args.n_batches = max(1, args.n_examples // args.batch_size)
    mesh = None
    if mode == "pp":
        mesh = pp_lib.make_pp_mesh(args.pp)
    elif mode == "ep":
        mesh = moe_lib.make_ep_mesh(args.ep)

    if args.arch == "transformer":
        toks, tgts, mask = synthetic_copy_corpus(
            args.seed, args.n_examples, args.seq_len, args.vocab
        )
        data = {"tokens": toks, "targets": tgts, "eval_mask": mask}
        params, opt_state, step = build_transformer(args, mesh, mode)
    else:
        X, y = synthetic_task(args.seed, args.n_examples, args.features)
        data = {"x": X, "y": y}
        if mode == "pp":
            params, opt_state, step = build_pp(args, mesh)
        else:
            params, opt_state, step = build_ep(args, mesh)

    os.makedirs(args.logs, exist_ok=True)
    log_path = os.path.join(args.logs, "stack_lm.jsonl")
    key = jax.random.key(args.seed + 1)
    t0 = time.time()
    last = {}
    with open(log_path, "a") as fh:
        for it in range(args.steps):
            lo = (it * args.batch_size) % args.n_examples
            batch = {
                k: jax.lax.dynamic_slice_in_dim(v, lo, args.batch_size)
                for k, v in data.items()
            }
            key, skey = jax.random.split(key)
            params, opt_state, metrics = step(params, opt_state, skey, batch)
            if it % args.eval_every == 0 or it == args.steps - 1:
                last = {
                    k: float(v) for k, v in metrics.items()
                } | {"step": it, "mode": mode, "arch": args.arch,
                     "n_dev": n_dev, "wall_s": round(time.time() - t0, 2)}
                fh.write(json.dumps(last) + "\n")
    return last


def main():
    p = argparse.ArgumentParser(
        description="Stacked Bayesian blocks / MoE over pp / ep meshes"
    )
    p.add_argument("--arch", choices=("dense", "transformer"),
                   default="dense",
                   help="dense stacks (BlockStack/BayesMoE) or the "
                        "depth-stacked Bayesian transformer LM")
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline stages (BlockStack mode)")
    p.add_argument("--ep", type=int, default=1,
                   help="expert-parallel devices (BayesMoE mode)")
    p.add_argument("--heads", type=int, default=4,
                   help="attention heads (transformer arch)")
    p.add_argument("--seq-len", type=int, default=16,
                   help="copy-task sequence length (transformer arch)")
    p.add_argument("--vocab", type=int, default=64,
                   help="copy-task vocabulary (transformer arch)")
    p.add_argument("--blocks", type=int, default=8)
    p.add_argument("--experts", type=int, default=8)
    p.add_argument("--features", type=int, default=128)
    p.add_argument("--ffn", type=int, default=256)
    p.add_argument("--microbatches", type=int, default=4)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--samples", type=int, default=2)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--n-examples", type=int, default=1024)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--eval-every", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--logs", default="logs")
    args = p.parse_args()
    last = run(args)
    print(json.dumps(last))


if __name__ == "__main__":
    main()
