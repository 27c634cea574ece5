"""Pipeline parallelism (parallel/pipeline.py) on the virtual CPU mesh.

The invariant under test: a pp-stage GPipe schedule over depth-sharded
Bayesian blocks computes EXACTLY the single-device stacked forward/step —
same weight draws (tick-invariant eps from (key, global block index)), KL
counted once per draw, NLL summed over microbatches.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from bayeformers_tpu.parallel import pipeline as pp_lib


def _sequential_reference(stack, params_full, key, x):
    """The pipeline's semantics on one device: blocks in order, KL once."""
    h, lq, lp = x, 0.0, 0.0
    for l in range(stack.n_blocks):
        leaf = {k: v[l] for k, v in params_full.items()}
        h, lqi, lpi = stack.block_apply(leaf, key, jnp.int32(l), h)
        lq, lp = lq + lqi, lp + lpi
    return h, lq, lp


@pytest.fixture(scope="module")
def setup():
    stack = pp_lib.BlockStack(n_blocks=4, features=32)
    params = stack.init_stack(jax.random.key(0))
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(8, 32)).astype(np.float32)
    )
    return stack, params, x


def test_pipeline_forward_matches_sequential(setup):
    stack, params, x = setup
    mesh = pp_lib.make_pp_mesh(4)
    key = jax.random.key(7)

    want_h, want_lq, want_lp = _sequential_reference(stack, params, key, x)

    fn = jax.shard_map(
        lambda p, k, xx: pp_lib.pipeline_apply(
            stack, p, k, xx, pp=4, n_microbatches=2
        ),
        mesh=mesh,
        in_specs=(pp_lib.stack_specs(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    sharded = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P("pp"))), params
    )
    got_h, got_lq, got_lp = jax.jit(fn)(sharded, key, x)

    np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(got_lq), float(want_lq), rtol=1e-5)
    np.testing.assert_allclose(float(got_lp), float(want_lp), rtol=1e-5)


def test_pipeline_single_microbatch_and_uneven_microbatches(setup):
    """M=1 (pure bubble) and M=8 (mb=1) both reproduce the reference."""
    stack, params, x = setup
    mesh = pp_lib.make_pp_mesh(4)
    key = jax.random.key(9)
    want_h, _, _ = _sequential_reference(stack, params, key, x)
    sharded = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P("pp"))), params
    )
    for m in (1, 8):
        fn = jax.shard_map(
            lambda p, k, xx, m=m: pp_lib.pipeline_apply(
                stack, p, k, xx, pp=4, n_microbatches=m
            ),
            mesh=mesh,
            in_specs=(pp_lib.stack_specs(), P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
        got_h, _, _ = jax.jit(fn)(sharded, key, x)
        np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h),
                                   rtol=1e-5, atol=1e-6, err_msg=f"M={m}")


def test_pp_train_step_matches_single_device(setup):
    """One ELBO training step through make_pp_train_step == the handwritten
    single-device step: same loss, same updated (gathered) params."""
    stack, params, x = setup
    y = jnp.asarray(
        np.random.default_rng(1).normal(size=(8, 32)).astype(np.float32)
    )
    batch = {"x": x, "y": y}
    S, n_batches, M = 2, 10, 2
    key = jax.random.key(21)

    def loss_fn(out, batch):
        err = out - batch["y"]
        return jnp.sum(err * err), {"mse": jnp.mean(err * err)}

    # --- single-device reference step ---
    tx = optax.adam(1e-3)

    def single_loss(params):
        def draw(carry, skey):
            out, lq, lp = _sequential_reference(stack, params, skey, x)
            nll, _ = loss_fn(out, batch)
            return carry + ((lq - lp) / n_batches + nll) / S, None

        total, _ = jax.lax.scan(draw, 0.0, jax.random.split(key, S))
        return total

    want_loss, grads = jax.value_and_grad(single_loss)(params)
    updates, _ = tx.update(grads, tx.init(params), params)
    want_params = optax.apply_updates(params, updates)

    # --- pipeline step ---
    mesh = pp_lib.make_pp_mesh(4)
    sharded = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P("pp"))), params
    )
    step = pp_lib.make_pp_train_step(
        stack, tx, mesh=mesh, n_samples=S, n_batches=n_batches,
        n_microbatches=M, loss_fn=loss_fn,
    )
    new_params, _, metrics = step(sharded, tx.init(sharded), key, batch)

    np.testing.assert_allclose(float(metrics["loss"]), float(want_loss),
                               rtol=1e-5)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(new_params[k]), np.asarray(want_params[k]),
            rtol=1e-5, atol=1e-7, err_msg=k,
        )


def test_pp_train_step_improves_fit(setup):
    """A few pipeline steps reduce the regression loss (end-to-end sanity:
    grads flow through ppermute, the output broadcast, and the KL psum)."""
    stack, params, x = setup
    y = jnp.tanh(x) * 0.5
    batch = {"x": x, "y": y}
    mesh = pp_lib.make_pp_mesh(4)
    sharded = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P("pp"))), params
    )

    def loss_fn(out, batch):
        err = out - batch["y"]
        return jnp.sum(err * err), {"mse": jnp.mean(err * err)}

    tx = optax.adam(1e-2)
    step = pp_lib.make_pp_train_step(
        stack, tx, mesh=mesh, n_samples=2, n_batches=10,
        n_microbatches=4, loss_fn=loss_fn,
    )
    opt_state = tx.init(sharded)
    first = None
    for i in range(8):
        sharded, opt_state, metrics = step(
            sharded, opt_state, jax.random.key(i), batch
        )
        if first is None:
            first = float(metrics["mse"])
    assert float(metrics["mse"]) < first


def test_pp_mesh_validation():
    with pytest.raises(ValueError, match="needs"):
        pp_lib.make_pp_mesh(64)
