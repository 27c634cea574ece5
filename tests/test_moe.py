"""Bayesian MoE + expert parallelism (parallel/moe.py) on the CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from bayeformers_tpu.parallel import moe as moe_lib


@pytest.fixture(scope="module")
def setup():
    moe = moe_lib.BayesMoE(n_experts=8, features=32, ffn=64)
    params = moe.init_params(jax.random.key(0))
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(24, 32)).astype(np.float32)
    )
    return moe, params, x


def test_route_top1_capacity(setup):
    moe, params, x = setup
    dispatch, combine = moe.route(params["router"], x)
    T, E = x.shape[0], moe.n_experts
    C = moe.capacity(T)
    assert dispatch.shape == (T, E, C)
    # each kept token occupies exactly one (expert, slot); dropped rows are 0
    per_token = np.asarray(jnp.sum(dispatch, axis=(1, 2)))
    assert set(np.unique(per_token)) <= {0.0, 1.0}
    # no slot is double-booked
    per_slot = np.asarray(jnp.sum(dispatch, axis=0))
    assert per_slot.max() <= 1.0
    # combine carries the softmax gate of the chosen expert
    gates = jax.nn.softmax(x @ params["router"], axis=-1)
    top = np.asarray(jnp.max(gates, axis=-1))
    got = np.asarray(jnp.sum(combine, axis=(1, 2)))
    kept = per_token > 0
    np.testing.assert_allclose(got[kept], top[kept], rtol=1e-6)


def test_ep_matches_single_device(setup):
    """ep=4 shard_map MoE == the single-device apply: same output, same KL
    (deterministic per-expert eps; routing replicated)."""
    moe, params, x = setup
    key = jax.random.key(5)
    want_y, want_lq, want_lp = moe.apply_local(params, key, x)

    mesh = moe_lib.make_ep_mesh(4)
    sharded = {
        k: jax.device_put(v, NamedSharding(mesh, s))
        for (k, v), s in zip(params.items(),
                             [moe_lib.expert_specs()[k] for k in params])
    }
    fn = jax.shard_map(
        lambda p, k, xx: moe_lib.BayesMoE.apply_local(
            moe, p, k, xx, ep=4, axis="ep"
        ),
        mesh=mesh,
        in_specs=(moe_lib.expert_specs(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    got_y, got_lq, got_lp = jax.jit(fn)(sharded, key, x)
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(want_y),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(got_lq), float(want_lq), rtol=1e-5)
    np.testing.assert_allclose(float(got_lp), float(want_lp), rtol=1e-5)


@pytest.mark.slow
def test_ep_train_step_matches_single_device(setup):
    moe, params, x = setup
    y = jnp.asarray(
        np.random.default_rng(1).normal(size=(24, 32)).astype(np.float32)
    )
    batch = {"x": x, "y": y}
    S, n_batches = 2, 10
    key = jax.random.key(11)

    def loss_fn(out, batch):
        err = out - batch["y"]
        return jnp.sum(err * err), {"mse": jnp.mean(err * err)}

    tx = optax.adam(1e-3)

    def single_loss(params):
        def draw(carry, skey):
            out, lq, lp = moe.apply_local(params, skey, x)
            nll, _ = loss_fn(out, batch)
            return carry + ((lq - lp) / n_batches + nll) / S, None

        total, _ = jax.lax.scan(draw, 0.0, jax.random.split(key, S))
        return total

    want_loss, grads = jax.value_and_grad(single_loss)(params)
    updates, _ = tx.update(grads, tx.init(params), params)
    want_params = optax.apply_updates(params, updates)

    mesh = moe_lib.make_ep_mesh(4)
    especs = moe_lib.expert_specs()
    sharded = {
        k: jax.device_put(v, NamedSharding(mesh, especs[k]))
        for k, v in params.items()
    }
    step = moe_lib.make_ep_train_step(
        moe, tx, mesh=mesh, n_samples=S, n_batches=n_batches,
        loss_fn=loss_fn,
    )
    new_params, _, metrics = step(sharded, tx.init(sharded), key, batch)
    np.testing.assert_allclose(float(metrics["loss"]), float(want_loss),
                               rtol=1e-5)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(new_params[k]), np.asarray(want_params[k]),
            rtol=1e-5, atol=1e-7, err_msg=k,
        )


def test_ep_train_step_improves_fit(setup):
    moe, params, x = setup
    batch = {"x": x, "y": jnp.tanh(x) * 0.5}

    def loss_fn(out, batch):
        err = out - batch["y"]
        return jnp.sum(err * err), {"mse": jnp.mean(err * err)}

    mesh = moe_lib.make_ep_mesh(4)
    especs = moe_lib.expert_specs()
    sharded = {
        k: jax.device_put(v, NamedSharding(mesh, especs[k]))
        for k, v in params.items()
    }
    tx = optax.adam(1e-2)
    step = moe_lib.make_ep_train_step(
        moe, tx, mesh=mesh, n_samples=2, n_batches=10, loss_fn=loss_fn,
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


def test_ep_mesh_validation():
    with pytest.raises(ValueError, match="needs"):
        moe_lib.make_ep_mesh(64)
