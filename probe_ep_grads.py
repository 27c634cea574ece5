"""Probe: is the ep-mode router gradient correctly scaled vs single device?

Compares RAW sgd(1.0)-style gradients (no Adam scale-invariance masking).
"""
import jax

jax.config.update("jax_platforms", "cpu")
import os  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from bayeformers_tpu.parallel import moe as moe_lib  # noqa: E402

moe = moe_lib.BayesMoE(n_experts=4, features=32, ffn=64)
params = moe.init_params(jax.random.key(0))
x = jnp.asarray(np.random.default_rng(0).normal(size=(24, 32)).astype(np.float32))
y = jnp.asarray(np.random.default_rng(1).normal(size=(24, 32)).astype(np.float32))
key = jax.random.key(11)


def loss_single(params):
    out, lq, lp = moe.apply_local(params, key, x)
    return jnp.sum((out - y) ** 2) + (lq - lp) / 10.0


g_single = jax.grad(loss_single)(params)

mesh = moe_lib.make_ep_mesh(4)
especs = moe_lib.expert_specs()
sharded = {k: jax.device_put(v, NamedSharding(mesh, especs[k])) for k, v in params.items()}


def local_loss(params):
    out, lq, lp = moe.apply_local(params, key, x, ep=4, axis="ep")
    return jnp.sum((out - y) ** 2) + (lq - lp) / 10.0


def local_grads(params):
    g = jax.grad(local_loss)(params)
    return dict(g, router_pmean=jax.lax.pmean(g["router"], "ep"),
                router_psum=jax.lax.psum(g["router"], "ep"))


fn = jax.jit(jax.shard_map(
    local_grads, mesh=mesh,
    in_specs=(especs,),
    out_specs=dict({k: especs[k] for k in especs}, router_pmean=P(),
                   router_psum=P()),
    check_vma=False,
))
g_ep = fn(sharded)

want = np.asarray(g_single["router"])
got_raw = np.asarray(g_ep["router"])
got_pmean = np.asarray(g_ep["router_pmean"])
got_psum = np.asarray(g_ep["router_psum"])
print("|router_single|", float(np.abs(want).max()))
print("raw   rel err:", float(np.abs(got_raw - want).max() / (np.abs(want).max() + 1e-12)))
print("pmean rel err:", float(np.abs(got_pmean - want).max() / (np.abs(want).max() + 1e-12)))
print("psum  rel err:", float(np.abs(got_psum - want).max() / (np.abs(want).max() + 1e-12)))
for k in ("wi_mu", "bo_mu"):
    w = np.asarray(g_single[k])
    g = np.asarray(jax.device_get(g_ep[k]))
    print(k, "rel err:", float(np.abs(g - w).max() / (np.abs(w).max() + 1e-12)))
