"""The reference MNIST MLP (examples/mlp_mnist.py:16-26), in Flax.

784 -> 512 -> 512 -> 10 with ReLU and a LogSoftmax head; trained with
sum-reduced NLL on the log-probabilities, exactly as the reference does.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class MLP(nn.Module):
    hidden: int = 512
    n_classes: int = 10

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(self.hidden, name="fc1")(x))
        x = nn.relu(nn.Dense(self.hidden, name="fc2")(x))
        x = nn.Dense(self.n_classes, name="head")(x)
        return jax.nn.log_softmax(x, axis=-1)


def make_mlp(rng: jax.Array, input_dim: int = 784, hidden: int = 512,
             n_classes: int = 10):
    """Returns (apply_fn, params) for the reference MLP."""
    model = MLP(hidden=hidden, n_classes=n_classes)
    params = model.init(rng, jnp.zeros((1, input_dim)))["params"]
    apply_fn = lambda p, x: model.apply({"params": p}, x)
    return apply_fn, params
