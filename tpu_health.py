import time, jax, jax.numpy as jnp
t0 = time.time()
x = jnp.ones((1024, 1024), jnp.bfloat16)
y = (x @ x).sum()
y.block_until_ready()
print("devices:", jax.devices())
print("matmul ok, sum=", float(y), "elapsed", round(time.time()-t0, 1), "s")
# allocate ~4GB to confirm HBM is actually free
bufs = [jnp.ones((256, 1024, 1024), jnp.float32) for _ in range(4)]
s = sum(b.sum() for b in bufs)
s.block_until_ready()
print("4GB alloc ok, total elapsed", round(time.time()-t0, 1), "s")
