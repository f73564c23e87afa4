import time
import numpy as np
import jax
import jax.numpy as jnp

img = jax.device_put(np.zeros((540, 960), np.uint8))
jax.block_until_ready(img)


@jax.jit
def null_op(x):
    return x.sum()


@jax.jit
def chain_op(x, n_iters):
    def body(i, a):
        return a * 1.000001 + 1e-6
    y = jax.lax.fori_loop(0, n_iters, body, x.astype(jnp.float32))
    return y.sum()


# warm
float(null_op(img))
t0 = time.perf_counter()
for _ in range(20):
    v = float(null_op(img))   # forces full round trip
print("null_op with scalar readback: %.1f ms" % ((time.perf_counter() - t0) / 20 * 1000))

# async dispatch cost only
t0 = time.perf_counter()
outs = [null_op(img) for _ in range(20)]
print("null_op async dispatch only: %.1f ms" % ((time.perf_counter() - t0) / 20 * 1000))
jax.block_until_ready(outs)

# block_until_ready semantics
o = null_op(img)
t0 = time.perf_counter()
jax.block_until_ready(o)
print("block_until_ready after dispatch: %.1f ms" % ((time.perf_counter() - t0) * 1000))

# heavy chain to see if device time shows up in readback timing
float(chain_op(img, 1))
t0 = time.perf_counter()
for _ in range(5):
    v = float(chain_op(img, 20000))
print("20k-iter chain with readback: %.1f ms" % ((time.perf_counter() - t0) / 5 * 1000))
t0 = time.perf_counter()
for _ in range(5):
    v = float(chain_op(img, 1))
print("1-iter chain with readback: %.1f ms" % ((time.perf_counter() - t0) / 5 * 1000))
