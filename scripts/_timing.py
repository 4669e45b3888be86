"""Trustworthy timing for TPU scripts.

Under the axon-tunnel TPU platform, jax.block_until_ready can return
before the dispatched computation actually finishes (observed: a loop of
5 render steps "completed" in 0.7 ms that a per-step device->host value
read shows take 589 ms each).  The only reliable fence is pulling a
value to the host, so `timeit` syncs EVERY iteration by reading one
element of one output leaf.  `roundtrip_ms()` measures the fence cost so
sub-stage numbers can be read net of it.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(jnp.ravel(leaf)[:1]))
    return out


def roundtrip_ms(n: int = 10) -> float:
    x = sync(jnp.zeros((8,), jnp.float32))
    t0 = time.perf_counter()
    for _ in range(n):
        sync(x + 1.0)
    return (time.perf_counter() - t0) / n * 1000


def timeit(name, fn, *args, n=5, **kw):
    if not hasattr(fn, "lower"):  # bare python callable -> jit it
        fn = jax.jit(fn)
    out = sync(fn(*args, **kw))
    t0 = time.perf_counter()
    for _ in range(n):
        out = sync(fn(*args, **kw))
    print(f"{name:36s} {(time.perf_counter()-t0)/n*1000:9.2f} ms",
          flush=True)
    return out
