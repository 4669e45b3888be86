"""Controlled timing experiment: is lax.sort cost data-dependent on TPU,
and do chained vs fenced timing methods agree?

Also probes whether closure-captured device arrays add per-dispatch cost
versus explicitly passed args (jax 0.9 hidden-constant hoisting).
"""
import sys; sys.path.insert(0, "/root/repo/scripts"); import _tpu  # noqa
import time

import jax
import jax.numpy as jnp
import numpy as np

from _timing import chain_timeit, sync

N = 1024 * 1024
rng = np.random.default_rng(0)
perm = jnp.asarray(rng.permutation(N).astype(np.int32))
dups = jnp.asarray(rng.integers(0, 16385, N).astype(np.int32))
const_arr = jnp.zeros((N,), jnp.int32)
ray_ids = jnp.arange(N, dtype=jnp.int32)


@jax.jit
def sort2(keys, vals):
    return jax.lax.sort((keys, vals), num_keys=1)


def fenced(name, fn, *args, n=5):
    out = sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = sync(fn(*args))
    print(f"{name:44s} {(time.perf_counter()-t0)/n*1000:9.2f} ms (fenced)",
          flush=True)
    return out


for name, keys in (("perm keys", perm), ("dup keys", dups),
                   ("const keys", const_arr)):
    ms, _ = chain_timeit(None, sort2, keys, ray_ids, n=10)
    print(f"sort2 {name:38s} {ms:9.2f} ms (chained)", flush=True)
    fenced(f"sort2 {name}", sort2, keys, ray_ids)

# closure capture vs explicit arg
big = jnp.asarray(rng.standard_normal((4614, 128, 16)).astype(np.float32))


@jax.jit
def use_big_arg(x, b):
    return jnp.sum(x) + jnp.sum(b[0])


closure = jax.jit(lambda x: jnp.sum(x) + jnp.sum(big[0]))

x0 = jnp.ones((8,), jnp.float32)
ms, _ = chain_timeit(None, use_big_arg, x0, big, n=20)
print(f"{'37MB explicit arg':44s} {ms:9.2f} ms (chained)", flush=True)
ms, _ = chain_timeit(None, closure, x0, n=20)
print(f"{'37MB closure capture':44s} {ms:9.2f} ms (chained)", flush=True)

# dispatch overhead floor
tiny = jax.jit(lambda x: x + 1.0)
ms, _ = chain_timeit(None, tiny, x0, n=50)
print(f"{'tiny x+1 chained':44s} {ms:9.2f} ms (chained)", flush=True)
