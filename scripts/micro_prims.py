"""Micro-benchmarks of TPU primitives that drive sweep-design choices."""
import sys; sys.path.insert(0, "/root/repo/scripts"); import _tpu  # noqa
import time
import numpy as np
import jax, jax.numpy as jnp

key = jax.random.PRNGKey(0)


def timeit(name, fn, *args, n=10):
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/n*1000:8.2f} ms")
    return out


CAP = 440192
WCAP = 20736
B = 128

tri9 = jax.random.normal(key, (9, CAP), jnp.float32)
tri16r = jax.random.normal(key, (CAP, 16), jnp.float32)
off = (jax.random.randint(key, (WCAP,), 0, CAP - B)).astype(jnp.int32)
idx = off[:, None] + jnp.arange(B, dtype=jnp.int32)[None, :]

timeit("take axis1 [9,cap] -> [9,W,128]", lambda t, i: jnp.take(
    t, i, axis=1, mode="clip"), tri9, idx)
timeit("row gather [cap,16] -> [W,128,16]", lambda t, i: t[i], tri16r, idx)
timeit("row gather+transp -> [9?,W,128]", lambda t, i: jnp.transpose(
    t[i], (2, 0, 1)), tri16r, idx)

# dynamic_slice in chunks: items are contiguous - slabs via reshape of a
# 128-aligned repack (gather rows once)
N = 1 << 20
t_r = jax.random.normal(key, (N,), jnp.float32)
d_r = jax.random.normal(key, (N, 3), jnp.float32)
cells = jax.random.randint(key, (N,), 0, 16385).astype(jnp.int32)
rid = jnp.arange(N, dtype=jnp.int32)

timeit("sort 1M (cell,id)", lambda c: jax.lax.sort((c, rid), num_keys=1),
       cells)
timeit("sort 1M (cell,id,t,dx,dy,dz)", lambda c: jax.lax.sort(
    (c, rid, t_r, d_r[:, 0], d_r[:, 1], d_r[:, 2]), num_keys=1), cells)
perm = jax.lax.sort((cells, rid), num_keys=1)[1]
timeit("gather rows [1M,3] by perm", lambda d, p: d[p], d_r, perm)
timeit("gather rows [1M,8] by perm", lambda d, p: jnp.pad(
    d, ((0, 0), (0, 5)))[p], d_r, perm)

# grid-build sort sizes
for n in (440192, 554752, 2 << 20):
    k32 = jax.random.randint(key, (n,), 0, 1 << 30,
                             dtype=jnp.int32).astype(jnp.uint32)
    timeit(f"sort {n} packed u32", lambda kk: jax.lax.sort(kk), k32)

# batched sort: [32, 17336]
k2 = jax.random.randint(key, (32, 17336), 0, 1 << 30,
                        dtype=jnp.int32).astype(jnp.uint32)
timeit("batched sort [32, 17k] u32", lambda kk: jax.lax.sort(
    kk, dimension=1), k2)
k3 = jax.random.randint(key, (128, 4336), 0, 1 << 30,
                        dtype=jnp.int32).astype(jnp.uint32)
timeit("batched sort [128, 4.3k] u32", lambda kk: jax.lax.sort(
    kk, dimension=1), k3)

# scatter 440k values into 2M slots
pos = jax.random.randint(key, (CAP,), 0, 2 << 20).astype(jnp.int32)
vals = jax.random.randint(key, (CAP,), 0, 1 << 20).astype(jnp.int32)
timeit("scatter 440k -> 2M", lambda p, v: jnp.zeros(
    (2 << 20,), jnp.int32).at[p].set(v, mode="drop"), pos, vals)
