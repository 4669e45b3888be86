"""Micro-test: coefficient-form Möller–Trumbore as MXU matmuls in Mosaic.

Validates the v5 kernel design before the rewrite (VERDICT r4 #1):
  * dot_general with BOTH contractions on the sublane axis (transposed
    lhs: [8, T] x [8, R] -> [T, R]) lowers and runs on the real chip;
  * precision=HIGHEST is accepted and how close it lands to VPU f32;
  * per-item cost vs the v4 VPU elementwise form.
"""
import sys; sys.path.insert(0, "/root/repo/scripts"); import _tpu  # noqa
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN = 256
NR = 128
NITEMS = 4096

DN = (((0,), (0,)), ((), ()))


def mxu_kernel(items_ref, tri_ref, rays_ref, det_out, u_out, v_out, *,
               precision):
    del items_ref
    T = tri_ref[0]
    D = rays_ref[0]
    det = jax.lax.dot_general(T[0:8, :], D, DN,
                              preferred_element_type=jnp.float32,
                              precision=precision)
    up = jax.lax.dot_general(T[8:16, :], D, DN,
                             preferred_element_type=jnp.float32,
                             precision=precision)
    vp = jax.lax.dot_general(T[16:24, :], D, DN,
                             preferred_element_type=jnp.float32,
                             precision=precision)
    inv = 1.0 / det
    det_out[0] = det
    u_out[0] = up * inv
    v_out[0] = vp * inv


def vpu_kernel(items_ref, tri_ref, rays_ref, det_out, u_out, v_out):
    del items_ref
    T = tri_ref[0]
    D = rays_ref[0]

    def tc(c):
        return T[c, :][:, None]

    def rc(c):
        return D[c, :][None, :]

    dx, dy, dz = rc(0), rc(1), rc(2)
    det = dx * tc(0) + dy * tc(1) + dz * tc(2)
    up = dx * tc(8) + dy * tc(9) + dz * tc(10)
    vp = dx * tc(16) + dy * tc(17) + dz * tc(18)
    inv = 1.0 / det
    det_out[0] = det
    u_out[0] = up * inv
    v_out[0] = vp * inv


def run(kernel, tri, rays, items):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(items.shape[0],),
        in_specs=[
            pl.BlockSpec((1, 24, WIN), lambda i, it: (it[i], 0, 0)),
            pl.BlockSpec((1, 8, NR), lambda i, it: (it[i] % 8, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, WIN, NR), lambda i, it: (it[i], 0, 0))
            for _ in range(3)
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((tri.shape[0], WIN, NR),
                                        jnp.float32)] * 3,
    )(items, tri, rays)


def main():
    rng = np.random.default_rng(0)
    tri = np.zeros((NITEMS, 24, WIN), np.float32)
    tri[:, 0:3] = rng.standard_normal((NITEMS, 3, WIN))
    tri[:, 8:11] = rng.standard_normal((NITEMS, 3, WIN))
    tri[:, 16:19] = rng.standard_normal((NITEMS, 3, WIN))
    tri[:, 5] = rng.standard_normal((NITEMS, WIN))   # k slot
    tri[:, 6] = 7.0                                   # key slot
    rays = np.zeros((8, 8, NR), np.float32)
    rays[:, 0:3] = rng.standard_normal((8, 3, NR))
    rays[:, 3] = 7.0                                  # key row
    tri_j = jnp.asarray(tri)
    rays_j = jnp.asarray(rays)
    items = jnp.arange(NITEMS, dtype=jnp.int32)

    # Reference on host.
    ref_det = np.einsum("icw,kcr->ikwr", tri[:, 0:3], rays[:, 0:3])
    ref_det = ref_det[np.arange(NITEMS), np.arange(NITEMS) % 8]

    from _timing import chain_timeit

    for prec in (jax.lax.Precision.HIGHEST, jax.lax.Precision.DEFAULT):
        k = functools.partial(mxu_kernel, precision=prec)
        try:
            t0 = time.perf_counter()
            det, u, v = run(k, tri_j, rays_j, items)
            det = np.asarray(det)
            compile_s = time.perf_counter() - t0
        except Exception as e:
            print(f"prec={prec}: FAILED: {type(e).__name__}: {e}")
            continue
        err = np.abs(det - ref_det) / np.maximum(np.abs(ref_det), 1e-6)
        print(f"prec={prec}: compile {compile_s:.1f}s  "
              f"max rel err {err.max():.3e}")
        ms, _ = chain_timeit(None, lambda t: run(k, t, rays_j, items),
                             tri_j, n=10)
        print(f"  mxu sweep {NITEMS} items x [{WIN}x{NR}]: {ms:.2f} ms "
              f"({ms / NITEMS * 1e3:.3f} us/item)")

    det_v, u_v, v_v = run(vpu_kernel, tri_j, rays_j, items)
    det_v = np.asarray(det_v)
    err = np.abs(det_v - ref_det) / np.maximum(np.abs(ref_det), 1e-6)
    print(f"vpu: max rel err {err.max():.3e}")
    ms, _ = chain_timeit(None, lambda t: run(vpu_kernel, t, rays_j, items),
                         tri_j, n=10)
    print(f"  vpu sweep: {ms:.2f} ms ({ms / NITEMS * 1e3:.3f} us/item)")

    # MXU HIGHEST vs VPU bitwise?
    k = functools.partial(mxu_kernel, precision=jax.lax.Precision.HIGHEST)
    det_m = np.asarray(run(k, tri_j, rays_j, items)[0])
    print("mxu HIGHEST == vpu bitwise:", np.array_equal(det_m, det_v),
          " max abs diff:", float(np.abs(det_m - det_v).max()))


if __name__ == "__main__":
    main()
