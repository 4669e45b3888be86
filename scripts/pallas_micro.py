"""Isolate pallas sweep kernel costs: DMA vs compute vs program overhead."""
import sys; sys.path.insert(0, "/root/repo")
import time, functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CAP8 = 571520
NITEMS = 20480
B, R, COLS = 128, 128, 128

tri = jnp.zeros((CAP8, COLS), jnp.float32)
rays = jnp.zeros((16384, 8, 128), jnp.float32)
offs = jnp.asarray((np.random.default_rng(0).integers(0, (CAP8-B)//8, NITEMS)*8).astype(np.int32))
cnts = jnp.full((NITEMS,), 100, jnp.int32)
tiles = jnp.asarray(np.random.default_rng(1).integers(0, 16384, NITEMS).astype(np.int32))

def compute_block(trib, rayb):
    # ~50 elementwise ops mimic MT
    acc = trib[:, 0][:, None] * rayb[0, :][None, :]
    for i in range(1, 9):
        acc = acc + trib[:, i][:, None] * rayb[i % 8, :][None, :]
        acc = acc * 1.0001 - 0.5
        acc = jnp.abs(acc)
    return jnp.min(acc, axis=0), jnp.argmin(acc, axis=0).astype(jnp.int32)

def make(variant, wchunk):
    def kern(offs_ref, cnts_ref, tiles_ref, tri_hbm, rays_hbm, t_out, i_out, tv, rv, sems):
        pid = pl.program_id(0)
        first = pid * wchunk
        def tri_dma(slot, item):
            off = pl.multiple_of(offs_ref[item], 8)
            return pltpu.make_async_copy(tri_hbm.at[pl.ds(off, B), :], tv.at[slot], sems.at[slot])
        def ray_dma(slot, item):
            return pltpu.make_async_copy(rays_hbm.at[tiles_ref[item]], rv.at[slot], sems.at[2+slot])
        if variant in ("full", "dma"):
            tri_dma(0, first).start(); ray_dma(0, first).start()
        def body(k, _):
            item = first + k
            cur = jax.lax.rem(k, 2); nxt = jax.lax.rem(k+1, 2)
            if variant in ("full", "dma"):
                @pl.when(k + 1 < wchunk)
                def _():
                    tri_dma(nxt, item+1).start(); ray_dma(nxt, item+1).start()
                tri_dma(cur, item).wait(); ray_dma(cur, item).wait()
            if variant in ("full", "compute"):
                tmin, win = compute_block(tv[cur], rv[cur])
                t_out[k, :] = tmin
                i_out[k, :] = win
            else:
                t_out[k, :] = jnp.zeros((R,), jnp.float32)
                i_out[k, :] = jnp.zeros((R,), jnp.int32)
            return 0
        jax.lax.fori_loop(0, wchunk, body, 0)

    n_prog = NITEMS // wchunk
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3, grid=(n_prog,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)]*2,
        out_specs=[pl.BlockSpec((wchunk, R), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)]*2,
        scratch_shapes=[pltpu.VMEM((2, B, COLS), jnp.float32), pltpu.VMEM((2, 8, 128), jnp.float32), pltpu.SemaphoreType.DMA((4,))])
    f = pl.pallas_call(kern, grid_spec=gs,
        out_shape=[jax.ShapeDtypeStruct((NITEMS, R), jnp.float32), jax.ShapeDtypeStruct((NITEMS, R), jnp.int32)])
    return jax.jit(lambda: f(offs, cnts, tiles, tri, rays))

for variant in ("dma", "compute", "full"):
    for wchunk in (8, 64):
        try:
            fn = make(variant, wchunk)
            out = fn(); jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(3): out = fn()
            jax.block_until_ready(out)
            dt = (time.perf_counter()-t0)/3
            print(f"{variant:8s} wchunk={wchunk:3d}  {dt*1000:8.1f} ms  ({dt/NITEMS*1e6:.2f} us/item)")
        except Exception as e:
            print(f"{variant} wchunk={wchunk} FAILED: {str(e)[:200]}")
