"""Shadow heavy-kernel variant check: current (v1 single-fori) vs the
round-4 per-mb-fori form, at flagship scale (589 live faces)."""
import sys; sys.path.insert(0, "/root/repo/scripts"); import _tpu  # noqa
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from _timing import sync
from ugrt.config import RenderConfig
from ugrt.trace import pallas_tracer as pt

cfg = RenderConfig()
WIN = pt.WIN
MB = pt.MB

rng = np.random.default_rng(0)
NB = 8193
H_LIVE = 589
H_CAP = 1024
NWH = H_CAP // WIN

tbl = rng.standard_normal((16, H_CAP)).astype(np.float32)
tbl[10] = 0.0; tbl[11] = 127.0; tbl[12] = 0.0; tbl[13] = 127.0
tbl[14] = np.arange(H_CAP, dtype=np.float32)
dead = np.arange(H_CAP) >= H_LIVE
tbl[0:3, dead] = 0.0
tbl[10, dead] = 1.0; tbl[11, dead] = 0.0
tri_windows = jnp.asarray(tbl)
heavy_count = jnp.asarray(H_LIVE, jnp.int32)

rays = rng.standard_normal((NB, 8, 128)).astype(np.float32)
rays[:, 3] = np.abs(rays[:, 3]) * 10
rays[:, 5] = rng.integers(0, 128, (NB, 128))
rays[:, 6] = rng.integers(0, 128, (NB, 128))
rays_blocks = jnp.asarray(rays)
# round 5: the production sweeps now take RAY-MAJOR [NB, 128, 8]
rays_rm = jnp.swapaxes(rays_blocks, 1, 2)


def _old_shadow_kernel(nlive_ref, tri_ref, rays_ref, sh_out, *,
                       cfg, nwh):
    """Round-4 form: one fori per mb, carries, single final write."""
    del nwh
    for mb in range(MB):
        rows = tuple(rays_ref[mb, :, c][:, None]
                     for c in (0, 1, 2, 3, 5, 6))
        dx, dy, dz, dist_pt = rows[0], rows[1], rows[2], rows[3]
        rays = (dx, dy, dz, rows[4], rows[5])

        def w_body(w, acc, rays=rays, dx=dx, dy=dy, dz=dz,
                   dist_pt=dist_pt):
            t, reject = pt._heavy_common(tri_ref, rays, w, cfg)
            hit = (~reject) & (t != 0) & (t < jnp.float32(999999.9))
            if not cfg.quirks.shadow_accept_negative_t:
                hit = hit & (t > 0)
            ox = t * dx
            oy = t * dy
            oz = t * dz
            dist_occ = jnp.sqrt(ox * ox + oy * oy + oz * oz)
            sh = hit & (dist_occ + jnp.float32(cfg.shadow_epsilon)
                        < dist_pt)
            return jnp.maximum(acc, jnp.max(sh.astype(jnp.int32),
                                            axis=1)[:, None])

        acc = jax.lax.fori_loop(0, nlive_ref[0], w_body,
                                jnp.zeros((128, 1), jnp.int32))
        sh_out[mb] = acc


def make_old():
    nb = rays_blocks.shape[0]
    nb_pad = -(-nb // MB) * MB
    rb = jnp.pad(rays_blocks, ((0, nb_pad - nb), (0, 0), (0, 0)))
    rays_t = jnp.swapaxes(rb, 1, 2)
    nwh = tri_windows.shape[1] // WIN
    n_live = jnp.clip((heavy_count + WIN - 1) // WIN, 0, nwh).reshape(1)
    gs = pl.GridSpec(
        grid=(nb_pad // MB,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(tri_windows.shape, lambda i: (0, 0)),
                  pl.BlockSpec((MB, 128, 8), lambda i: (i, 0, 0))],
        out_specs=[pl.BlockSpec((MB, 128, 1), lambda i: (i, 0, 0))])

    def call():
        (o,) = pl.pallas_call(
            functools.partial(_old_shadow_kernel, cfg=cfg, nwh=nwh),
            grid_spec=gs,
            out_shape=[jax.ShapeDtypeStruct((nb_pad, 128, 1), jnp.int32)],
        )(n_live, tri_windows, rays_t)
        return o.reshape(nb_pad, 128)[:nb]
    return jax.jit(call)


def bench(name, fn, reps=20):
    out = sync(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out)
    print(f"{name:24s} {(time.perf_counter()-t0)/reps*1000:8.2f} ms",
          flush=True)
    return out


new = jax.jit(lambda: pt.heavy_shadow_sweep(
    heavy_count, tri_windows, rays_rm, cfg=cfg))
o_new = bench("new (v1 single-fori)", new)
old = make_old()
o_old = bench("old (per-mb fori)", old)
print("bitwise:", np.array_equal(np.asarray(o_new), np.asarray(o_old)),
      flush=True)
