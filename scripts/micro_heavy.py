"""Heavy-kernel variant shootout (round-5 item #1).

The round-4 heavy sweeps (pallas_tracer._heavy_primary_kernel /
_heavy_shadow_kernel) cost ~48 ms/step at 1024^2 x ~690 heavy faces,
of which ~35 ms is Mosaic while-loop setup (~2 us per fori instance x
MB=8 instances/step x 1024 steps x 2 kernels) — the math itself is
~7 ms.  This script measures variants that restructure the loops:

  cur  — whatever pallas_tracer.heavy_primary_sweep currently ships
  v1   — ONE fori over windows per grid step; mb unrolled inside the
         body; accumulation through the OUTPUT refs (no carries)
  v2   — window axis as minor grid dimension, dead windows skipped via
         pl.when(w < nlive); output block revisited across w
  v3   — full static unroll (windows x mb), per-window live select

Each at MB in {8, 16, 32} (or pass names/MB values as argv).
Correctness: every variant is checked bitwise against the current
kernel's output before timing.  Outcome history: v1 (22.4 ms vs the
round-4 form's 53.1 here / 25.6 in-step) shipped mid-round-5; v3
(15.9 ms) then replaced it for live-dense tables, dispatched at
runtime by live density (see _heavy_primary_kernel_unrolled).
"""
import sys; sys.path.insert(0, "/root/repo/scripts"); import _tpu  # noqa
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from _timing import chain_timeit, sync
from ugrt.config import RenderConfig
from ugrt.trace import pallas_tracer as pt

cfg = RenderConfig()
WIN = pt.WIN
_BIG = pt._BIG
_MAXI = pt._MAXI

# ---- flagship-scale synthetic workload ------------------------------
rng = np.random.default_rng(0)
NB = 8193                      # 1M rays / 128 + guard block
H_LIVE = 691                   # live heavy faces (round-4 flagship)
H_CAP = 1024                   # static capacity
NWH = H_CAP // WIN

# Packed heavy table [16, H_CAP] — random but live/dead structured like
# pack_heavy_windows output.
tbl = rng.standard_normal((16, H_CAP)).astype(np.float32)
tbl[10] = 0.0; tbl[11] = 127.0; tbl[12] = 0.0; tbl[13] = 127.0  # fp all
tbl[14] = np.arange(H_CAP, dtype=np.float32)                    # face id
dead = np.arange(H_CAP) >= H_LIVE
tbl[0:3, dead] = 0.0                                            # det=0
tbl[10, dead] = 1.0; tbl[11, dead] = 0.0                        # empty fp
tri_windows = jnp.asarray(tbl)
heavy_count = jnp.asarray(H_LIVE, jnp.int32)

rays = rng.standard_normal((NB, 8, 128)).astype(np.float32)
rays[:, 3] = np.abs(rays[:, 3]) * 10      # dist
rays[:, 4] = rng.integers(0, 128, (NB, 128))   # gx? actually comp 4,5
rays[:, 5] = rng.integers(0, 128, (NB, 128))
rays_blocks = jnp.asarray(rays)
# round 5: the production sweeps now take RAY-MAJOR [NB, 128, 8]
rays_rm = jnp.swapaxes(rays_blocks, 1, 2)


def _mk_call(kernel_fn, grid_spec, out_shapes, nb_pad, extra=()):
    def call(n_live, tri, rays_t):
        outs = pl.pallas_call(
            kernel_fn, grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((nb_pad, 128, 1), dt)
                       for dt in out_shapes],
        )(n_live, tri, rays_t)
        return [o.reshape(nb_pad, 128) for o in outs]
    return call


def _prep(mb):
    nb_pad = -(-NB // mb) * mb
    rb = rays_blocks
    if nb_pad != NB:
        rb = jnp.pad(rb, ((0, nb_pad - NB), (0, 0), (0, 0)))
    rays_t = jnp.swapaxes(rb, 1, 2)      # [nb_pad, 128, 8]
    n_live = jnp.clip((heavy_count + WIN - 1) // WIN, 0, NWH).reshape(1)
    return nb_pad, rays_t, n_live


def _primary_window_body(tri_ref, rays, w, acc):
    t_acc, i_acc = acc
    t, reject = pt._heavy_common(tri_ref, rays, w, cfg)
    if cfg.quirks.abs_t:
        t = jnp.abs(t)
    t = jnp.where(reject | (t <= 0), jnp.float32(_BIG), t)
    tmin = jnp.min(t, axis=1)[:, None]
    face_row = tri_ref[14, pl.ds(w * WIN, WIN)][None, :]
    fcand = jnp.where(t == tmin, face_row, jnp.float32(_BIG))
    fmin = jnp.min(fcand, axis=1)[:, None]
    upd = tmin < t_acc
    return (jnp.where(upd, tmin, t_acc),
            jnp.where(upd, fmin.astype(jnp.int32), i_acc))


# ---- v1: one fori over windows, mb unrolled, out-ref accumulation ----
def _v1_kernel(nlive_ref, tri_ref, rays_ref, t_out, i_out, *, mb):
    t_out[:] = jnp.full((mb, 128, 1), jnp.float32(_BIG))
    i_out[:] = jnp.full((mb, 128, 1), jnp.int32(_MAXI))

    def w_body(w, carry):
        for m in range(mb):
            rays = tuple(rays_ref[m, :, c][:, None] for c in (0, 1, 2, 4, 5))
            acc = (t_out[m], i_out[m])
            t_acc, i_acc = _primary_window_body(tri_ref, rays, w, acc)
            t_out[m] = t_acc
            i_out[m] = i_acc
        return carry

    jax.lax.fori_loop(0, nlive_ref[0], w_body, 0)


def make_v1(mb):
    nb_pad, rays_t, n_live = _prep(mb)
    gs = pl.GridSpec(
        grid=(nb_pad // mb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(tri_windows.shape, lambda i: (0, 0)),
                  pl.BlockSpec((mb, 128, 8), lambda i: (i, 0, 0))],
        out_specs=[pl.BlockSpec((mb, 128, 1), lambda i: (i, 0, 0))
                   for _ in range(2)])
    call = _mk_call(functools.partial(_v1_kernel, mb=mb), gs,
                    (jnp.float32, jnp.int32), nb_pad)
    return jax.jit(lambda: call(n_live, tri_windows, rays_t))


# ---- v2: window as minor grid dim, pl.when dead-skip -----------------
def _v2_kernel(nlive_ref, tri_ref, rays_ref, t_out, i_out, *, mb):
    w = pl.program_id(1)

    @pl.when(w == 0)
    def _init():
        t_out[:] = jnp.full((mb, 128, 1), jnp.float32(_BIG))
        i_out[:] = jnp.full((mb, 128, 1), jnp.int32(_MAXI))

    @pl.when(w < nlive_ref[0])
    def _live():
        for m in range(mb):
            rays = tuple(rays_ref[m, :, c][:, None] for c in (0, 1, 2, 4, 5))
            acc = (t_out[m], i_out[m])
            t_acc, i_acc = _primary_window_body(tri_ref, rays, w, acc)
            t_out[m] = t_acc
            i_out[m] = i_acc


def make_v2(mb):
    nb_pad, rays_t, n_live = _prep(mb)
    gs = pl.GridSpec(
        grid=(nb_pad // mb, NWH),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(tri_windows.shape, lambda i, w: (0, 0)),
                  pl.BlockSpec((mb, 128, 8), lambda i, w: (i, 0, 0))],
        out_specs=[pl.BlockSpec((mb, 128, 1), lambda i, w: (i, 0, 0))
                   for _ in range(2)])
    call = _mk_call(functools.partial(_v2_kernel, mb=mb), gs,
                    (jnp.float32, jnp.int32), nb_pad)
    return jax.jit(lambda: call(n_live, tri_windows, rays_t))


# ---- v3: full static unroll with dead-skip ---------------------------
def _v3_kernel(nlive_ref, tri_ref, rays_ref, t_out, i_out, *, mb):
    for m in range(mb):
        rays = tuple(rays_ref[m, :, c][:, None] for c in (0, 1, 2, 4, 5))
        t_acc = jnp.full((128, 1), jnp.float32(_BIG))
        i_acc = jnp.full((128, 1), jnp.int32(_MAXI))
        for w in range(NWH):
            nt, ni = _primary_window_body(tri_ref, rays, w, (t_acc, i_acc))
            livew = w < nlive_ref[0]
            t_acc = jnp.where(livew, nt, t_acc)
            i_acc = jnp.where(livew, ni, i_acc)
        t_out[m] = t_acc
        i_out[m] = i_acc


def make_v3(mb):
    nb_pad, rays_t, n_live = _prep(mb)
    gs = pl.GridSpec(
        grid=(nb_pad // mb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(tri_windows.shape, lambda i: (0, 0)),
                  pl.BlockSpec((mb, 128, 8), lambda i: (i, 0, 0))],
        out_specs=[pl.BlockSpec((mb, 128, 1), lambda i: (i, 0, 0))
                   for _ in range(2)])
    call = _mk_call(functools.partial(_v3_kernel, mb=mb), gs,
                    (jnp.float32, jnp.int32), nb_pad)
    return jax.jit(lambda: call(n_live, tri_windows, rays_t))


# ---- reference result (current kernel) -------------------------------
sel = sys.argv[1:] or ["cur", "v1", "v2", "v3"]
mbs = [int(x) for x in sel if x.isdigit()] or [8, 16, 32]
cur = jax.jit(lambda: pt.heavy_primary_sweep(
    heavy_count, tri_windows, rays_rm, cfg=cfg))
ref_t, ref_i = [np.asarray(o)[:NB] for o in sync(cur())]
print("ref computed", flush=True)
if "cur" in sel:
    ms, _ = chain_timeit(None, lambda x: pt.heavy_primary_sweep(
        heavy_count, tri_windows, x, cfg=cfg), rays_rm, n=20)
    print(f"cur (MB=8)           {ms:8.2f} ms", flush=True)

for name, mk in [("v1", make_v1), ("v2", make_v2), ("v3", make_v3)]:
    if name not in sel:
        continue
    for mb in mbs:
        try:
            fn = mk(mb)
            t_o, i_o = [np.asarray(o)[:NB] for o in sync(fn())]
            ok = (np.array_equal(t_o, ref_t) and np.array_equal(i_o, ref_i))
            # no-arg fn: dispatches queue in-order on the device, one
            # final fence == chained timing
            import time
            sync(fn())
            t0 = time.perf_counter()
            reps = 20
            for _ in range(reps):
                out = fn()
            sync(out)
            ms = (time.perf_counter() - t0) / reps * 1000
            print(f"{name} (MB={mb:2d})  bitwise={'OK ' if ok else 'FAIL'}"
                  f"  {ms:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name} (MB={mb:2d})  ERROR: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
