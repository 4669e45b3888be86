"""Measure the true (block, window) work-item totals of the pallas shadow
scheduler for representative workloads, to size shadow work capacity."""
import sys; sys.path.insert(0, "/root/repo/scripts"); import _cpu  # noqa
import dataclasses

import jax.numpy as jnp
import numpy as np

from ugrt.config import RenderConfig
from ugrt.core import camera as cam
from ugrt.grid import binning
from ugrt.grid import build as gbuild
from ugrt.scene import procedural
from ugrt.trace import primary as tprim

WIN = 128
R = 128

for name, w, g, nf in [("small", 256, 32, 8000),
                       ("bench", 1024, 128, 75000)]:
    cfg = dataclasses.replace(RenderConfig(), screen_width=w,
                              screen_height=w, grid_x=g, grid_y=g)
    sc = procedural.cathedral(num_faces_target=nf)
    spec = cam.CameraSpec(eye=(3.0, 15.0, 5.0), look_at=(13.0, 13.0, 3.0),
                          up=(0.0, 0.0, 1.0), near=0.1, far=100.0)
    light = cam.CameraSpec(eye=(14.0, 13.0, 8.0),
                           look_at=(14.0, 13.0, 0.0),
                           up=(0.0, 1.0, 0.0), near=0.1, far=100.0)
    cc = jnp.asarray(cam.camcoords_from_spec(spec, cfg.fovy_deg, 1.0))
    lcc = jnp.asarray(cam.camcoords_from_spec(light, cfg.fovy_deg, 1.0))
    cap = cfg.pair_capacity(sc.num_faces)
    v = jnp.asarray(sc.vertices)
    f = jnp.asarray(sc.faces)
    grid = gbuild.build_perspective_grid(v, f, cc, cfg=cfg, capacity=cap)
    res = tprim.trace_primary(v, f, cc, grid, cfg)
    lgrid = gbuild.build_spherical_grid(v, f, lcc, cfg=cfg, capacity=cap)

    n = w * w
    eye = cc[0:3]
    t = res["t"].reshape(n)
    dirs = res["ray_dir"].reshape(n, 3)
    pts = eye[None] + t[:, None] * dirs
    cells = binning.ray_light_cells(
        pts, lcc, cfg.grid_x, cfg.grid_y, cfg.angular_extent,
        cfg.angular_extent, cfg.quirks.y_forward_dot_typo,
        xp=jnp).reshape(n)
    sentinel = cfg.cell_sentinel
    scells = np.sort(np.asarray(cells))
    n_pad = -(-n // R) * R
    scells = np.pad(scells, (0, n_pad - n), constant_values=sentinel)
    blk = scells.reshape(-1, R)
    NB = blk.shape[0]
    NW = lgrid.sorted_faces.shape[0] // WIN
    first = blk[:, 0]
    last_real = np.max(np.where(blk < sentinel, blk, -1), axis=1)
    off = np.asarray(lgrid.cell_offset)
    cnt = np.asarray(lgrid.cell_count)
    k1 = np.clip(first, 0, sentinel - 1)
    k2 = np.clip(last_real, 0, sentinel - 1)
    lo = off[k1]
    hi = off[k2] + cnt[k2]
    live = last_real >= 0
    nwin = np.where(live & (hi > lo), (hi - 1) // WIN - lo // WIN + 1, 0)
    total = int(nwin.sum())
    print(f"{name}: NB={NB} NW={NW} total_windows={total} "
          f"old_cap={2*NB+NW+64} ratio_NB={total/NB:.2f} "
          f"pairs={int(lgrid.total_pairs)}")
