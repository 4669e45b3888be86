"""Real-TPU parity gate: pallas backend vs XLA backend, primary + shadow.

Run on the TPU chip (no interpret mode) — catches Mosaic lowering and
numerics regressions the interpret-mode tests cannot.
"""
import sys; sys.path.insert(0, "/root/repo/scripts"); import _tpu  # noqa
import dataclasses

import jax.numpy as jnp
import numpy as np

from ugrt.config import RenderConfig
from ugrt.core import camera as cam
from ugrt.grid import build as gbuild
from ugrt.scene import procedural
from ugrt.trace import primary as tprim
from ugrt.trace import shadow as tshadow

cfg = dataclasses.replace(RenderConfig(), screen_width=256,
                          screen_height=256, grid_x=32, grid_y=32)
sc = procedural.cathedral(num_faces_target=8000)
spec = cam.CameraSpec(eye=(3.0, 15.0, 5.0), look_at=(13.0, 13.0, 3.0),
                      up=(0.0, 0.0, 1.0), near=0.1, far=100.0)
light = cam.CameraSpec(eye=(14.0, 13.0, 8.0), look_at=(14.0, 13.0, 0.0),
                       up=(0.0, 1.0, 0.0), near=0.1, far=100.0)
cc = jnp.asarray(cam.camcoords_from_spec(spec, cfg.fovy_deg, 1.0))
lcc = jnp.asarray(cam.camcoords_from_spec(light, cfg.fovy_deg, 1.0))
cap = cfg.pair_capacity(sc.num_faces)
v = jnp.asarray(sc.vertices)
f = jnp.asarray(sc.faces)

grid = gbuild.build_perspective_grid(v, f, cc, cfg=cfg, capacity=cap)
res_x = tprim.trace_primary(v, f, cc, grid, cfg)
res_p = tprim.trace_primary(v, f, cc, grid, cfg, backend="pallas")

id_x = np.asarray(res_x["face_id"])
id_p = np.asarray(res_p["face_id"])
t_x = np.asarray(res_x["t"])
t_p = np.asarray(res_p["t"])
ok1 = np.array_equal(id_x, id_p)
ok2 = np.array_equal(t_x, t_p)
print("primary face_id equal:", ok1, "mismatches:", int((id_x != id_p).sum()))
print("primary t bitwise:", ok2, "maxdiff:", float(np.abs(t_x - t_p).max()))

lgrid = gbuild.build_spherical_grid(v, f, lcc, cfg=cfg, capacity=cap)
eye = cc[0:3]
sh_x, ov_x = tshadow.trace_shadow(v, f, lcc, lgrid, res_x, eye, cfg)
sh_p, ov_p = tshadow.trace_shadow(v, f, lcc, lgrid, res_x, eye, cfg,
                                  backend="pallas")
sh_x = np.asarray(sh_x)
sh_p = np.asarray(sh_p)
ok3 = np.array_equal(sh_x, sh_p)
print("shadow equal:", ok3, "mismatches:", int((sh_x != sh_p).sum()),
      "overflow:", bool(ov_x), bool(ov_p))
sys.exit(0 if (ok1 and ok2 and ok3) else 1)
