import sys; sys.path.insert(0, "/root/repo/scripts"); import _cpu  # noqa
import numpy as np, dataclasses, warnings
warnings.filterwarnings("ignore"); np.seterr(all="ignore")
import jax.numpy as jnp
from ugrt.config import RenderConfig
from ugrt.core import camera as cam
from ugrt.scene import procedural
from ugrt.ref import oracle
from ugrt.grid import build as gbuild

cfg = dataclasses.replace(RenderConfig(), screen_width=128, screen_height=128, grid_x=16, grid_y=16)
sc = procedural.cornell_box(subdiv=2)
spec = cam.CameraSpec(eye=(0,0,2.5), look_at=(0,0,0), up=(0,1,0), near=0.1, far=100.0)
cc = cam.camcoords_from_spec(spec, cfg.fovy_deg, 1.0)
og = oracle.build_grid(sc, cc, cfg)

r_, c_ = 40, 73
bx, by = c_//8, r_//8
cell = (bx*16+by)*1
cnt, off = og.cell_count[cell], og.cell_offset[cell]
fl = og.sorted_faces[off:off+cnt]
print("cell", cell, "count", cnt, "faces:", fl, "has58:", 58 in fl.tolist())

dirs = cam.primary_ray_dirs(cc, 128, 128, xp=np)
d = dirs[r_, c_]
eye = cc[:3]
for f in [58, 53]:
    v = sc.vertices[sc.faces[f]].astype(np.float32)
    v0, e1, e2 = v[0], v[1]-v[0], v[2]-v[0]
    tvec = (eye - v0).astype(np.float32)
    pvec = np.cross(d, e2).astype(np.float32)
    det = np.float32(np.dot(e1, pvec))
    inv = np.float32(1.0)/det
    u = np.float32(np.dot(tvec, pvec))*inv
    qvec = np.cross(tvec, e1).astype(np.float32)
    vv = np.float32(np.dot(d, qvec))*inv
    t = np.float32(np.dot(e2, qvec))*inv
    print(f"face {f}: det={det:.3e} u={u!r} v={vv!r} u+v={u+vv!r} t={t!r}")
