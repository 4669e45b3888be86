import sys; sys.path.insert(0, "/root/repo/scripts"); import _cpu  # noqa
import numpy as np, dataclasses, warnings
warnings.filterwarnings("ignore"); np.seterr(all="ignore")
import jax.numpy as jnp
from ugrt.config import RenderConfig
from ugrt.core import camera as cam
from ugrt.scene import procedural
from ugrt.grid import build as gbuild
from ugrt.trace import primary as tprim, shadow as tshadow

cfg = dataclasses.replace(RenderConfig(), screen_width=128, screen_height=128, grid_x=16, grid_y=16)
sc = procedural.cornell_box(subdiv=2)
spec = cam.CameraSpec(eye=(0.123,0.071,2.531), look_at=(-0.037,0.011,0.0), up=(0.02,1.0,0.013), near=0.1, far=100.0)
light = cam.CameraSpec(eye=(0.13,0.87,0.52), look_at=(0.07,-1.0,0.49), up=(0,0,1), near=0.1, far=100.0)
cc = jnp.asarray(cam.camcoords_from_spec(spec, cfg.fovy_deg, 1.0))
lcc = jnp.asarray(cam.camcoords_from_spec(light, cfg.fovy_deg, 1.0))
cap = cfg.pair_capacity(sc.num_faces)
v = jnp.asarray(sc.vertices); f = jnp.asarray(sc.faces)

dg = gbuild.build_perspective_grid(v, f, cc, cfg=cfg, capacity=cap)
prim = tprim.trace_primary(v, f, cc, dg, cfg)

lg1 = gbuild.build_spherical_grid(v, f, lcc, cfg=cfg, capacity=cap)
sh_x, _ = tshadow.trace_shadow(v, f, lcc, lg1, prim, cc[:3], cfg)

lg8 = gbuild.build_spherical_grid(v, f, lcc, cfg=cfg, capacity=cap, align=8)
sh_p, _ = tshadow.trace_shadow(v, f, lcc, lg8, prim, cc[:3], cfg, backend="pallas", interpret=True)

a, b = np.asarray(sh_x), np.asarray(sh_p)
print("shadow equal:", np.array_equal(a, b), "mismatches:", (a != b).sum(), "shadowed:", a.sum(), b.sum())
