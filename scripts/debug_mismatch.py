import sys; sys.path.insert(0, "/root/repo/scripts"); import _cpu  # noqa
import numpy as np, dataclasses, warnings
warnings.filterwarnings("ignore"); np.seterr(all="ignore")
import jax.numpy as jnp
from ugrt.config import RenderConfig
from ugrt.core import camera as cam
from ugrt.scene import procedural
from ugrt.ref import oracle
from ugrt.grid import build as gbuild
from ugrt.trace import primary as tprim

cfg = dataclasses.replace(RenderConfig(), screen_width=128, screen_height=128, grid_x=16, grid_y=16)
sc = procedural.cornell_box(subdiv=2)
spec = cam.CameraSpec(eye=(0,0,2.5), look_at=(0,0,0), up=(0,1,0), near=0.1, far=100.0)
cc = cam.camcoords_from_spec(spec, cfg.fovy_deg, 1.0)
og = oracle.build_grid(sc, cc, cfg)
ores = oracle.trace_primary(sc, cc, og, cfg)
cap = cfg.pair_capacity(sc.num_faces)
dg = gbuild.build_perspective_grid(jnp.asarray(sc.vertices), jnp.asarray(sc.faces), jnp.asarray(cc), cfg=cfg, capacity=cap)
dres = tprim.trace_primary(jnp.asarray(sc.vertices), jnp.asarray(sc.faces), jnp.asarray(cc), dg, cfg)
id_d = np.asarray(dres["face_id"]); id_o = ores["face_id"]
t_d = np.asarray(dres["t"]); t_o = ores["t"]
bad = np.argwhere(id_d != id_o)
print("num bad:", len(bad))
for (r, c) in bad[:12]:
    print(f"px ({r},{c}): oracle id={id_o[r,c]} t={t_o[r,c]:.6f} | device id={id_d[r,c]} t={t_d[r,c]:.6f}")
