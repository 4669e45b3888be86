import sys; sys.path.insert(0, "/root/repo/scripts"); import _cpu  # noqa
import numpy as np, dataclasses, warnings
warnings.filterwarnings("ignore"); np.seterr(all="ignore")
import jax.numpy as jnp
from ugrt.config import RenderConfig
from ugrt.core import camera as cam
from ugrt.scene import procedural
from ugrt.grid import build as gbuild
from ugrt.trace import primary as tprim

cfg = dataclasses.replace(RenderConfig(), screen_width=128, screen_height=128, grid_x=16, grid_y=16)
sc = procedural.cornell_box(subdiv=2)
spec = cam.CameraSpec(eye=(0.123,0.071,2.531), look_at=(-0.037,0.011,0.0), up=(0.02,1.0,0.013), near=0.1, far=100.0)
cc = jnp.asarray(cam.camcoords_from_spec(spec, cfg.fovy_deg, 1.0))
cap = cfg.pair_capacity(sc.num_faces)
v = jnp.asarray(sc.vertices); f = jnp.asarray(sc.faces)
dg = gbuild.build_perspective_grid(v, f, cc, cfg=cfg, capacity=cap, align=8)

res_x = tprim.trace_primary(v, f, cc, dg, cfg)
res_p = tprim.trace_primary(v, f, cc, dg, cfg, backend="pallas", interpret=True)
id_x = np.asarray(res_x["face_id"]); id_p = np.asarray(res_p["face_id"])
print("face_id equal:", np.array_equal(id_x, id_p), "mismatches:", (id_x != id_p).sum())
print("t max diff:", np.abs(np.asarray(res_x["t"]) - np.asarray(res_p["t"])).max())
