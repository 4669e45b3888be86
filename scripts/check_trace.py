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
print("pairs:", og.total_pairs, int(dg.total_pairs), "overflow:", bool(dg.overflow))
print("cell_count equal:", np.array_equal(np.asarray(dg.cell_count), og.cell_count))
print("sorted_faces equal:", np.array_equal(np.asarray(dg.sorted_faces[:int(dg.total_pairs)]), og.sorted_faces))

dres = tprim.trace_primary(jnp.asarray(sc.vertices), jnp.asarray(sc.faces), jnp.asarray(cc), dg, cfg)
t_d = np.asarray(dres["t"]); t_o = ores["t"]
id_d = np.asarray(dres["face_id"]); id_o = ores["face_id"]
print("face_id equal:", np.array_equal(id_d, id_o), "mismatches:", (id_d!=id_o).sum())
print("t max abs diff:", np.abs(t_d-t_o).max())
print("normal max diff:", np.abs(np.asarray(dres["normal"])-ores["normal"]).max())
