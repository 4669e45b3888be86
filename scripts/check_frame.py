import sys; sys.path.insert(0, "/root/repo/scripts"); import _cpu  # noqa
import numpy as np, dataclasses, warnings, time
warnings.filterwarnings("ignore"); np.seterr(all="ignore")
from ugrt.config import RenderConfig
from ugrt.core import camera as cam
from ugrt.scene import procedural
from ugrt.ref import oracle
from ugrt.api.renderer import Renderer

cfg = dataclasses.replace(RenderConfig(), screen_width=128, screen_height=128, grid_x=16, grid_y=16)
sc = procedural.cornell_box(subdiv=2)
# generic (non-symmetric) camera to avoid knife-edge ties
spec = cam.CameraSpec(eye=(0.123, 0.071, 2.531), look_at=(-0.037, 0.011, 0.0), up=(0.02, 1.0, 0.013), near=0.1, far=100.0)
light = cam.CameraSpec(eye=(0.13, 0.87, 0.52), look_at=(0.07, -1.0, 0.49), up=(0.0, 0.0, 1.0), near=0.1, far=100.0)
lp = (0.13, 0.87, 0.52)

t0=time.time()
ores = oracle.render_frame(sc, spec, [light], lp, cfg, use_spot=True)
print("oracle time:", time.time()-t0)

r = Renderer(sc, cfg)
r.frame_cnt = 5  # force spot
t0=time.time()
out = r.render(spec, [light], lp, use_spot=True)
img_d = np.asarray(out["image"]); print("device time:", time.time()-t0, "overflow:", bool(out["overflow"]))

img_o = ores["image"]
sh_d = np.asarray(out["shadowed"]); sh_o = ores["shadowed"]
id_d = np.asarray(out["primary"]["face_id"]); id_o = ores["primary"]["face_id"]
print("face_id mismatches:", (id_d != id_o).sum(), "/", id_d.size)
print("shadow mismatches:", (sh_d != sh_o).sum(), "oracle shadowed:", sh_o.sum(), "device:", sh_d.sum())
diff = np.abs(img_d.astype(int) - img_o.astype(int))
print("image: max diff", diff.max(), "mean", diff.mean(), "px>2:", (diff.max(axis=-1) > 2).sum())
