"""Capture a profiler trace of sharded_train_step on the 8-device CPU
mesh and report where the gradient all-reduce sits relative to backward
compute (VERDICT r3 #5 / BASELINE "overlapped with the backward trace").
"""
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import dataclasses  # noqa: E402
import glob  # noqa: E402
import gzip  # noqa: E402
import json  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ugrt.config import RenderConfig  # noqa: E402
from ugrt.core import camera as cam  # noqa: E402
from ugrt.dist import mesh as dmesh  # noqa: E402
from ugrt.scene import procedural  # noqa: E402

n = 8
mesh = dmesh.make_mesh(jax.devices()[:n])
gx = 2 * n
cfg = dataclasses.replace(RenderConfig(), screen_width=8 * gx,
                          screen_height=64, grid_x=gx, grid_y=8)
scene = procedural.cornell_box(subdiv=2)
spec = cam.CameraSpec(eye=(0.12, 0.07, 2.5), look_at=(0.0, 0.0, 0.0),
                      up=(0.02, 1.0, 0.01), near=0.1, far=100.0)
light = cam.CameraSpec(eye=(0.1, 0.9, 0.5), look_at=(0.0, -1.0, 0.5),
                       up=(0.0, 0.0, 1.0), near=0.1, far=100.0)
aspect = cfg.screen_width / cfg.screen_height
cc = jnp.asarray(cam.camcoords_from_spec(spec, cfg.fovy_deg, aspect))
lcc = jnp.asarray(cam.camcoords_from_spec(light, cfg.fovy_deg, aspect))[None]
lp = jnp.asarray(np.asarray(light.eye, dtype=np.float32))
cap = cfg.pair_capacity(scene.num_faces)
target = jnp.zeros((cfg.screen_height, cfg.screen_width, 3), jnp.float32)

step = dmesh.sharded_train_step(mesh, cfg=cfg, capacity=cap, num_lights=1,
                                use_spot=True, chunk_size=64)
args = (jnp.asarray(scene.vertices), jnp.asarray(scene.materials),
        jnp.asarray(scene.faces), jnp.asarray(scene.mat_index),
        cc, lcc, lp, target)
out = jax.block_until_ready(step(*args))
print("warm loss:", float(out[0]), flush=True)

outdir = "/tmp/jx_psum"
jax.profiler.start_trace(outdir)
out = jax.block_until_ready(step(*args))
jax.profiler.stop_trace()

f = sorted(glob.glob(outdir + "/plugins/profile/*/*.trace.json.gz"))[-1]
with gzip.open(f) as fh:
    tr = json.load(fh)
ev = tr["traceEvents"]
tids = {}
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "thread_name":
        tids[(e["pid"], e["tid"])] = e["args"].get("name", "")
ops = [e for e in ev if e.get("ph") == "X"
       and "XLA Ops" in tids.get((e["pid"], e["tid"]), "")]
if not ops:  # CPU backend may label tracks differently
    ops = [e for e in ev if e.get("ph") == "X" and "ts" in e and "dur" in e
           and ("all-reduce" in e["name"] or "fusion" in e["name"]
                or "convert" in e["name"])]
t0 = min(e["ts"] for e in ops)
t1 = max(e["ts"] + e["dur"] for e in ops)
ars = [e for e in ops if "all-reduce" in e["name"]]
print(f"step span: {(t1 - t0)/1e3:.2f} ms; {len(ars)} all-reduce events")
for e in sorted(ars, key=lambda e: -e["dur"])[:6]:
    rel0 = (e["ts"] - t0) / (t1 - t0)
    rel1 = (e["ts"] + e["dur"] - t0) / (t1 - t0)
    print(f"  {e['name'][:50]:50s} dur {e['dur']/1e3:7.2f} ms  "
          f"at {rel0:.1%}..{rel1:.1%} of step")
# how much non-collective compute runs concurrently with the big psum?
if ars:
    big = max(ars, key=lambda e: e["dur"])
    a0, a1 = big["ts"], big["ts"] + big["dur"]
    overlap = sum(min(a1, e["ts"] + e["dur"]) - max(a0, e["ts"])
                  for e in ops
                  if "all-reduce" not in e["name"]
                  and e["ts"] < a1 and e["ts"] + e["dur"] > a0)
    print(f"compute time overlapping the largest all-reduce: "
          f"{overlap/1e3:.2f} ms across devices "
          f"({overlap / max(big['dur'] * (n - 1), 1):.0%} of its "
          f"(n-1)-device span)")
