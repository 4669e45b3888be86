"""Flagship benchmark: rays/s/chip forward+backward.

Workload = BASELINE config 3 at reference scale: sibenik-scale procedural
cathedral (~75k triangles) or a real OBJ via --scene, 1024x1024 primary
rays over a 128x128 perspective grid, one light (spherical-grid shadow
pass), spot shading — plus the full backward pass (gradients w.r.t.
vertices and materials), which the reference does not have.  Metric:
primary rays per second for one forward+backward frame step, per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference repo publishes no numbers (BASELINE.md), so vs_baseline is
measured against a fixed nominal target of 1e8 rays/s/chip fwd+bwd.

Optional dev modes (default output shape unchanged):
  --scene foo.obj   bench a real OBJ scene instead of the procedural one
  --mesh N          run the step as sharded_train_step over an N-device
                    mesh (N=1 on the single chip measures sharding
                    overhead vs the unsharded step — VERDICT r2 #7)
  --breakdown       add a per-stage ms table to the JSON line
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

NOMINAL_BASELINE = 1.0e8  # rays/s/chip fwd+bwd (self-set target)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default=None,
                    help="OBJ file to bench instead of the procedural "
                         "cathedral")
    ap.add_argument("--mesh", type=int, default=0,
                    help="run sharded_train_step over an N-device mesh")
    ap.add_argument("--breakdown", action="store_true",
                    help="include per-stage ms in the JSON output")
    ap.add_argument("--iters", type=int, default=0,
                    help="override timed iteration count")
    args = ap.parse_args(argv)

    import os
    import jax
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser("~/.jax_cache_" + jax.default_backend()))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from ugrt.config import RenderConfig
    from ugrt.core import camera as cam
    from ugrt.diff import render_grad
    from ugrt.scene import procedural

    backend = jax.default_backend()
    if backend != "tpu":
        # CPU fallback for local smoke runs: shrink the workload.
        cfg = dataclasses.replace(RenderConfig(), screen_width=256,
                                  screen_height=256, grid_x=32, grid_y=32)
        tri_target = 8000
        iters = 2
    else:
        cfg = RenderConfig()
        tri_target = 75000
        iters = 5
    if args.iters:
        iters = args.iters

    if args.scene:
        from ugrt.scene import model as smodel
        scene = smodel.load_scene(args.scene)
        scene_name = os.path.basename(args.scene)
    else:
        scene = procedural.cathedral(num_faces_target=tri_target)
        scene_name = "procedural-cathedral"
    spec = cam.CameraSpec(eye=(3.0, 15.0, 5.0), look_at=(13.0, 13.0, 3.0),
                          up=(0.0, 0.0, 1.0), near=0.1, far=100.0)
    light = cam.CameraSpec(eye=(14.0, 13.0, 8.0),
                           look_at=(14.0, 13.0, 0.0),
                           up=(0.0, 1.0, 0.0), near=0.1, far=100.0)
    aspect = cfg.screen_width / cfg.screen_height
    cc = jnp.asarray(cam.camcoords_from_spec(spec, cfg.fovy_deg, aspect))
    lcc = jnp.asarray(
        cam.camcoords_from_spec(light, cfg.fovy_deg, aspect))[None]
    lp = jnp.asarray(np.asarray(light.eye, dtype=np.float32))
    cap = cfg.pair_capacity(scene.num_faces)

    verts = jnp.asarray(scene.vertices)
    mats = jnp.asarray(scene.materials)
    faces = jnp.asarray(scene.faces)
    mat_index = jnp.asarray(scene.mat_index)
    target = jnp.zeros((cfg.screen_height, cfg.screen_width, 3),
                       dtype=jnp.float32)

    chunk = 1024 if backend == "tpu" else 256
    trace_backend = "pallas" if backend == "tpu" else "xla"

    if args.mesh:
        from ugrt.dist import mesh as dmesh
        devices = jax.devices()[:args.mesh]
        mesh = dmesh.make_mesh(devices)
        sfn = dmesh.sharded_train_step(
            mesh, cfg=cfg, capacity=cap, num_lights=1, use_spot=True,
            chunk_size=chunk, trace_backend=trace_backend)

        def step(v, m):
            loss, gv, gm = sfn(v, m, faces, mat_index, cc, lcc, lp,
                               target)
            return loss, gv, gm
    else:
        def step(v, m):
            out = render_grad.render_and_grad(
                v, m, faces, mat_index, cc, lcc, lp, target, cfg=cfg,
                capacity=cap, num_lights=1, use_spot=True,
                chunk_size=chunk, trace_backend=trace_backend)
            return out["loss"], out["grad_vertices"], out["grad_materials"]

    # Warmup / compile.  Sync by pulling the scalar loss to the host:
    # under the axon-tunnel TPU platform block_until_ready can return
    # before the dispatched computation finishes, so a device->host
    # value read is the only trustworthy fence.
    out = step(verts, mats)
    float(out[0])

    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(verts, mats)
        float(out[0])
    dt = (time.perf_counter() - t0) / iters

    result = {
        "metric": "primary_rays_per_s_fwd_bwd",
        "value": cfg.image_size / dt,
        "unit": f"rays/s/chip ({cfg.screen_width}x{cfg.screen_height}, "
                f"{scene.num_faces} tris, {backend}"
                + (f", mesh={args.mesh}" if args.mesh else "") + ")",
        "vs_baseline": cfg.image_size / dt / NOMINAL_BASELINE,
    }

    if args.breakdown:
        from ugrt.grid import build as gbuild
        from ugrt.trace import primary as tprim
        from ugrt.trace import shadow as tshadow

        def t_ms(fn, *a, n=3):
            o = fn(*a)
            np.asarray(jax.device_get(
                jnp.ravel(jax.tree_util.tree_leaves(o)[0])[:1]))
            t0 = time.perf_counter()
            for _ in range(n):
                o = fn(*a)
                np.asarray(jax.device_get(
                    jnp.ravel(jax.tree_util.tree_leaves(o)[0])[:1]))
            return (time.perf_counter() - t0) / n * 1000, o

        bp = jax.jit(lambda v: gbuild.build_perspective_grid(
            v, faces, cc, cfg=cfg, capacity=cap))
        ms_g, grid = t_ms(bp, verts)
        bs = jax.jit(lambda v: gbuild.build_spherical_grid(
            v, faces, lcc[0], cfg=cfg, capacity=cap))
        ms_lg, lgrid = t_ms(bs, verts)
        tp = jax.jit(lambda v, g: tprim.trace_primary(
            v, faces, cc, g, cfg, chunk_size=chunk,
            backend=trace_backend))
        ms_p, prim = t_ms(tp, verts, grid)
        ts = jax.jit(lambda v, g, p: tshadow.trace_shadow(
            v, faces, lcc[0], g, p, cc[0:3], cfg, chunk_size=chunk,
            backend=trace_backend)[0])
        ms_s, _ = t_ms(ts, verts, lgrid, prim)
        result["detail"] = {
            "grid_ms": round(ms_g, 1), "light_grid_ms": round(ms_lg, 1),
            "primary_ms": round(ms_p, 1), "shadow_ms": round(ms_s, 1),
            "step_ms": round(dt * 1000, 1), "scene": scene_name,
        }

    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
