"""Frame renderer — the TPU equivalent of the reference's display() loop.

display() (/root/reference/main.cu:59-302) per frame: camera matrices →
perspective grid build → primary trace → per-light (spherical grid build +
shadow reorder + shadow trace) → shade (simpleShade for the first frame,
spotlight_shade after, main.cu:205-219) → add_shadows → image.

Here the whole frame is ONE jitted, statically-shaped XLA graph
(`render_frame_device`); camera matrix setup stays on host (tiny, float32,
GL-faithful — ugrt.core.camera) exactly like the reference computes them
on CPU via OpenGL.

State-machine parity note: the reference shades with whatever camcoords
the light loop left in constant memory — the LAST light's camera — and
with d_cam_position still holding the primary eye (SURVEY.md §3.2).  The
`shade_camcoords` argument makes that explicit; `render_frame` wires it
the reference's way.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ugrt.config import RenderConfig
from ugrt.core import camera as cam
from ugrt.grid import build as gbuild
from ugrt.shade import shaders
from ugrt.trace import primary as tprimary
from ugrt.trace import shadow as tshadow


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "capacity", "num_lights", "use_spot",
                     "chunk_size"))
def render_frame_device(vertices, faces, mat_index, materials,
                        camcoords, light_camcoords, light_position, *,
                        cfg: RenderConfig, capacity: int, num_lights: int,
                        use_spot: bool, chunk_size: int = 256):
    """One fully-fused frame: returns dict with float RGB image [H,W,3],
    u8 image, shadow mask, and primary-hit buffers.

    light_camcoords: [num_lights, 64].  Shading uses the last light's
    camcoords when lights exist (reference behavior), else the camera's.
    """
    grid = gbuild.build_perspective_grid(
        vertices, faces, camcoords, cfg=cfg, capacity=capacity)
    primary = tprimary.trace_primary(
        vertices, faces, camcoords, grid, cfg, chunk_size=chunk_size)

    eye = camcoords[0:3]
    H, W = cfg.screen_height, cfg.screen_width
    shadowed = jnp.zeros((H, W), dtype=jnp.int32)
    overflow = grid.overflow

    shade_cc = camcoords
    for li in range(num_lights):
        lcc = light_camcoords[li]
        lgrid = gbuild.build_spherical_grid(
            vertices, faces, lcc, cfg=cfg, capacity=capacity)
        sh, sh_ovf = tshadow.trace_shadow(
            vertices, faces, lcc, lgrid, primary, eye, cfg,
            chunk_size=chunk_size)
        shadowed = jnp.maximum(shadowed, sh)
        overflow = overflow | lgrid.overflow | sh_ovf
        shade_cc = lcc

    if use_spot:
        color = shaders.spotlight(primary, shade_cc, light_position, eye,
                                  mat_index, materials, cfg, xp=jnp)
    else:
        color = shaders.lambert(primary, shade_cc, light_position, eye,
                                mat_index, materials, cfg, xp=jnp)

    image_u8 = shaders.add_shadows_u8(shaders.to_u8(color, xp=jnp),
                                      shadowed, xp=jnp)
    color_f = shaders.add_shadows_f32(color, shadowed, xp=jnp)

    return dict(image=image_u8, color=color_f, shadowed=shadowed,
                primary=primary, overflow=overflow)


class Renderer:
    """Host-side frame driver (the GLUT-loop replacement).

    Owns device copies of the scene, computes per-frame camera matrices on
    host, and invokes the fused frame graph.  The first rendered frame
    uses the plain Lambert shader and later frames the spotlight shader,
    matching main.cu:205-219 (frame_cnt < 2).
    """

    def __init__(self, scene, cfg: RenderConfig,
                 capacity: int | None = None):
        self.cfg = cfg
        self.vertices = jnp.asarray(scene.vertices)
        self.faces = jnp.asarray(scene.faces)
        self.mat_index = jnp.asarray(scene.mat_index)
        self.materials = jnp.asarray(scene.materials)
        self.capacity = (capacity if capacity is not None
                         else cfg.pair_capacity(scene.num_faces))
        self.frame_cnt = 0

    def update_vertices(self, vertices):
        """Dynamic scenes / animation: swap in new vertex positions."""
        self.vertices = jnp.asarray(vertices)

    def render(self, camera_spec: cam.CameraSpec,
               light_specs: Sequence[cam.CameraSpec],
               light_position, use_spot: bool | None = None,
               chunk_size: int = 256):
        cfg = self.cfg
        self.frame_cnt += 1
        if use_spot is None:
            use_spot = self.frame_cnt >= 2   # main.cu:205

        aspect = cfg.screen_width / cfg.screen_height
        cc = jnp.asarray(
            cam.camcoords_from_spec(camera_spec, cfg.fovy_deg, aspect))
        if light_specs:
            lccs = jnp.stack([
                jnp.asarray(
                    cam.camcoords_from_spec(ls, cfg.fovy_deg, aspect))
                for ls in light_specs])
        else:
            lccs = jnp.zeros((1, 64), dtype=jnp.float32)

        out = render_frame_device(
            self.vertices, self.faces, self.mat_index, self.materials,
            cc, lccs, jnp.asarray(np.asarray(light_position,
                                             dtype=np.float32)),
            cfg=cfg, capacity=self.capacity, num_lights=len(light_specs),
            use_spot=use_spot, chunk_size=chunk_size)
        return out
