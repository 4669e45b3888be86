"""Gradient tests: autodiff through refinement + shading vs finite
differences (BASELINE north star: pixel-grad max abs err vs FD ≈ 0)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ugrt.config import RenderConfig
from ugrt.core import camera as cam
from ugrt.diff import render_grad
from ugrt.scene import procedural


def _setup(cfg):
    # Tilted, non-axis-aligned triangle: all normal components nonzero so
    # the |normal| quirk (trace_kernel.cu:241-243) is locally smooth —
    # an axis-aligned triangle sits exactly on the abs() kink.
    sc = procedural.single_triangle()
    sc = dataclasses.replace(
        sc, vertices=np.asarray(
            [[-1.0, -1.1, -3.1], [1.1, -0.9, -2.7], [0.05, 1.2, -3.4]],
            dtype=np.float32))
    spec = cam.CameraSpec(eye=(0.01, 0.02, 2.0), look_at=(0.0, 0.0, -1.0),
                          up=(0.0, 1.0, 0.0), near=0.1, far=100.0)
    light = cam.CameraSpec(eye=(0.5, 1.5, 1.0), look_at=(0.0, 0.0, -3.0),
                           up=(0, 1, 0), near=0.1, far=100.0)
    aspect = cfg.screen_width / cfg.screen_height
    cc = jnp.asarray(cam.camcoords_from_spec(spec, cfg.fovy_deg, aspect))
    lcc = jnp.asarray(cam.camcoords_from_spec(light, cfg.fovy_deg,
                                              aspect))[None]
    lp = jnp.asarray(np.asarray(light.eye, dtype=np.float32))
    return sc, cc, lcc, lp


def _color_fn(sc, cc, lcc, lp, cfg, use_spot=False):
    cap = cfg.pair_capacity(sc.num_faces)
    faces = jnp.asarray(sc.faces)
    mat_index = jnp.asarray(sc.mat_index)

    def fn(verts, mats):
        return render_grad.render_color(
            verts, mats, faces, mat_index, cc, lcc, lp, cfg=cfg,
            capacity=cap, num_lights=1, use_spot=use_spot)

    return fn


def test_material_gradient_matches_fd(tiny_cfg):
    """Color is linear in materials where unclamped — FD must match
    tightly."""
    cfg = tiny_cfg
    sc, cc, lcc, lp = _setup(cfg)
    fn = _color_fn(sc, cc, lcc, lp, cfg)
    verts = jnp.asarray(sc.vertices)
    mats = jnp.asarray(sc.materials)

    loss = lambda m: jnp.sum(fn(verts, m))
    g = jax.grad(loss)(mats)

    eps = 1e-3
    g_np = np.asarray(g)
    for slot in range(6):
        m_p = mats.at[0, slot].add(eps)
        m_m = mats.at[0, slot].add(-eps)
        fd = (float(loss(m_p)) - float(loss(m_m))) / (2 * eps)
        assert abs(fd - g_np[0, slot]) < 1e-2 * max(1.0, abs(fd)), (
            f"slot {slot}: fd={fd} vs ad={g_np[0, slot]}")


def test_vertex_gradient_matches_fd(tiny_cfg):
    """Vertex z-translation changes t and shading smoothly over interior
    pixels; FD on a masked (interior-only) loss must match autodiff."""
    cfg = tiny_cfg
    sc, cc, lcc, lp = _setup(cfg)
    fn = _color_fn(sc, cc, lcc, lp, cfg)
    verts = jnp.asarray(sc.vertices)
    mats = jnp.asarray(sc.materials)

    base = fn(verts, mats)
    # Interior mask: pixels that stay hits under ±2e-3 perturbations of
    # any coordinate (away from visibility edges).
    hit = np.asarray(base.sum(-1) > 0)
    from scipy import ndimage  # available? fall back to manual erosion
    try:
        interior = ndimage.binary_erosion(hit, iterations=3)
    except Exception:
        interior = hit
    mask = jnp.asarray(interior[..., None].astype(np.float32))

    loss = lambda v: jnp.sum(fn(v, mats) * mask)
    g = np.asarray(jax.grad(loss)(verts))

    eps = 1e-3
    checks = 0
    for vi in range(3):
        for axis in range(3):
            v_p = verts.at[vi, axis].add(eps)
            v_m = verts.at[vi, axis].add(-eps)
            fd = (float(loss(v_p)) - float(loss(v_m))) / (2 * eps)
            ad = g[vi, axis]
            # float32 render; FD noise scales with loss magnitude
            tol = max(2e-2 * abs(fd), 0.5)
            assert abs(fd - ad) < tol, (
                f"v{vi}.{axis}: fd={fd} ad={ad}")
            checks += 1
    assert checks == 9


def test_render_and_grad_step(tiny_cfg):
    """Full inverse-rendering step: loss decreases along -grad."""
    cfg = tiny_cfg
    sc, cc, lcc, lp = _setup(cfg)
    cap = cfg.pair_capacity(sc.num_faces)
    faces = jnp.asarray(sc.faces)
    mat_index = jnp.asarray(sc.mat_index)
    verts = jnp.asarray(sc.vertices)
    mats = jnp.asarray(sc.materials)

    # Target: render with different materials.
    target = render_grad.render_color(
        verts, mats * 0.5, faces, mat_index, cc, lcc, lp, cfg=cfg,
        capacity=cap, num_lights=1, use_spot=False)

    out = render_grad.render_and_grad(
        verts, mats, faces, mat_index, cc, lcc, lp, target, cfg=cfg,
        capacity=cap, num_lights=1, use_spot=False)
    assert float(out["loss"]) > 0
    assert np.abs(np.asarray(out["grad_materials"])).sum() > 0

    lr = 0.5
    mats2 = mats - lr * out["grad_materials"]
    out2 = render_grad.render_and_grad(
        verts, mats2, faces, mat_index, cc, lcc, lp, target, cfg=cfg,
        capacity=cap, num_lights=1, use_spot=False)
    assert float(out2["loss"]) < float(out["loss"])


def test_grad_zero_when_miss(tiny_cfg):
    """Pixels that miss contribute no vertex gradient."""
    cfg = tiny_cfg
    sc, cc, lcc, lp = _setup(cfg)
    fn = _color_fn(sc, cc, lcc, lp, cfg)
    verts = jnp.asarray(sc.vertices)
    mats = jnp.asarray(sc.materials)
    base = fn(verts, mats)
    missmask = jnp.asarray(
        (np.asarray(base.sum(-1)) == 0)[..., None].astype(np.float32))
    g = jax.grad(lambda v: jnp.sum(fn(v, mats) * missmask))(verts)
    assert float(jnp.abs(g).max()) == 0.0
