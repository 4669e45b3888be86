"""Light-grid parameterization (RenderConfig.light_grid_mode) tests.

The reference computes per-frame max hit-point angles and then overrides
them with pi (main.cu:174-187); light_grid_mode="extent" (via explicit
x_max/y_max from tshadow.light_extents) uses the computed values and
light_grid_mode="windowed" (tshadow.light_window) maps the signed-angle
window of the hit points across the whole grid, so the light grid
resolves the lit region instead of collapsing it into a few cells.
Occlusion results must stay essentially identical
(same conservative candidate unions, modulo vertex-AABB binning
differences at the new cell granularity).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from ugrt.core import camera as cam
from ugrt.diff import render_grad
from ugrt.grid import build as gbuild
from ugrt.trace import primary as tprim
from ugrt.trace import shadow as tshadow


def _setup(cfg, cornell, camera, light):
    cc = jnp.asarray(cam.camcoords_from_spec(camera, cfg.fovy_deg, 1.0))
    lcc = jnp.asarray(cam.camcoords_from_spec(light, cfg.fovy_deg, 1.0))
    v = jnp.asarray(cornell.vertices)
    f = jnp.asarray(cornell.faces)
    cap = cfg.pair_capacity(cornell.num_faces)
    grid = gbuild.build_perspective_grid(v, f, cc, cfg=cfg, capacity=cap)
    prim = tprim.trace_primary(v, f, cc, grid, cfg)
    return cc, lcc, v, f, cap, prim


def test_auto_extent_tightens_and_stays_in_grid(small_cfg, cornell,
                                                generic_camera,
                                                generic_light):
    cfg = small_cfg
    cc, lcc, v, f, cap, prim = _setup(cfg, cornell, generic_camera,
                                      generic_light)
    xm, ym = tshadow.light_extents(prim, cc[:3], lcc, cfg)
    xm_f, ym_f = float(xm), float(ym)
    pi32 = float(np.float32(np.pi))
    assert 0 < xm_f <= pi32 and 0 < ym_f <= pi32
    # every hit point must map inside the grid under the new extent
    from ugrt.grid import binning
    pts = (np.asarray(cc[:3])[None]
           + np.asarray(prim["t"]).reshape(-1, 1)
           * np.asarray(prim["ray_dir"]).reshape(-1, 3))
    cells = binning.ray_light_cells(
        pts.astype(np.float32), np.asarray(lcc), cfg.grid_x, cfg.grid_y,
        xm_f, ym_f, cfg.quirks.y_forward_dot_typo, xp=np)
    assert (cells < cfg.cell_sentinel).all()


def test_auto_extent_shadow_matches_pi_extent(small_cfg, cornell,
                                              generic_camera,
                                              generic_light):
    cfg = small_cfg
    cc, lcc, v, f, cap, prim = _setup(cfg, cornell, generic_camera,
                                      generic_light)

    lg_pi = gbuild.build_spherical_grid(v, f, lcc, cfg=cfg, capacity=cap)
    sh_pi, _ = tshadow.trace_shadow(v, f, lcc, lg_pi, prim, cc[:3], cfg)

    xm, ym = tshadow.light_extents(prim, cc[:3], lcc, cfg)
    lg_a = gbuild.build_spherical_grid(v, f, lcc, cfg=cfg, capacity=cap,
                                       x_max=xm, y_max=ym)
    sh_a, _ = tshadow.trace_shadow(v, f, lcc, lg_a, prim, cc[:3], cfg,
                                   x_max=xm, y_max=ym)

    a = np.asarray(sh_a)
    p = np.asarray(sh_pi)
    mism = (a != p).sum()
    assert mism <= a.size * 2e-3, f"{mism}/{a.size} shadow flags differ"


def test_auto_extent_pallas_matches_xla(small_cfg, cornell,
                                        generic_camera, generic_light):
    """Backend parity is exact for the SAME extents."""
    cfg = small_cfg
    cc, lcc, v, f, cap, prim = _setup(cfg, cornell, generic_camera,
                                      generic_light)
    xm, ym = tshadow.light_extents(prim, cc[:3], lcc, cfg)
    lg = gbuild.build_spherical_grid(v, f, lcc, cfg=cfg, capacity=cap,
                                     x_max=xm, y_max=ym)
    sh_x, _ = tshadow.trace_shadow(v, f, lcc, lg, prim, cc[:3], cfg,
                                   x_max=xm, y_max=ym)
    sh_p, _ = tshadow.trace_shadow(v, f, lcc, lg, prim, cc[:3], cfg,
                                   backend="pallas", interpret=True,
                                   x_max=xm, y_max=ym)
    np.testing.assert_array_equal(np.asarray(sh_x), np.asarray(sh_p))


def test_windowed_shadow_matches_pi_extent(small_cfg, cornell,
                                           generic_camera, generic_light):
    """The windowed parameterization is occlusion-equivalent: shadow
    masks match the reference mapping up to binning-granularity
    differences."""
    cfg = small_cfg
    cc, lcc, v, f, cap, prim = _setup(cfg, cornell, generic_camera,
                                      generic_light)

    lg_pi = gbuild.build_spherical_grid(v, f, lcc, cfg=cfg, capacity=cap)
    sh_pi, _ = tshadow.trace_shadow(v, f, lcc, lg_pi, prim, cc[:3], cfg)

    win = tshadow.light_window(prim, cc[:3], lcc, cfg)
    lg_w = gbuild.build_spherical_grid(v, f, lcc, cfg=cfg,
                                       capacity=2 * cap, window=win)
    sh_w, ovf = tshadow.trace_shadow(v, f, lcc, lg_w, prim, cc[:3], cfg,
                                     window=win)
    assert not bool(ovf)
    a = np.asarray(sh_w)
    p = np.asarray(sh_pi)
    mism = (a != p).sum()
    assert mism <= a.size * 2e-3, f"{mism}/{a.size} shadow flags differ"


def test_windowed_pallas_matches_xla(small_cfg, cornell, generic_camera,
                                     generic_light):
    cfg = small_cfg
    cc, lcc, v, f, cap, prim = _setup(cfg, cornell, generic_camera,
                                      generic_light)
    win = tshadow.light_window(prim, cc[:3], lcc, cfg)
    lg = gbuild.build_spherical_grid(v, f, lcc, cfg=cfg, capacity=2 * cap,
                                     window=win)
    sh_x, _ = tshadow.trace_shadow(v, f, lcc, lg, prim, cc[:3], cfg,
                                   window=win)
    sh_p, _ = tshadow.trace_shadow(v, f, lcc, lg, prim, cc[:3], cfg,
                                   backend="pallas", interpret=True,
                                   window=win)
    np.testing.assert_array_equal(np.asarray(sh_x), np.asarray(sh_p))


def test_windowed_render_color(small_cfg, cornell, generic_camera,
                               generic_light):
    """End-to-end render in windowed mode: close to the reference-mode
    image."""
    cfg_pi = small_cfg
    cfg_a = dataclasses.replace(cfg_pi, light_grid_mode="windowed")
    cc = jnp.asarray(cam.camcoords_from_spec(generic_camera,
                                             cfg_pi.fovy_deg, 1.0))
    lcc = jnp.asarray(cam.camcoords_from_spec(generic_light,
                                              cfg_pi.fovy_deg, 1.0))[None]
    lp = jnp.asarray(np.asarray(generic_light.eye, np.float32))
    v = jnp.asarray(cornell.vertices)
    f = jnp.asarray(cornell.faces)
    mats = jnp.asarray(cornell.materials)
    mi = jnp.asarray(cornell.mat_index)
    cap = cfg_pi.pair_capacity(cornell.num_faces)

    img_pi, ovf1 = render_grad.render_color(
        v, mats, f, mi, cc, lcc, lp, cfg=cfg_pi, capacity=cap,
        num_lights=1, use_spot=False)
    img_a, ovf2 = render_grad.render_color(
        v, mats, f, mi, cc, lcc, lp, cfg=cfg_a, capacity=cap,
        num_lights=1, use_spot=False)
    assert not bool(ovf1) and not bool(ovf2)
    diff = np.abs(np.asarray(img_pi) - np.asarray(img_a))
    frac = (diff.max(axis=-1) > 1e-3).mean()
    assert frac <= 2e-3, f"{frac:.4%} of pixels differ"
