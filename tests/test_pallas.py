"""Pallas kernel parity tests (interpreter mode on the CPU backend)."""

import jax.numpy as jnp
import numpy as np

from ugrt.core import camera as cam
from ugrt.grid import build as gbuild
from ugrt.trace import primary as tprim
from ugrt.trace import shadow as tshadow


def _cc(spec, cfg):
    return jnp.asarray(cam.camcoords_from_spec(
        spec, cfg.fovy_deg, cfg.screen_width / cfg.screen_height))


def test_pallas_primary_matches_xla(small_cfg, cornell, generic_camera):
    cfg = small_cfg
    cc = _cc(generic_camera, cfg)
    cap = cfg.pair_capacity(cornell.num_faces)
    v = jnp.asarray(cornell.vertices)
    f = jnp.asarray(cornell.faces)

    grid8 = gbuild.build_perspective_grid(v, f, cc, cfg=cfg, capacity=cap,
                                          align=8)
    res_x = tprim.trace_primary(v, f, cc, grid8, cfg)
    res_p = tprim.trace_primary(v, f, cc, grid8, cfg, backend="pallas",
                                interpret=True)
    np.testing.assert_array_equal(np.asarray(res_p["face_id"]),
                                  np.asarray(res_x["face_id"]))
    np.testing.assert_array_equal(np.asarray(res_p["t"]),
                                  np.asarray(res_x["t"]))


def test_aligned_grid_matches_unaligned_semantics(small_cfg, cornell,
                                                  generic_camera):
    """align=8 only relocates segments; per-cell real contents match."""
    cfg = small_cfg
    cc = _cc(generic_camera, cfg)
    cap = cfg.pair_capacity(cornell.num_faces)
    v = jnp.asarray(cornell.vertices)
    f = jnp.asarray(cornell.faces)

    g1 = gbuild.build_perspective_grid(v, f, cc, cfg=cfg, capacity=cap)
    g8 = gbuild.build_perspective_grid(v, f, cc, cfg=cfg, capacity=cap,
                                       align=8)
    np.testing.assert_array_equal(np.asarray(g1.cell_count),
                                  np.asarray(g8.cell_count))
    c1 = np.asarray(g1.cell_count)
    o1 = np.asarray(g1.cell_offset)
    o8 = np.asarray(g8.cell_offset)
    s1 = np.asarray(g1.sorted_faces)
    s8 = np.asarray(g8.sorted_faces)
    assert (o8 % 8 == 0).all()
    for c in range(0, cfg.num_cells, 37):  # sample cells
        n = c1[c]
        np.testing.assert_array_equal(s1[o1[c]:o1[c] + n],
                                      s8[o8[c]:o8[c] + n])


def test_pallas_heavy_primary_matches_xla(small_cfg, cornell):
    """The dedicated heavy kernels (pack_heavy_windows +
    heavy_primary_sweep) replicate ugrt.trace.heavy's op order exactly:
    results must be bitwise equal, exercised with a camera inside the
    box so behind-the-eye walls land in the heavy list."""
    cfg = small_cfg
    spec = cam.CameraSpec(eye=(0.05, 0.03, 0.4), look_at=(0.1, 0.04, -1.0),
                          up=(0.02, 1.0, 0.013), near=0.1, far=100.0)
    cc = _cc(spec, cfg)
    cap = cfg.pair_capacity(cornell.num_faces) * 16
    v = jnp.asarray(cornell.vertices)
    f = jnp.asarray(cornell.faces)

    import dataclasses

    # Two configs so BOTH heavy-kernel dispatch branches run (see
    # heavy_primary_sweep): the default capacity leaves the table
    # mostly dead (looped kernel); capacity 128 makes it mostly live
    # (fully unrolled kernel).  Both must match XLA bitwise.
    for hcap in (cfg.heavy_capacity, 128):
        c = dataclasses.replace(cfg, heavy_capacity=hcap)
        grid = gbuild.build_perspective_grid(v, f, cc, cfg=c,
                                             capacity=cap,
                                             heavy_threshold=16)
        assert int(grid.heavy_count) > 0
        res_x = tprim.trace_primary(v, f, cc, grid, c)
        res_p = tprim.trace_primary(v, f, cc, grid, c, backend="pallas",
                                    interpret=True)
        np.testing.assert_array_equal(np.asarray(res_p["face_id"]),
                                      np.asarray(res_x["face_id"]))
        np.testing.assert_array_equal(np.asarray(res_p["t"]),
                                      np.asarray(res_x["t"]))


def test_pallas_heavy_shadow_matches_xla(small_cfg, cornell,
                                         generic_camera, generic_light):
    """Pallas heavy shadow occlusion == heavy_shadowed (XLA), exactly.

    The pallas path runs heavy faces through the scheduled shadow sweep
    as footprint-box windows (pack_heavy_coeff_windows); its u/v
    inv-det accept form rounds differently from the XLA path's
    multiplied-out det^2 form, but the shadow margins (epsilon accept +
    shadow_epsilon distance) absorb ulp differences — asserted exact
    here and bounded at <= 16 px by the bench parity gate."""
    cfg = small_cfg
    cc = _cc(generic_camera, cfg)
    lcc = _cc(generic_light, cfg)
    cap = cfg.pair_capacity(cornell.num_faces) * 16
    v = jnp.asarray(cornell.vertices)
    f = jnp.asarray(cornell.faces)

    grid = gbuild.build_perspective_grid(v, f, cc, cfg=cfg, capacity=cap)
    prim = tprim.trace_primary(v, f, cc, grid, cfg)
    lg = gbuild.build_spherical_grid(v, f, lcc, cfg=cfg, capacity=cap,
                                     heavy_threshold=4)
    assert int(lg.heavy_count) > 0
    sh_x, _ = tshadow.trace_shadow(v, f, lcc, lg, prim, cc[:3], cfg)
    sh_p, _ = tshadow.trace_shadow(v, f, lcc, lg, prim, cc[:3], cfg,
                                   backend="pallas", interpret=True)
    np.testing.assert_array_equal(np.asarray(sh_x), np.asarray(sh_p))


def test_pallas_multi_slab_matches_xla(cornell, generic_camera,
                                       generic_light):
    """NS=4 through BOTH pallas sweeps (VERDICT r4 #10): the per-slab
    loops in primary.py and shadow.py's pallas branches never ran with
    num_slabs > 1 in any other test.  Primary must match XLA bitwise
    (identical op order per slab); shadow uses the coefficient form, so
    it is compared exactly here too — on this scene no candidate sits
    within an ulp of an accept boundary (the documented divergence
    class)."""
    import dataclasses

    from ugrt.config import RenderConfig

    cfg = dataclasses.replace(RenderConfig(), screen_width=64,
                              screen_height=64, grid_x=8, grid_y=8,
                              num_slabs=4)
    cc = _cc(generic_camera, cfg)
    lcc = _cc(generic_light, cfg)
    cap = cfg.pair_capacity(cornell.num_faces)
    v = jnp.asarray(cornell.vertices)
    f = jnp.asarray(cornell.faces)

    grid = gbuild.build_perspective_grid(v, f, cc, cfg=cfg, capacity=cap,
                                         align=8)
    res_x = tprim.trace_primary(v, f, cc, grid, cfg)
    res_p = tprim.trace_primary(v, f, cc, grid, cfg, backend="pallas",
                                interpret=True)
    np.testing.assert_array_equal(np.asarray(res_p["face_id"]),
                                  np.asarray(res_x["face_id"]))
    np.testing.assert_array_equal(np.asarray(res_p["t"]),
                                  np.asarray(res_x["t"]))
    # Slab binning actually spreads pairs across slabs on this scene.
    occupied = [
        int(np.asarray(grid.cell_count)[s::cfg.num_slabs].sum())
        for s in range(cfg.num_slabs)]
    assert sum(1 for o in occupied if o > 0) >= 2, occupied

    lg = gbuild.build_spherical_grid(v, f, lcc, cfg=cfg, capacity=cap,
                                     align=8)
    sh_x, _ = tshadow.trace_shadow(v, f, lcc, lg, res_x, cc[:3], cfg)
    sh_p, _ = tshadow.trace_shadow(v, f, lcc, lg, res_x, cc[:3], cfg,
                                   backend="pallas", interpret=True)
    np.testing.assert_array_equal(np.asarray(sh_x), np.asarray(sh_p))


def test_pallas_shadow_matches_xla(small_cfg, cornell, generic_camera,
                                   generic_light):
    cfg = small_cfg
    cc = _cc(generic_camera, cfg)
    lcc = _cc(generic_light, cfg)
    cap = cfg.pair_capacity(cornell.num_faces)
    v = jnp.asarray(cornell.vertices)
    f = jnp.asarray(cornell.faces)

    grid = gbuild.build_perspective_grid(v, f, cc, cfg=cfg, capacity=cap)
    prim = tprim.trace_primary(v, f, cc, grid, cfg)

    lg1 = gbuild.build_spherical_grid(v, f, lcc, cfg=cfg, capacity=cap)
    sh_x, _ = tshadow.trace_shadow(v, f, lcc, lg1, prim, cc[:3], cfg)

    lg8 = gbuild.build_spherical_grid(v, f, lcc, cfg=cfg, capacity=cap,
                                      align=8)
    sh_p, _ = tshadow.trace_shadow(v, f, lcc, lg8, prim, cc[:3], cfg,
                                   backend="pallas", interpret=True)
    np.testing.assert_array_equal(np.asarray(sh_x), np.asarray(sh_p))
