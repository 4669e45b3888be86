"""Two-level grid split (heavy global list) parity tests.

The split moves huge-footprint faces (typically behind-the-eye geometry,
see ugrt.grid.build.DeviceGrid) out of the per-cell pair lists into a
global list swept densely for all rays (ugrt.trace.heavy).  The candidate
union per ray is unchanged, so results must match the single-level build
up to the documented triple-product rounding (det and u are reassociated;
v', k are bitwise-identical) — winners may differ only within an ulp.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from ugrt.core import camera as cam
from ugrt.grid import build as gbuild
from ugrt.scene import procedural
from ugrt.trace import primary as tprim
from ugrt.trace import shadow as tshadow


def _inside_camera():
    # Camera inside the box: the wall behind the eye explodes in clip
    # space and lands in the heavy list.
    return cam.CameraSpec(eye=(0.05, 0.03, 0.4), look_at=(0.1, 0.04, -1.0),
                          up=(0.02, 1.0, 0.013), near=0.1, far=100.0)


def _trace(scene, cc, cfg, heavy_threshold):
    cap = cfg.pair_capacity(scene.num_faces) * 16  # fits full duplication
    dg = gbuild.build_perspective_grid(
        jnp.asarray(scene.vertices), jnp.asarray(scene.faces),
        jnp.asarray(cc), cfg=cfg, capacity=cap,
        heavy_threshold=heavy_threshold)
    res = tprim.trace_primary(
        jnp.asarray(scene.vertices), jnp.asarray(scene.faces),
        jnp.asarray(cc), dg, cfg)
    return dg, res


def test_two_level_primary_matches_single_level(small_cfg, cornell):
    cfg = small_cfg
    cc = cam.camcoords_from_spec(_inside_camera(), cfg.fovy_deg, 1.0)

    dg2, two = _trace(cornell, cc, cfg, heavy_threshold=16)
    assert int(dg2.heavy_count) > 0, "camera placement must create heavy faces"
    assert not bool(dg2.overflow)
    dg1, one = _trace(cornell, cc, cfg, heavy_threshold=0)
    assert int(dg1.heavy_count) == 0

    f2 = np.asarray(two["face_id"])
    f1 = np.asarray(one["face_id"])
    mism = (f1 != f2).sum()
    assert mism <= f1.size * 1e-3, f"{mism} winners differ"
    same = f1 == f2
    np.testing.assert_allclose(np.asarray(two["t"])[same],
                               np.asarray(one["t"])[same],
                               rtol=1e-5, atol=1e-6)


def test_two_level_shadow_matches_single_level(small_cfg, cornell,
                                               generic_light):
    cfg = small_cfg
    spec = _inside_camera()
    cc = jnp.asarray(cam.camcoords_from_spec(spec, cfg.fovy_deg, 1.0))
    lcc = jnp.asarray(
        cam.camcoords_from_spec(generic_light, cfg.fovy_deg, 1.0))
    v = jnp.asarray(cornell.vertices)
    f = jnp.asarray(cornell.faces)
    cap = cfg.pair_capacity(cornell.num_faces) * 16

    dg = gbuild.build_perspective_grid(v, f, cc, cfg=cfg, capacity=cap,
                                       heavy_threshold=0)
    prim = tprim.trace_primary(v, f, cc, dg, cfg)

    shadows = {}
    counts = {}
    for ht in (0, 4):
        lg = gbuild.build_spherical_grid(v, f, lcc, cfg=cfg, capacity=cap,
                                         heavy_threshold=ht)
        counts[ht] = int(lg.heavy_count)
        sh, ovf = tshadow.trace_shadow(v, f, lcc, lg, prim, cc[:3], cfg)
        assert not bool(ovf)
        shadows[ht] = np.asarray(sh)
    assert counts[4] > 0, "threshold 4 must create heavy light-faces"
    mism = (shadows[0] != shadows[4]).sum()
    assert mism <= shadows[0].size * 1e-3, f"{mism} shadow flags differ"


def test_heavy_list_contents(small_cfg, cornell):
    """Heavy faces are exactly those with footprint >= threshold, packed
    ascending, and removed from the pair lists."""
    from ugrt.grid import binning

    cfg = small_cfg
    cc = cam.camcoords_from_spec(_inside_camera(), cfg.fovy_deg, 1.0)
    r = binning.perspective_face_ranges(
        cornell.vertices, cornell.faces, np.asarray(cc),
        cfg.grid_x, cfg.grid_y, cfg.num_slabs, xp=np)
    expect = np.where(r["counts"] >= 16)[0]

    cap = cfg.pair_capacity(cornell.num_faces) * 16
    dg = gbuild.build_perspective_grid(
        jnp.asarray(cornell.vertices), jnp.asarray(cornell.faces),
        jnp.asarray(cc), cfg=cfg, capacity=cap, heavy_threshold=16)
    got = np.asarray(dg.heavy_faces)
    got = got[got >= 0]
    np.testing.assert_array_equal(np.sort(expect), got)
    assert int(dg.total_pairs) == int(r["counts"][r["counts"] < 16].sum())
    # no heavy face appears in the pair lists
    sf = np.asarray(dg.sorted_faces)
    sf = sf[sf >= 0]
    assert not np.isin(sf, expect).any()
