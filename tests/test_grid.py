"""Grid-build tests: device CSR vs oracle CSR, all three projections."""

import jax.numpy as jnp
import numpy as np

from ugrt.core import camera as cam
from ugrt.grid import build as gbuild
from ugrt.ref import oracle
from ugrt.scene import procedural


def _cc(spec, cfg):
    return cam.camcoords_from_spec(spec, cfg.fovy_deg,
                                   cfg.screen_width / cfg.screen_height)


def test_perspective_grid_matches_oracle(small_cfg, cornell,
                                         generic_camera):
    cfg = small_cfg
    cc = _cc(generic_camera, cfg)
    og = oracle.build_grid(cornell, cc, cfg)
    cap = cfg.pair_capacity(cornell.num_faces)
    dg = gbuild.build_perspective_grid(
        jnp.asarray(cornell.vertices), jnp.asarray(cornell.faces),
        jnp.asarray(cc), cfg=cfg, capacity=cap)
    assert not bool(dg.overflow)
    assert int(dg.total_pairs) == og.total_pairs
    np.testing.assert_array_equal(np.asarray(dg.cell_count), og.cell_count)
    np.testing.assert_array_equal(np.asarray(dg.cell_offset),
                                  og.cell_offset)
    np.testing.assert_array_equal(
        np.asarray(dg.sorted_faces[:og.total_pairs]), og.sorted_faces)


def test_spherical_grid_matches_oracle(small_cfg, cornell, generic_light):
    cfg = small_cfg
    lcc = _cc(generic_light, cfg)
    og = oracle.build_spherical_grid(cornell, lcc, cfg)
    cap = cfg.pair_capacity(cornell.num_faces)
    dg = gbuild.build_spherical_grid(
        jnp.asarray(cornell.vertices), jnp.asarray(cornell.faces),
        jnp.asarray(lcc), cfg=cfg, capacity=cap)
    assert not bool(dg.overflow)
    assert int(dg.total_pairs) == og.total_pairs
    np.testing.assert_array_equal(np.asarray(dg.cell_count), og.cell_count)
    np.testing.assert_array_equal(
        np.asarray(dg.sorted_faces[:og.total_pairs]), og.sorted_faces)


def test_grid_overflow_flag(small_cfg, cornell, generic_camera):
    cfg = small_cfg
    cc = _cc(generic_camera, cfg)
    dg = gbuild.build_perspective_grid(
        jnp.asarray(cornell.vertices), jnp.asarray(cornell.faces),
        jnp.asarray(cc), cfg=cfg, capacity=128)
    assert bool(dg.overflow)
    assert int(dg.total_pairs) == 128


def test_every_face_appears(small_cfg, cornell, generic_camera):
    """Culling is disabled (grid_kernel.cu:199): every face lands in >= 1
    cell."""
    cfg = small_cfg
    cc = _cc(generic_camera, cfg)
    dg = gbuild.build_perspective_grid(
        jnp.asarray(cornell.vertices), jnp.asarray(cornell.faces),
        jnp.asarray(cc), cfg=cfg, capacity=cfg.pair_capacity(
            cornell.num_faces))
    present = np.unique(np.asarray(dg.sorted_faces))
    present = present[present >= 0]
    assert len(present) == cornell.num_faces


def test_uniform_grid_membership():
    """World-space uniform grid: brute-force membership check."""
    sc = procedural.cornell_box(subdiv=1)
    lo, hi = sc.aabb
    dims = (8, 8, 8)
    cap = 8192
    dg = gbuild.build_uniform_grid(
        jnp.asarray(sc.vertices), jnp.asarray(sc.faces),
        jnp.asarray(lo), jnp.asarray(hi), grid_dims=dims, capacity=cap)
    assert not bool(dg.overflow)

    counts = np.asarray(dg.cell_count)
    offsets = np.asarray(dg.cell_offset)
    vals = np.asarray(dg.sorted_faces)

    # Brute-force: each face's AABB cells must contain it.
    v = sc.vertices[sc.faces]
    extent = hi - lo
    fmin = (v.min(axis=1) - lo) / extent * np.asarray(dims)
    fmax = (v.max(axis=1) - lo) / extent * np.asarray(dims)
    gmin = np.clip(np.floor(fmin).astype(int), 0, np.asarray(dims) - 1)
    gmax = np.clip(np.floor(fmax).astype(int), 0, np.asarray(dims) - 1)
    for f in range(sc.num_faces):
        for i in range(gmin[f, 0], gmax[f, 0] + 1):
            for j in range(gmin[f, 1], gmax[f, 1] + 1):
                for k in range(gmin[f, 2], gmax[f, 2] + 1):
                    c = (i * dims[1] + j) * dims[2] + k
                    seg = vals[offsets[c]:offsets[c] + counts[c]]
                    assert f in seg
