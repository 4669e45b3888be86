"""Per-face / per-ray grid binning math.

Backend-agnostic (numpy or jax.numpy via ``xp``) float32 re-derivation of
the reference's binning kernels:

* perspective clip-space AABB binning — DSKernel / DSFillkernel
  (/root/reference/grid_kernel.cu:164-332)
* spherical (light-centric) angular binning — DS_spherical_Kernel and the
  getBlock/getEffective helpers (/root/reference/grid_kernel.cu:367-659)
* per-ray light-grid cell mapping — mapSort_Effective_kernel
  (/root/reference/misc_kernel.cu:255-296)

Note on the reference's wrap-around size computation
(grid_kernel.cu:634-643): the half-split form
``(gxmax - NX/2) + (NX/2 - gxmin) + 1`` simplifies algebraically to
``gxmax - gxmin + 1``, so a single AABB-size formula serves both builds.

Quirk (grid_kernel.cu:439 and misc_kernel.cu:191): the y-angle helpers
compute the forward dot product as ``f0*t0 + f1*t1*f2*t2`` — a ``*`` typo
for ``+``.  Controlled by QuirkConfig.y_forward_dot_typo.
"""

from __future__ import annotations

import numpy as np

from ugrt.core.vecmath import dot, magnitude


def _f32(x, xp):
    return xp.asarray(x, dtype=xp.float32)


def mv_basis(camcoords):
    """Right/up/forward rows of the modelview rotation.

    right = (mv[0], mv[4], mv[8]), up = (mv[1], mv[5], mv[9]),
    forward = (mv[2], mv[6], mv[10]) — the index pattern every angle helper
    uses (grid_kernel.cu:370-383).
    """
    mv = camcoords[16:32]
    right = mv[0::4][:3]
    up = mv[1::4][:3]
    forward = mv[2::4][:3]
    return right, up, forward


def transform_vertex_clip(camcoords, points, xp=np):
    """getTransformedVertex (/root/reference/grid_kernel.cu:13-36).

    points: [..., 3] world.  Returns (clip_ndc [...,3], view [...,3]):
    modelview transform with w-divide, then projection with w-divide.
    """
    from ugrt.core.vecmath import transform_point

    view = transform_point(camcoords[16:32], points, xp=xp)
    ndc = transform_point(camcoords[32:48], view, xp=xp)
    return ndc, view


def _trunc_int(x, xp):
    """C float->int cast: truncation toward zero; NaN -> 0 (CUDA cvt.rzi)."""
    x = xp.where(xp.isnan(x), _f32(0.0, xp), x)
    return xp.trunc(x).astype(xp.int32)


def _floor_int(x, xp):
    """floorf then int conversion, NaN -> 0."""
    x = xp.where(xp.isnan(x), _f32(0.0, xp), x)
    return xp.floor(x).astype(xp.int32)


def block_x(vec, camcoords, grid_x: int, max_angle, xp=np):
    """getEffective_x (/root/reference/grid_kernel.cu:395-421).

    vec: [..., 3] normalized directions.  Returns int32 [...] in x-block
    coordinates: NX/2 ± trunc((angle/max) * NX/2).
    """
    right, up, forward = mv_basis(camcoords)
    up_dot = dot(vec, up[None])
    tmp = vec - up_dot[..., None] * up[None]
    mag = magnitude(tmp, xp=xp)
    tmp = tmp / mag[..., None]

    fwd_dot = dot(tmp, forward[None])
    angle = xp.arccos(fwd_dot)
    right_dot = dot(tmp, right[None])

    half = grid_x // 2
    step = _trunc_int((angle / _f32(max_angle, xp)) * _f32(half, xp), xp)
    return xp.where(right_dot > 0, half + step, half - step).astype(xp.int32)


def block_y(vec, camcoords, grid_y: int, max_angle, y_typo: bool, xp=np):
    """getEffective_y (/root/reference/grid_kernel.cu:452-479).

    Note the truncation happens AFTER adding NY/2 (no inner int cast,
    unlike block_x) and the forward dot carries the ``*`` typo when
    ``y_typo`` is set (grid_kernel.cu:468).
    """
    right, up, forward = mv_basis(camcoords)
    right_dot = dot(vec, right[None])
    tmp = vec - right_dot[..., None] * right[None]
    mag = magnitude(tmp, xp=xp)
    tmp = tmp / mag[..., None]

    up_dot = dot(tmp, up[None])
    if y_typo:
        fwd_dot = (tmp[..., 0] * forward[0]
                   + tmp[..., 1] * forward[1] * tmp[..., 2] * forward[2])
    else:
        fwd_dot = dot(tmp, forward[None])
    angle = xp.arccos(fwd_dot)

    half = _f32(grid_y // 2, xp)
    step = (angle / _f32(max_angle, xp)) * half
    val = xp.where(up_dot > 0, half + step, half - step)
    return _trunc_int(val, xp)


def x_angle(vec, camcoords, xp=np):
    """get_x_angle (/root/reference/misc_kernel.cu:131-147)."""
    right, up, forward = mv_basis(camcoords)
    up_dot = dot(vec, up[None])
    tmp = vec - up_dot[..., None] * up[None]
    tmp = tmp / magnitude(tmp, xp=xp)[..., None]
    return xp.arccos(dot(tmp, forward[None]))


def y_angle(vec, camcoords, y_typo: bool, xp=np):
    """get_y_angle (/root/reference/misc_kernel.cu:177-194) — has the typo."""
    right, up, forward = mv_basis(camcoords)
    right_dot = dot(vec, right[None])
    tmp = vec - right_dot[..., None] * right[None]
    tmp = tmp / magnitude(tmp, xp=xp)[..., None]
    if y_typo:
        fwd = (tmp[..., 0] * forward[0]
               + tmp[..., 1] * forward[1] * tmp[..., 2] * forward[2])
    else:
        fwd = dot(tmp, forward[None])
    return xp.arccos(fwd)


def perspective_face_ranges(vertices, faces, camcoords, grid_x, grid_y,
                            num_slabs, xp=np):
    """DSKernel binning (/root/reference/grid_kernel.cu:164-243).

    Returns dict with int32 [F] arrays gxmin/gxmax/gymin/gymax, float32
    zmin (NDC z minimum, 'projCoordZ'), and counts = size_x * size_y.
    Culling is disabled in the reference (`if (1)`, grid_kernel.cu:199), so
    every face gets its clamped AABB.
    """
    v = vertices[faces]                      # [F, 3, 3]
    ndc, _view = transform_vertex_clip(camcoords, v, xp=xp)

    xmin = xp.min(ndc[..., 0], axis=1)
    xmax = xp.max(ndc[..., 0], axis=1)
    ymin = xp.min(ndc[..., 1], axis=1)
    ymax = xp.max(ndc[..., 1], axis=1)
    zmin = xp.min(ndc[..., 2], axis=1)

    half = _f32(0.5, xp)
    gxmin = _floor_int((xmin + 1.0) * half * grid_x, xp)
    gymin = _floor_int((ymin + 1.0) * half * grid_y, xp)
    gxmax = _floor_int((xmax + 1.0) * half * grid_x, xp)
    gymax = _floor_int((ymax + 1.0) * half * grid_y, xp)

    gxmin = xp.clip(gxmin, 0, grid_x - 1)
    gymin = xp.clip(gymin, 0, grid_y - 1)
    gxmax = xp.clip(gxmax, 0, grid_x - 1)
    gymax = xp.clip(gymax, 0, grid_y - 1)

    counts = ((gxmax - gxmin + 1) * (gymax - gymin + 1)).astype(xp.int32)
    return dict(gxmin=gxmin, gxmax=gxmax, gymin=gymin, gymax=gymax,
                zmin=zmin.astype(xp.float32), counts=counts)


def spherical_face_ranges(vertices, faces, camcoords, grid_x, grid_y,
                          num_slabs, x_max, y_max, y_typo: bool, xp=np):
    """DS_spherical_Kernel binning (/root/reference/grid_kernel.cu:481-659).

    Per-vertex: direction from the (light) eye, angular block coordinates;
    ranges are clamped min/max over the three vertices; 'zmin' is the
    minimum radius.  Culling disabled (`if (1)`, grid_kernel.cu:610).
    """
    eye = camcoords[0:3]
    v = vertices[faces]                      # [F, 3, 3]
    d = v - eye[None, None, :]
    radius = magnitude(d, xp=xp)             # [F, 3]
    dn = d / radius[..., None]

    blx = block_x(dn, camcoords, grid_x, x_max, xp=xp)      # [F, 3]
    bly = block_y(dn, camcoords, grid_y, y_max, y_typo, xp=xp)

    gxmin = xp.clip(xp.min(blx, axis=1), 0, grid_x - 1)
    gymin = xp.clip(xp.min(bly, axis=1), 0, grid_y - 1)
    gxmax = xp.clip(xp.max(blx, axis=1), 0, grid_x - 1)
    gymax = xp.clip(xp.max(bly, axis=1), 0, grid_y - 1)
    zmin = xp.min(radius, axis=1)

    counts = ((gxmax - gxmin + 1) * (gymax - gymin + 1)).astype(xp.int32)
    return dict(gxmin=gxmin, gxmax=gxmax, gymin=gymin, gymax=gymax,
                zmin=zmin.astype(xp.float32), counts=counts)


def signed_xy_coords(vec, camcoords, xp=np):
    """Signed per-axis angles for the WINDOWED light-grid mode.

    sx = sign(right.proj_x(d)) * x_angle, sy = sign(up.proj_y(d)) *
    y_angle with the CORRECT forward dot (the windowed mode is a clean
    coordinate system, not a parity surface — the reference's typo'd y
    dot is constant pi/2 for axis-aligned lights, which collapses the
    grid to one row; see RenderConfig.light_grid_mode).  Degenerate
    directions (parallel to the projection axis) give NaN, which the
    callers ignore (window reduce) or map to cell 0 (binning floor).
    """
    right, up, forward = mv_basis(camcoords)

    up_dot = dot(vec, up[None])
    tx = vec - up_dot[..., None] * up[None]
    tx = tx / magnitude(tx, xp=xp)[..., None]
    xa = xp.arccos(xp.clip(dot(tx, forward[None]), -1.0, 1.0))
    sx = xp.where(dot(tx, right[None]) > 0, xa, -xa)

    right_dot = dot(vec, right[None])
    ty = vec - right_dot[..., None] * right[None]
    ty = ty / magnitude(ty, xp=xp)[..., None]
    ya = xp.arccos(xp.clip(dot(ty, forward[None]), -1.0, 1.0))
    sy = xp.where(dot(ty, up[None]) > 0, ya, -ya)
    return sx, sy


def windowed_face_ranges(vertices, faces, camcoords, grid_x, grid_y,
                         num_slabs, window, xp=np):
    """Spherical binning over an affine angle window.

    window = (x0, x1, y0, y1) signed-angle bounds (may be traced
    scalars); cell coordinate = floor((s - lo) / (hi - lo) * grid).
    Same conservative vertex-AABB binning as the reference's spherical
    build, in window coordinates; out-of-window geometry clamps into
    edge cells.
    """
    eye = camcoords[0:3]
    v = vertices[faces]                      # [F, 3, 3]
    d = v - eye[None, None, :]
    radius = magnitude(d, xp=xp)
    dn = d / radius[..., None]
    sx, sy = signed_xy_coords(dn, camcoords, xp=xp)
    x0, x1, y0, y1 = window
    fx = (sx - x0) / (x1 - x0) * _f32(grid_x, xp)
    fy = (sy - y0) / (y1 - y0) * _f32(grid_y, xp)
    bx = _floor_int(fx, xp)
    by = _floor_int(fy, xp)

    gxmin = xp.clip(xp.min(bx, axis=1), 0, grid_x - 1)
    gymin = xp.clip(xp.min(by, axis=1), 0, grid_y - 1)
    gxmax = xp.clip(xp.max(bx, axis=1), 0, grid_x - 1)
    gymax = xp.clip(xp.max(by, axis=1), 0, grid_y - 1)
    zmin = xp.min(radius, axis=1)

    counts = ((gxmax - gxmin + 1) * (gymax - gymin + 1)).astype(xp.int32)
    return dict(gxmin=gxmin, gxmax=gxmax, gymin=gymin, gymax=gymax,
                zmin=zmin.astype(xp.float32), counts=counts)


def ray_light_cells_windowed(hit_points, camcoords, grid_x, grid_y,
                             window, xp=np):
    """Windowed-mode hit-point -> light-cell mapping (cf.
    ray_light_cells); out-of-window rays get the sentinel (they test no
    triangles — the window is computed to cover every hit point, so
    only degenerate/NaN directions land there)."""
    from ugrt.core.vecmath import normalize

    eye = camcoords[0:3]
    d = normalize(hit_points - eye[None], xp=xp)
    sx, sy = signed_xy_coords(d, camcoords, xp=xp)
    x0, x1, y0, y1 = window
    bx = _floor_int((sx - x0) / (x1 - x0) * _f32(grid_x, xp), xp)
    by = _floor_int((sy - y0) / (y1 - y0) * _f32(grid_y, xp), xp)
    inside = ((bx >= 0) & (bx < grid_x) & (by >= 0) & (by < grid_y)
              & ~xp.isnan(sx) & ~xp.isnan(sy))
    cell = bx * grid_y + by
    return xp.where(inside, cell, grid_x * grid_y).astype(xp.int32)


def slab_bins(zmin, z_lo, z_hi, num_slabs: int, xp=np):
    """SlabKernel (/root/reference/grid_kernel.cu:334-352).

    bin = trunc(num_slabs * (z - z_lo) / (z_hi - z_lo)) clamped below
    num_slabs, only updated where z >= 0 (else 0 — the reference leaves
    the buffer unwritten, then DSFillkernel clamps into range; with the
    always-on `if (1)` path only clamped values are used).
    """
    t = (zmin - z_lo) / (z_hi - z_lo)
    bins = _trunc_int(_f32(num_slabs, xp) * t, xp)
    bins = xp.where(zmin >= 0.0, bins, 0)
    return xp.clip(bins, 0, num_slabs - 1)


def z_minmax(zmin_per_face, xp=np):
    """Host z reduction (/root/reference/frustum_grid.h:225-241).

    z_lo = min over values >= 0 (init +2), z_hi = max over ALL values
    (init -2).
    """
    z_lo = xp.min(xp.where(zmin_per_face >= 0.0, zmin_per_face,
                           _f32(2.0, xp)))
    z_lo = xp.minimum(_f32(2.0, xp), z_lo)
    z_hi = xp.maximum(_f32(-2.0, xp), xp.max(zmin_per_face))
    return z_lo, z_hi


def ray_light_cells(hit_points, camcoords, grid_x, grid_y, x_max, y_max,
                    y_typo: bool, xp=np):
    """mapSort_Effective_kernel (/root/reference/misc_kernel.cu:255-296).

    hit_points: [..., 3] world points (primary eye + t * dir).  Returns
    int32 cell ids blx*grid_y + bly, or the sentinel grid_x*grid_y when the
    direction falls outside the light grid.
    """
    from ugrt.core.vecmath import normalize

    eye = camcoords[0:3]
    d = normalize(hit_points - eye[None], xp=xp)
    blx = block_x(d, camcoords, grid_x, x_max, xp=xp)
    bly = block_y(d, camcoords, grid_y, y_max, y_typo, xp=xp)
    inside = ((blx >= 0) & (blx < grid_x) & (bly >= 0) & (bly < grid_y))
    cell = blx * grid_y + bly
    return xp.where(inside, cell, grid_x * grid_y).astype(xp.int32)
