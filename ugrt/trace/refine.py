"""Differentiable hit refinement.

The reference has no backward pass; BASELINE.json requires gradients of
the rendered image w.r.t. vertex positions, normals, and materials.  The
TPU-native design splits the trace into:

  1. a *combinatorial* forward (ugrt.trace.primary / the Pallas kernel)
     that returns only the winning face id per pixel — this part is
     piecewise-constant in the scene parameters and is wrapped in
     stop_gradient;
  2. this module: a closed-form per-pixel re-evaluation of the
     Möller–Trumbore t (trace_kernel.cu:4-45) and the geometric normal
     (trace_kernel.cu:232-253) at the winning face, through which JAX
     autodiff flows.

Because the sort order, cell assignment, and argmin winner are piecewise
constant, this yields exactly the correct gradient almost everywhere
(away from visibility discontinuities) at O(pixels) backward cost —
no hand-written per-pair backward kernel needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ugrt.config import RenderConfig
from ugrt.core.vecmath import cross, dot, normalize


def refine_primary(vertices, faces, camcoords, primary_raw,
                   cfg: RenderConfig, face_aux=None):
    """Recompute (t, normal, u, v) differentiably at the winning faces.

    primary_raw: output of trace_primary (face_id decides everything; its
    t is discarded and recomputed so gradients attach).  Misses keep the
    reference sentinels (t=-1, normal=-1).

    face_aux: optional [F, A] f32 per-face metadata (e.g. the shading
    material id + validity): gathered to pixels THROUGH THE SAME row
    gather as the corners (gather_face_data) and returned as "aux"
    [H, W, A] — the downstream shade then needs no per-pixel face
    gather of its own.
    """
    from ugrt.diff.fastgrad import gather_face_corners, gather_face_data

    fid = jax.lax.stop_gradient(primary_raw["face_id"])
    dirs = jax.lax.stop_gradient(primary_raw["ray_dir"])
    eye = camcoords[0:3]
    hit = fid >= 0

    # gather_face_corners == vertices[faces[fid]] forward (as one [F, 9]
    # table + one wide pixel-width row gather); its VJP accumulates
    # cotangents at FACE granularity first (sort 1M x 2 operands instead
    # of the corner-level 3.1M x 4 — VERDICT r4 #4), then scatters the
    # [F, 3, 3] face sums into vertices with a small 3F-row sort.
    # Everything runs FLAT ([H*W, ...]) and reshapes once at the end:
    # computing at [H, W, 3, 3] made XLA materialize ~6.5 ms/step of
    # 4-D layout copies around the gather.
    H, W = fid.shape
    aux = None
    if face_aux is not None:
        v, aux = gather_face_data(vertices, faces, face_aux,
                                  jnp.clip(fid, 0, None).reshape(-1))
        aux = aux.reshape((H, W) + face_aux.shape[1:])
    else:
        v = gather_face_corners(vertices, faces,
                                jnp.clip(fid, 0, None).reshape(-1))
    dflat = dirs.reshape(H * W, 3)
    v0 = v[:, 0]
    e1 = v[:, 1] - v0
    e2 = v[:, 2] - v0
    tvec = eye[None, :] - v0

    pvec = cross(dflat, e2, xp=jnp)
    det = dot(e1, pvec)
    inv_det = 1.0 / det
    u = dot(tvec, pvec) * inv_det
    qvec = cross(tvec, e1, xp=jnp)
    vv = dot(dflat, qvec) * inv_det
    t = dot(e2, qvec) * inv_det
    if cfg.quirks.abs_t:
        t = jnp.abs(t)

    n = normalize(cross(normalize(e1, xp=jnp), normalize(e2, xp=jnp),
                        xp=jnp), xp=jnp)
    if cfg.quirks.abs_normal:
        n = jnp.abs(n)

    t = jnp.where(hit, t.reshape(H, W), jnp.float32(-1.0))
    n = jnp.where(hit[..., None], n.reshape(H, W, 3), jnp.float32(-1.0))
    out = dict(t=t, face_id=fid, normal=n, ray_dir=dirs,
               u=u.reshape(H, W), v=vv.reshape(H, W))
    if aux is not None:
        out["aux"] = aux
    return out
