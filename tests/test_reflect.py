"""Reflection bounce tests: DDA through the uniform grid vs brute force."""

import jax.numpy as jnp
import numpy as np

from ugrt.core import camera as cam
from ugrt.core.vecmath import cross, dot, normalize
from ugrt.grid import build as gbuild
from ugrt.ref import oracle
from ugrt.trace import reflect as treflect


def _brute_force(scene, origins, dirs, active, exclude, eps=1e-4):
    """All-triangles nearest hit (signed t > eps), numpy."""
    n = origins.shape[0]
    best_t = np.full(n, np.inf, dtype=np.float32)
    best_f = np.full(n, -2, dtype=np.int32)
    v = scene.vertices[scene.faces].astype(np.float32)
    v0, e1, e2 = v[:, 0], v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]
    for f in range(scene.num_faces):
        pvec = np.cross(dirs, e2[f][None])
        det = (e1[f][None] * pvec).sum(-1)
        with np.errstate(all="ignore"):
            inv = 1.0 / det
            tvec = origins - v0[f][None]
            u = (tvec * pvec).sum(-1) * inv
            qvec = np.cross(tvec, e1[f][None])
            vv = (dirs * qvec).sum(-1) * inv
            t = (e2[f][None] * qvec).sum(-1) * inv
        ok = ((np.abs(det) > 1e-21) & (u >= 0) & (u <= 1) & (vv >= 0)
              & (u + vv <= 1) & (t > eps) & active & (exclude != f))
        upd = ok & (t < best_t)
        best_t = np.where(upd, t, best_t)
        best_f = np.where(upd, f, best_f)
    best_t = np.where(np.isfinite(best_t), best_t, -1.0)
    return best_t, best_f


def test_dda_matches_brute_force(small_cfg, cornell, generic_camera):
    cfg = small_cfg
    cc = cam.camcoords_from_spec(generic_camera, cfg.fovy_deg, 1.0)
    og = oracle.build_grid(cornell, cc, cfg)
    primary = oracle.trace_primary(cornell, cc, og, cfg)

    H, W = cfg.screen_height, cfg.screen_width
    n = H * W
    t = primary["t"].reshape(n)
    d = primary["ray_dir"].reshape(n, 3).astype(np.float32)
    fid = primary["face_id"].reshape(n)
    hit = fid >= 0
    eye = cc[:3]
    origins = eye[None] + t[:, None] * d

    # Signed normals for reflection (not the |n| display quirk).
    v = cornell.vertices[cornell.faces[np.maximum(fid, 0)]]
    nrm = normalize(cross(normalize(v[:, 1] - v[:, 0]),
                          normalize(v[:, 2] - v[:, 0])))
    s = np.where((d * nrm).sum(-1) > 0, -1.0, 1.0)[:, None]
    nrm = nrm * s
    rdir = d - 2.0 * (d * nrm).sum(-1)[:, None] * nrm
    rdir = normalize(rdir).astype(np.float32)

    lo, hi = cornell.aabb
    pad = 1e-3
    lo = lo - pad
    hi = hi + pad
    dims = (8, 8, 8)
    ug = gbuild.build_uniform_grid(
        jnp.asarray(cornell.vertices), jnp.asarray(cornell.faces),
        jnp.asarray(lo), jnp.asarray(hi), grid_dims=dims, capacity=16384)
    assert not bool(ug.overflow)

    res = treflect.trace_uniform_dda(
        jnp.asarray(cornell.vertices), jnp.asarray(cornell.faces), ug,
        jnp.asarray(origins.astype(np.float32)), jnp.asarray(rdir),
        jnp.asarray(hit), jnp.asarray(fid), jnp.asarray(lo),
        jnp.asarray(hi), dims, cfg, max_batches=2)
    assert not bool(res["overflow"])

    bt, bf = _brute_force(cornell, origins.astype(np.float32), rdir, hit,
                          fid)
    t_d = np.asarray(res["t"])
    f_d = np.asarray(res["face_id"])

    # Compare where both sides are unambiguous (off knife edges).
    agree = f_d == bf
    frac = agree.mean()
    assert frac > 0.995, f"only {frac:.4f} of reflection hits agree"
    both = (bf >= 0) & agree
    np.testing.assert_allclose(t_d[both], bt[both], rtol=1e-4, atol=1e-4)
    # A good share of primary hits should reflect onto something (the
    # box is open toward +z, so camera-facing reflections escape).
    assert (f_d[hit] >= 0).mean() > 0.4
