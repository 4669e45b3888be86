"""Reflection rays through the world-space uniform grid (2-level trace).

The reference *intends* uniform grids for reflection rays (README.md:1)
but never wires them: UniformGrid (uniform_grid.h:11-59) is dead code and
no bounce exists (SURVEY.md §2).  BASELINE config 4 requires an actual
2-level trace, so this is a new design:

  * reflection directions from the primary hit: r = d - 2(d·n)n with the
    SIGNED geometric normal oriented against the incoming ray (the
    abs-normal quirk is display-only; reflecting off |n| would be
    physically meaningless);
  * 3-D DDA (Amanatides–Woo) through the uniform grid built by
    ugrt.grid.build.build_uniform_grid, vectorized over all rays with a
    lax.scan over steps (static bound gx+gy+gz);
  * per step each active ray tests its cell's triangle list (CSR gather,
    masked); a hit is only accepted while inside the cell that yielded it
    (t_hit <= t_exit), the standard DDA correctness rule;
  * self-intersection is excluded by skipping the originating face id.

Per-cell triangle lists are tested in ceil(count/B) sub-batches up to a
static bound ``max_batches``; cells deeper than that are truncated (an
overflow flag reports it — raise max_batches to remove the cap).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ugrt.config import RenderConfig
from ugrt.core.vecmath import cross, dot, normalize
from ugrt.grid.build import DeviceGrid
from ugrt.trace.primary import moller_trumbore_t

# numpy scalar, NOT jnp: a module-level device array gets hoisted as a
# hidden executable parameter under jax 0.9 simplified-jaxpr-constants,
# and the pjit C++ fastpath then drops it on re-execution
# ("Execution supplied N buffers but compiled program expected M").
_BIG = np.float32(3.0e38)


def reflect_directions(primary, xp=jnp):
    """Mirror reflection of the primary ray at the hit normal.

    Uses the signed geometric normal re-derived via refine (primary must
    carry 'normal' WITHOUT the abs quirk, or we recover orientation from
    the ray: n_oriented = -sign(d·n) * n)."""
    d = primary["ray_dir"]
    n = primary["normal"]
    s = xp.where(dot(d, n) > 0, -1.0, 1.0)[..., None]
    n = n * s  # oriented against the incoming direction
    return d - 2.0 * dot(d, n)[..., None] * n


def trace_uniform_dda(vertices, faces, grid: DeviceGrid, origins, dirs,
                      active, exclude_face, aabb_min, aabb_max,
                      grid_dims, cfg: RenderConfig, *,
                      max_batches: int = 4, eps: float = 1e-4):
    """Trace rays through a uniform grid with 3-D DDA.

    origins/dirs: [N, 3] float32; active: [N] bool; exclude_face: [N]
    int32 face to ignore (self-hit).  Returns dict(t [N], face_id [N]).
    """
    gx, gy, gz = grid_dims
    lo = jnp.asarray(aabb_min, dtype=jnp.float32)
    hi = jnp.asarray(aabb_max, dtype=jnp.float32)
    dims_f = jnp.asarray([gx, gy, gz], dtype=jnp.float32)
    dims_i = jnp.asarray([gx, gy, gz], dtype=jnp.int32)
    cell_size = (hi - lo) / dims_f
    n = origins.shape[0]

    # Clip ray entry to the AABB (slab test).
    inv_d = 1.0 / jnp.where(jnp.abs(dirs) < 1e-20,
                            jnp.float32(1e-20), dirs)
    t1 = (lo[None] - origins) * inv_d
    t2 = (hi[None] - origins) * inv_d
    t_near = jnp.max(jnp.minimum(t1, t2), axis=-1)
    t_far = jnp.min(jnp.maximum(t1, t2), axis=-1)
    t_enter = jnp.maximum(t_near, 0.0) + eps
    inside = (t_far > t_enter) & active

    p0 = origins + t_enter[:, None] * dirs
    cell = jnp.clip(((p0 - lo[None]) / cell_size[None]).astype(jnp.int32),
                    0, dims_i[None] - 1)

    step = jnp.where(dirs >= 0, 1, -1).astype(jnp.int32)
    next_bound = lo[None] + (cell + (step > 0)).astype(jnp.float32) \
        * cell_size[None]
    t_max = (next_bound - origins) * inv_d            # [N, 3]
    t_delta = jnp.abs(cell_size[None] * inv_d)

    B = cfg.tri_batch
    lane = jnp.arange(B, dtype=jnp.int32)

    def test_cell(cell_idx, alive, best_t, best_f, t_exit):
        """Test the triangles of each ray's current cell."""
        cid = (cell_idx[:, 0] * gy + cell_idx[:, 1]) * gz + cell_idx[:, 2]
        cid = jnp.clip(cid, 0, gx * gy * gz - 1)
        cnt = grid.cell_count[cid]
        off = grid.cell_offset[cid]

        bt, bf = best_t, best_f
        for b in range(max_batches):
            base = off + b * B
            idx = jnp.clip(base[:, None] + lane[None, :], 0,
                           grid.sorted_faces.shape[0] - 1)
            fidx = jnp.clip(grid.sorted_faces[idx], 0, faces.shape[0] - 1)
            live = (lane[None, :] + b * B) < cnt[:, None]

            v = vertices[faces[fidx]]                # [N, B, 3, 3]
            v0 = v[:, :, 0]
            e1 = v[:, :, 1] - v0
            e2 = v[:, :, 2] - v0
            tvec = origins[:, None, :] - v0
            t = moller_trumbore_t(tvec, e1, e2, dirs[:, None, :], cfg,
                                  abs_t=False)[:, 0, :]   # [N, B]
            bad = (~live | (t <= eps)
                   | (fidx == exclude_face[:, None]))
            t = jnp.where(bad, _BIG, t)
            k = jnp.argmin(t, axis=-1)
            tmin = jnp.min(t, axis=-1)
            upd = alive & (tmin < bt)
            bt = jnp.where(upd, tmin, bt)
            bf = jnp.where(upd, fidx[jnp.arange(n), k], bf)
        overflow_c = jnp.any(cnt > max_batches * B)
        return bt, bf, overflow_c

    max_steps = gx + gy + gz

    def body(carry, _):
        cell_c, t_max_c, alive, best_t, best_f, ovf = carry
        t_exit = jnp.min(t_max_c, axis=-1)
        bt, bf, o = test_cell(cell_c, alive, best_t, best_f, t_exit)
        # Accept only hits inside the current cell; others may be
        # superseded in nearer cells later, but since DDA visits cells in
        # increasing t order, keeping the min is already correct — a ray
        # finishes when its best hit lies before the exit of the current
        # cell.
        done = bt <= t_exit + eps
        alive = alive & ~done

        axis = jnp.argmin(t_max_c, axis=-1)
        onehot = jax.nn.one_hot(axis, 3, dtype=jnp.int32)
        cell_n = cell_c + onehot * step
        t_max_n = t_max_c + onehot.astype(jnp.float32) * t_delta
        out = ((cell_n < 0) | (cell_n >= dims_i[None])).any(axis=-1)
        alive = alive & ~out
        cell_n = jnp.clip(cell_n, 0, dims_i[None] - 1)
        return (cell_n, t_max_n, alive, bt, bf, ovf | o), None

    init = (cell, t_max, inside,
            jnp.full((n,), _BIG), jnp.full((n,), -2, dtype=jnp.int32),
            jnp.zeros((), dtype=jnp.bool_))
    (cell, t_max, alive, best_t, best_f, ovf), _ = jax.lax.scan(
        body, init, None, length=max_steps)

    hit = best_t < _BIG
    return dict(t=jnp.where(hit, best_t, jnp.float32(-1.0)),
                face_id=jnp.where(hit, best_f, -2),
                overflow=ovf)


def reflection_pass(vertices, faces, primary_refined, uniform_grid,
                    aabb_min, aabb_max, grid_dims, cfg: RenderConfig,
                    primary_eye, *, max_batches: int = 4):
    """Second-level trace: reflect primary hits, trace the uniform grid.

    Returns per-pixel dict(t, face_id, ray_dir, origin) of the reflection
    hit, shapes [H, W(...)]."""
    H, W = primary_refined["t"].shape
    n = H * W
    t = primary_refined["t"].reshape(n)
    d = primary_refined["ray_dir"].reshape(n, 3)
    hit = primary_refined["face_id"].reshape(n) >= 0

    origins = primary_eye[None] + t[:, None] * d
    rdir = reflect_directions(
        dict(ray_dir=d, normal=primary_refined["normal"].reshape(n, 3)),
        xp=jnp)
    rdir = normalize(rdir, xp=jnp)

    res = trace_uniform_dda(
        vertices, faces, uniform_grid, origins, rdir, hit,
        primary_refined["face_id"].reshape(n), aabb_min, aabb_max,
        grid_dims, cfg, max_batches=max_batches)

    return dict(t=res["t"].reshape(H, W),
                face_id=res["face_id"].reshape(H, W),
                ray_dir=rdir.reshape(H, W, 3),
                origin=origins.reshape(H, W, 3),
                overflow=res["overflow"])
