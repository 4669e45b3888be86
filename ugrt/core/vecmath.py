"""Small float32 vector/matrix helpers shared by the JAX path and the oracle.

All matrices are flat length-16 arrays in OpenGL column-major order
(``m[col*4 + row]``), matching the reference's ``camcoords`` layout
(/root/reference/per_frame_funcs.h:18-43) so every kernel formula carries
over index-for-index.

Works with both numpy and jax.numpy (pass the module as ``xp``).
"""

from __future__ import annotations

import numpy as np


def cross(a, b, xp=np):
    """CROSS macro (/root/reference/main.cu.h:44-47)."""
    return xp.stack(
        [
            a[..., 1] * b[..., 2] - a[..., 2] * b[..., 1],
            a[..., 2] * b[..., 0] - a[..., 0] * b[..., 2],
            a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0],
        ],
        axis=-1,
    )


def dot(a, b):
    """DOT macro (/root/reference/main.cu.h:49)."""
    return a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1] + a[..., 2] * b[..., 2]


def normalize(a, xp=np):
    """NORMALIZE macro (/root/reference/main.cu.h:56): multiply by rsqrt."""
    inv = 1.0 / xp.sqrt(dot(a, a))
    return a * inv[..., None]


def magnitude(a, xp=np):
    """getMagnitude (/root/reference/grid_kernel.cu:354-363)."""
    return xp.sqrt(dot(a, a))


def matvec(mat_flat, vec4, xp=np):
    """Column-major 4x4 times vec4.

    Matches mulMatrixVector_D (/root/reference/grid_kernel.cu:4-11):
    ``result[r] = sum_c mat[c*4+r] * vec[c]``.
    Supports batched ``vec4`` of shape [..., 4]; ``mat_flat`` is [16].
    """
    m = xp.reshape(mat_flat, (4, 4))  # m[c, r]
    return vec4 @ m  # [..., c] @ [c, r] -> [..., r]


def transform_point(mat_flat, p3, xp=np):
    """Transform [...,3] points by a column-major flat matrix, w-divide."""
    shape = p3.shape[:-1] + (1,)
    p4 = xp.concatenate([p3, xp.ones(shape, dtype=p3.dtype)], axis=-1)
    out = matvec(mat_flat, p4, xp=xp)
    return out[..., :3] / out[..., 3:4]


def rotate_basis(mv_flat, v3, xp=np):
    """Apply only the 3x3 rotation block of a modelview matrix.

    Matches the shader's view-space transforms which drop the translation
    column (/root/reference/shader_kernel.cu:54-66): out[r] = sum_c mv[c*4+r]*v[c].
    """
    m = xp.reshape(mv_flat, (4, 4))[:3, :3]  # m[c, r]
    return v3 @ m
