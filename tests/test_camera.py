"""Camera math tests: GL-faithful matrices, frustum extraction, ray gen."""

import math

import numpy as np

from ugrt.core import camera as cam
from ugrt.core.vecmath import normalize


def test_perspective_matches_glu_formula():
    """gluPerspective reference values (fovy=45, aspect=1, n=0.1, f=100)."""
    m = np.asarray(cam.perspective_matrix(45.0, 1.0, 0.1, 100.0)).reshape(
        4, 4).T  # row-major view
    f = 1.0 / math.tan(math.radians(45.0) / 2)
    assert np.isclose(m[0, 0], f)
    assert np.isclose(m[1, 1], f)
    assert np.isclose(m[2, 2], (100.0 + 0.1) / (0.1 - 100.0))
    assert np.isclose(m[2, 3], 2 * 100.0 * 0.1 / (0.1 - 100.0))
    assert np.isclose(m[3, 2], -1.0)
    assert np.isclose(m[3, 3], 0.0)


def test_look_at_maps_eye_to_origin():
    eye = (3.0, 15.0, 5.0)
    mv = np.asarray(cam.look_at_matrix(eye, (13, 13, 3), (0, 0, 1)))
    m = mv.reshape(4, 4).T
    p = m @ np.asarray([*eye, 1.0], dtype=np.float32)
    assert np.allclose(p[:3], 0.0, atol=1e-5)


def test_look_at_forward_is_minus_z():
    eye = np.asarray([3.0, 15.0, 5.0], dtype=np.float32)
    look = np.asarray([13.0, 13.0, 3.0], dtype=np.float32)
    mv = np.asarray(cam.look_at_matrix(eye, look, (0, 0, 1)))
    m = mv.reshape(4, 4).T
    p = m @ np.asarray([*look, 1.0], dtype=np.float32)
    # The look-at point lies on the -z axis in view space.
    assert abs(p[0]) < 1e-4 and abs(p[1]) < 1e-4
    assert p[2] < 0


def test_frustum_corners_on_near_plane():
    """Corners 0..3 must lie on the near plane at distance `near` along
    the forward axis, inside the FOV."""
    spec = cam.CameraSpec(eye=(3, 15, 5), look_at=(13, 13, 3), up=(0, 0, 1),
                          near=0.1, far=100.0)
    cc = cam.camcoords_from_spec(spec, 45.0, 1.0)
    eye = cc[:3]
    corners = cc[4:16].reshape(4, 3)
    fwd = normalize(np.asarray(spec.look_at, dtype=np.float32) - eye)
    for c in corners:
        d = c - eye
        along = np.dot(d, fwd)
        assert np.isclose(along, 0.1, rtol=1e-3)
    # Corner spread matches fov: half-size = near*tan(fovy/2)
    half = 0.1 * math.tan(math.radians(45.0) / 2)
    diag = np.linalg.norm(corners[0] - corners[2])
    assert np.isclose(diag, 2 * math.sqrt(2) * half, rtol=1e-3)


def test_primary_rays_normalized_and_through_center():
    spec = cam.CameraSpec(eye=(0, 0, 2), look_at=(0, 0, -1), up=(0, 1, 0),
                          near=0.1, far=100.0)
    cc = cam.camcoords_from_spec(spec, 45.0, 1.0)
    dirs = cam.primary_ray_dirs(cc, 64, 64, xp=np)
    assert dirs.shape == (64, 64, 3)
    norms = np.linalg.norm(dirs, axis=-1)
    assert np.allclose(norms, 1.0, atol=1e-5)
    # The ray at the image center points nearly along -z.
    c = dirs[32, 32]
    assert c[2] < -0.99


def test_ray_x_flip_quirk():
    """trace_kernel.cu:99 flips x: column 0 samples the fx=1 lattice end."""
    spec = cam.CameraSpec(eye=(0, 0, 2), look_at=(0, 0, -1), up=(0, 1, 0),
                          near=0.1, far=100.0)
    cc = cam.camcoords_from_spec(spec, 45.0, 1.0)
    dirs = cam.primary_ray_dirs(cc, 64, 64, xp=np)
    corners = cc[4:16].reshape(4, 3)
    eye = cc[:3]
    # col 0 → fx=1 → lerp ends at corner1 (NBR side); world x of that
    # corner tells which side col 0 looks toward.
    expected = normalize(
        (corners[0] + 1.0 * (corners[1] - corners[0])) - eye)
    got = dirs[0, 0]
    assert np.allclose(got, expected, atol=1e-5)


def test_mvp_is_projection_times_modelview():
    spec = cam.CameraSpec(eye=(3, 15, 5), look_at=(13, 13, 3), up=(0, 0, 1),
                          near=0.1, far=100.0)
    mv = np.asarray(cam.look_at_matrix(spec.eye, spec.look_at, spec.up))
    p = np.asarray(cam.perspective_matrix(45.0, 1.0, 0.1, 100.0))
    mvp = np.asarray(cam.mvp_matrix(mv, p))
    MV = mv.reshape(4, 4).T
    P = p.reshape(4, 4).T
    MVP = mvp.reshape(4, 4).T
    assert np.allclose(MVP, P @ MV, rtol=1e-5, atol=1e-5)
