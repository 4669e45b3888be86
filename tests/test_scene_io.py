"""Scene I/O tests: OBJ/MTL parsing, the custom material format, PPM."""

import numpy as np

from ugrt.api import io
from ugrt.scene import model as smodel
from ugrt.scene import obj_loader


def test_obj_parse_basic(tmp_path):
    obj = tmp_path / "tri.obj"
    obj.write_text(
        "# comment\n"
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
        "vn 0 0 1\n"
        "vt 0.5 0.5\n"
        "f 1 2 3\n"
        "f 1/1/1 2/1/1 3/1/1 4/1/1\n"   # quad with full indices
        "f -4 -3 -2\n"                  # negative (relative) indices
    )
    sc = obj_loader.parse_obj(str(obj))
    assert sc.vertices.shape == (4, 3)
    assert len(sc.faces) == 3
    assert sc.faces[0].vertex_index[:3] == [0, 1, 2]
    assert sc.faces[1].vertex_count == 4
    assert sc.faces[1].vertex_index == [0, 1, 2, 3]
    assert sc.faces[2].vertex_index[:3] == [0, 1, 2]


def test_obj_usemtl_and_mtllib(tmp_path):
    (tmp_path / "m.mtl").write_text(
        "newmtl red\nKa 0.2 0 0\nKd 0.9 0.1 0.1\nNs 10\n"
        "newmtl blue\nKd 0.1 0.1 0.9\n")
    obj = tmp_path / "s.obj"
    obj.write_text(
        "mtllib m.mtl\n"
        "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
        "usemtl blue\nf 1 2 3\n"
        "usemtl red\nf 1 2 3\n")
    sc = obj_loader.parse_obj(str(obj))
    assert [m.name for m in sc.materials] == ["red", "blue"]
    assert sc.faces[0].material_index == 1
    assert sc.faces[1].material_index == 0
    assert sc.materials[0].diff == (0.9, 0.1, 0.1)


def test_obj_lights_spheres_planes(tmp_path):
    obj = tmp_path / "l.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 1\n"
        "vn 0 1 0\nvn 1 0 0\n"
        "lp 4\n"
        "ld 1 1\n"
        "lq 1 2 3 4\n"
        "sp 1 1/0/0 2/0/0\n"
        "pl 2 1/0/0 2/0/0\n")
    sc = obj_loader.parse_obj(str(obj))
    assert len(sc.point_lights) == 1 and sc.point_lights[0].pos_index == 3
    assert len(sc.disc_lights) == 1
    assert len(sc.quad_lights) == 1
    assert len(sc.spheres) == 1 and sc.spheres[0].pos_index == 0
    assert len(sc.planes) == 1 and sc.planes[0].pos_index == 1


def test_custom_material_file(tmp_path):
    """The reference's token-skipping format (scene.h:370-439):
    3 skip, 3 ambient, 1 skip, 3 diffuse, 11 skip, texture-or-NA."""
    mat = tmp_path / "mats.txt"
    mat.write_text(
        "newmtl wall 1\n0.2 0.3 0.4\nKd\n0.5 0.6 0.7\n"
        "a b c d e f g h i j k\nNA\n"
        "newmtl floor 2\n0.1 0.1 0.1\nKd\n0.9 0.8 0.7\n"
        "a b c d e f g h i j k\ntex.png\n")
    mats = smodel.load_material_file(str(mat))
    assert mats.shape == (2, 6)
    np.testing.assert_allclose(mats[0], [0.2, 0.3, 0.4, 0.5, 0.6, 0.7])
    np.testing.assert_allclose(mats[1], [0.1, 0.1, 0.1, 0.9, 0.8, 0.7])


def test_load_scene_flattening(tmp_path):
    obj = tmp_path / "t.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
        "f 1 2 3 4\n")  # quad → truncated to first 3 (scene.h:249-253)
    sc = smodel.load_scene(str(obj))
    assert sc.faces.shape == (1, 3)
    np.testing.assert_array_equal(sc.faces[0], [0, 1, 2])
    lo, hi = sc.aabb
    np.testing.assert_allclose(lo, [0, 0, 0])
    np.testing.assert_allclose(hi, [1, 1, 0])


def test_dynamic_scene(tmp_path):
    for i in range(3):
        (tmp_path / f"f_{i}.obj").write_text(
            f"v {i} 0 0\nv {i + 1} 0 0\nv {i} 1 0\nf 1 2 3\n")
    scenes = smodel.load_dynamic_scene(str(tmp_path))
    assert len(scenes) == 3
    assert scenes[2].vertices[0, 0] == 2.0
    np.testing.assert_array_equal(scenes[0].faces, scenes[2].faces)


def test_rotate_subrange():
    verts = np.zeros((4, 3), dtype=np.float32)
    orig = np.asarray([[12.0, 11.0, 4.5]], dtype=np.float32)  # center
    out = smodel.rotate_subrange(verts, orig, 1, 0.7)
    np.testing.assert_allclose(out[1], [14.5, 13.0, 4.0], atol=1e-5)
    assert (out[0] == 0).all() and (out[2] == 0).all()


def test_ppm_roundtrip(tmp_path):
    img = (np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3) * 5)
    p = tmp_path / "x.ppm"
    io.write_ppm(str(p), img)
    back = io.read_ppm(str(p))
    np.testing.assert_array_equal(back, img)
    header = p.read_text().splitlines()
    assert header[0] == "P3" and header[1] == "4 4" and header[2] == "255"


def test_png_writer(tmp_path):
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    img[2:6, 2:6] = (255, 128, 0)
    p = tmp_path / "x.png"
    io.write_png(str(p), img)
    data = p.read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"IHDR" in data and b"IEND" in data
