"""Host scene-compiler tests: OBJ/MTL parsing, transforms, RGBE, env bins,
atlas packing (the reference has no tests; oracle values are hand-computed)."""

import numpy as np
import pytest

from fspt_tpu.scene import envmap
from fspt_tpu.scene.atlas import TexturePacker, srgb_to_linear
from fspt_tpu.scene.mtl import parse_mtl
from fspt_tpu.scene.obj import parse_obj
from fspt_tpu.scene.transforms import rotate_arbitrary


def test_rotate_arbitrary_matches_axis_rotations():
    v = np.array([[1.0, 0.0, 0.0]])
    out = rotate_arbitrary(v, [0, 0, 1], np.pi / 2)
    np.testing.assert_allclose(out, [[0.0, 1.0, 0.0]], atol=1e-12)
    out = rotate_arbitrary(v, [0, 1, 0], np.pi / 2)
    np.testing.assert_allclose(out, [[0.0, 0.0, -1.0]], atol=1e-12)


def test_parse_quad_flat_normals():
    obj = ("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
           "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
           "f 1/1 2/2 3/3 4/4\n")
    mesh = parse_obj(obj)
    assert len(mesh.groups) == 1
    g = mesh.groups[0]
    assert g.verts.shape == (2, 3, 3)          # fan triangulation
    np.testing.assert_allclose(g.normals, np.broadcast_to([0, 0, 1], (2, 3, 3)))
    np.testing.assert_allclose(mesh.bounds_min, [0, 0, 0])
    np.testing.assert_allclose(mesh.bounds_max, [1, 1, 0])
    # tangent frame is orthonormal and consistent with UVs
    t, b, n = g.tangents[0, 0], g.bitangents[0, 0], g.normals[0, 0]
    np.testing.assert_allclose(np.dot(t, n), 0, atol=1e-12)
    np.testing.assert_allclose(np.dot(t, b), 0, atol=1e-12)
    np.testing.assert_allclose(np.linalg.norm(t), 1, atol=1e-12)


def test_parse_negative_indices():
    obj = ("v 0 0 0\nv 1 0 0\nv 0 1 0\n"
           "f -3 -2 -1\n")
    mesh = parse_obj(obj)
    np.testing.assert_allclose(mesh.groups[0].verts[0][1], [1, 0, 0])


def test_parse_transforms_order():
    # rotate 90deg about z maps (1,0,0)->(0,1,0); then scale 2 -> (0,2,0);
    # then translate (1,0,0) -> (1,2,0)
    obj = "v 1 0 0\nv 0 0 1\nv 1 1 1\nf 1 2 3\n"
    prop = {"scale": 2.0, "rotate": [{"axis": [0, 0, 1], "angle": np.pi / 2}],
            "translate": [1.0, 0.0, 0.0]}
    mesh = parse_obj(obj, prop)
    np.testing.assert_allclose(mesh.groups[0].verts[0][0], [1, 2, 0],
                               atol=1e-12)


def test_smooth_normals_average_incident_faces():
    # two triangles sharing an edge, 90 degrees apart
    obj = ("v 0 0 0\nv 1 0 0\nv 0 0 -1\nv 0 1 0\n"
           "f 1 2 3\nf 1 2 4\n")
    mesh = parse_obj(obj, {"normals": "smooth"})
    g = mesh.groups[0]
    # shared vertices 0,1 average normals (0,1,0) and (0,0,1)
    np.testing.assert_allclose(g.normals[0][0], [0, 0.5, 0.5], atol=1e-12)


def test_mesh_normals_rotation_only():
    obj = ("v 0 0 0\nv 1 0 0\nv 0 1 0\n"
           "vn 0 0 1\n"
           "f 1//1 2//1 3//1\n")
    prop = {"scale": 5.0, "rotate": [{"axis": [1, 0, 0], "angle": np.pi / 2}],
            "translate": [10, 0, 0], "normals": "mesh"}
    mesh = parse_obj(obj, prop)
    # normal rotated (0,0,1)->(0,-1,0); unaffected by scale/translate
    np.testing.assert_allclose(mesh.groups[0].normals[0][0], [0, -1, 0],
                               atol=1e-7)


def test_spherical_uvs_generated_when_absent():
    obj = "v 1 0 0\nv 0 1 0\nv 0 0 1\nf 1 2 3\n"
    mesh = parse_obj(obj)
    uv = mesh.groups[0].uvs
    assert uv.shape == (1, 3, 2)
    # vertex (0,1,0): u = atan2(0,0)/tau = 0, v = asin(-1)/pi + .5 = 0
    np.testing.assert_allclose(uv[0, 1], [0.0, 0.0], atol=1e-12)


def test_skips_drop_groups():
    obj = ("v 0 0 0\nv 1 0 0\nv 0 1 0\n"
           "usemtl keep\nf 1 2 3\n"
           "usemtl drop\nf 1 2 3\n")
    mesh = parse_obj(obj, {"skips": ["drop"]})
    assert [g.name for g in mesh.groups] == ["keep"]


def test_mtl_parser():
    text = ("newmtl stone\nkd 0.5 0.4 0.3\nns 10\nmap_kd tex/stone.png\n"
            "pmr_swizzle 2 1 0 3\nior 1.5\n"
            "newmtl metal\npm 1 0 0\n")
    mats, paths = parse_mtl(text, "base")
    assert mats["stone"]["kd"] == [0.5, 0.4, 0.3]
    assert mats["stone"]["ns"] == 10.0
    assert mats["stone"]["map_kd"] == "base/tex/stone.png"
    assert mats["stone"]["ior"] == 1.5
    assert paths == {"base/tex/stone.png"}
    assert mats["metal"]["pm"] == [1.0, 0.0, 0.0]


def test_rgbe_roundtrip():
    rng = np.random.default_rng(0)
    radiance = rng.uniform(0.01, 100.0, size=(16, 16, 3)).astype(np.float32)
    encoded = envmap.encode_rgbe(radiance)
    decoded = envmap.decode_rgbe(encoded)
    # RGBE shares one exponent across channels: error bound is ~1/255 of the
    # brightest channel of each pixel
    max_c = radiance.max(axis=-1, keepdims=True)
    assert (np.abs(decoded - radiance) <= max_c * (1.5 / 255.0)).all()


def test_rgbe_decode_reference_semantics():
    # one pixel: rgb=(255,128,0), e=130 -> power 4: (4.0, 2.007..., 0)
    px = np.array([[[255, 128, 0, 130]]], dtype=np.uint8)
    out = envmap.decode_rgbe(px)
    np.testing.assert_allclose(out[0, 0], [4.0, 4.0 * 128 / 255, 0.0],
                               rtol=1e-6)


def test_env_bins_cover_image_exactly():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, size=(64, 128, 3)).astype(np.float32)
    img[10, 20] = [500.0, 500.0, 500.0]  # hot texel forces subdivision
    bins = envmap.compute_radiance_bins(img)
    boxes = bins.boxes
    assert len(boxes) >= 2
    # boxes tile the image: total area matches, no overlap
    area = ((boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])).sum()
    assert area == 64 * 128
    cover = np.zeros((64, 128), dtype=np.int32)
    for x0, y0, x1, y1 in boxes:
        cover[y0:y1, x0:x1] += 1
    assert (cover == 1).all()


def test_env_bins_respect_radiance_threshold():
    img = np.ones((32, 32, 3), dtype=np.float32)
    bins = envmap.compute_radiance_bins(img)
    luma = img[..., 0] * 0.2126 + img[..., 1] * 0.7152 + img[..., 2] * 0.0722
    total = luma.sum()
    threshold = max(total / 64, luma.max() / 2)
    for x0, y0, x1, y1 in bins.boxes:
        assert luma[y0:y1, x0:x1].sum() <= threshold + 1e-3


def test_gradient_environment():
    env = envmap.gradient_environment([[0, 0, 0], [1, 1, 1]], height=8)
    assert env.shape == (8, 1, 3)
    assert env[0, 0, 0] == 0.0
    np.testing.assert_allclose(env[4, 0], [0.5, 0.5, 0.5], atol=1e-6)


def test_atlas_dedup_and_pack():
    p = TexturePacker(atlas_res=8)
    img = np.full((8, 8, 4), 255, dtype=np.uint8)
    i0 = p.add_texture(img, key="a.png")
    i1 = p.add_texture(img, key="a.png")
    i2 = p.add_color([1.0, 0.0, 0.0])
    i3 = p.add_color([1.0, 0.0, 0.0])
    assert i0 == i1 == 0 and i2 == i3 == 1
    atlas = p.pack()
    assert atlas.shape == (2, 8, 8, 4)
    np.testing.assert_allclose(atlas[1, 0, 0, :3], [1.0, 0.0, 0.0], atol=1e-2)


def test_atlas_srgb_and_swizzle():
    p = TexturePacker(atlas_res=2)
    img = np.zeros((2, 2, 4), dtype=np.uint8)
    img[..., 0] = 128   # R
    img[..., 1] = 64    # G
    img[..., 2] = 255   # B
    img[..., 3] = 255
    p.add_texture(img, key="srgb", corrected=True)
    p.add_texture(img, key="swiz", swizzle=[2, 1, 0, 3])
    atlas = p.pack()
    np.testing.assert_allclose(atlas[0, 0, 0, 0],
                               srgb_to_linear(np.float32(128 / 255)), atol=1e-3)
    np.testing.assert_allclose(atlas[1, 0, 0, :3],
                               [1.0, 64 / 255, 128 / 255], atol=1e-3)


def test_atlas_resolution_clamps_to_max_source():
    p = TexturePacker(atlas_res=2048)
    p.add_texture(np.zeros((16, 16, 4), dtype=np.uint8), key="small")
    assert p.resolution == 16
