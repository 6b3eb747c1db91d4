"""Component tests: color pipeline, scene builders, OBJ loader, AA tables,
config tiers, PNG IO, framebuffer — the host-side inventory of SURVEY.md §2."""

from __future__ import annotations

import colorsys
import math
import os

import numpy as np
import pytest

from conftest import REFERENCE_ROOT, reference_available
from hslu_i.ba_raytracing.f2501_raytracer_tpu import (
    BoundedPlane,
    ImageBuffer,
    Material,
    PointLight,
    RenderConfig,
    Scene,
    SphereData,
    TransmissionProperties,
    TriangleData,
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.config import (
    RESOLUTION_MEDIUM,
    CameraSpec,
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops import camera as cam_ops
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.colorops import (
    linear_to_u8,
    maximize_value,
    pack_u32,
    srgb_decode,
    srgb_encode,
    u8_to_linear,
    unpack_u32,
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.sampling import poisson_disk
from hslu_i.ba_raytracing.f2501_raytracer_tpu.output.png_io import read_png, write_png


# ---- color ----

def test_srgb_roundtrip():
    c = np.linspace(0, 1, 64)
    np.testing.assert_allclose(srgb_decode(srgb_encode(c)), c, atol=1e-7)


def test_maximize_value_matches_hsv_roundtrip():
    for rgb in [(0.825, 0.675, 0.5), (0.01, 0.5, 0.4), (1.0, 1.0, 1.0), (0.2, 0.2, 0.9)]:
        got = maximize_value(np.array(rgb, np.float32))
        srgb = srgb_encode(np.array(rgb))
        h, s, v = colorsys.rgb_to_hsv(*srgb)
        expect = srgb_decode(np.array(colorsys.hsv_to_rgb(h, s, 1.0)))
        np.testing.assert_allclose(got, expect, atol=1e-5)


def test_maximize_value_black_is_white():
    np.testing.assert_allclose(maximize_value(np.zeros(3)), np.ones(3), atol=1e-6)


def test_u8_encoding_no_gamma():
    # the reference writes linear u8 (no transfer function)
    assert linear_to_u8(np.array([0.5]))[0] == 128
    assert linear_to_u8(np.array([2.0]))[0] == 255
    assert linear_to_u8(np.array([-1.0]))[0] == 0


def test_u32_pack_roundtrip():
    rgb = np.array([[10, 200, 3]], np.uint8)
    np.testing.assert_array_equal(unpack_u32(pack_u32(rgb)), rgb)


# ---- poisson ----

def test_poisson_min_distance():
    pts = poisson_disk([1.2, 1.2], 0.18, seed=3)
    assert len(pts) >= 10
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    d[np.diag_indices(len(pts))] = 1e9
    assert d.min() >= 0.18 * 0.999


def test_poisson_3d_bounds():
    pts = poisson_disk([2.0, 2.0, 2.0], 0.4, seed=5, max_points=19)
    assert pts.shape[1] == 3 and len(pts) <= 19
    assert (pts >= 0).all() and (pts < 2.0).all()


# ---- geometry builders ----

def test_bounded_plane_is_12_outward_triangles():
    bp = BoundedPlane.with_material(
        (0, 0, -1), (0, 0, 5), (0, 1, 0), 2.0, 1.0, 0.5, Material.diffuse((1, 1, 1))
    )
    tris = bp.to_basic_geometries()
    assert len(tris) == 12
    assert all(t.object_id == bp.object_id for t in tris)
    center = np.array([0, 0, 5.0])
    for t in tris:
        out = t.get_center() - center
        assert float(np.dot(out, t.normal)) > 0, "normals must point outwards"


def test_triangle_normal_precompute():
    t = TriangleData.with_material((0, 0, 0), (1, 0, 0), (0, 1, 0), Material.diffuse((1, 1, 1)))
    np.testing.assert_allclose(t.normal, [0, 0, 1], atol=1e-7)
    np.testing.assert_allclose(t.edge1, [1, 0, 0], atol=1e-7)
    np.testing.assert_allclose(t.edge2, [0, 1, 0], atol=1e-7)


def test_scene_static_backface_culling():
    cfg = RenderConfig(width=64, height=64)
    s = Scene()
    s.add_triangle(TriangleData.new((0, 0, 1), (1, 0, 1), (0, 1, 1), (1, 0, 0)))  # n=+z
    s.add_triangle(TriangleData.new((0, 0, 1), (0, 1, 1), (1, 0, 1), (1, 0, 0)))  # n=-z
    s.add_sphere(SphereData.new((0, 0, 5), 1.0, (1, 0, 0)))
    culled = Scene.backface_culling(s, np.array([0.0, 0.0, 1.0]))
    # only the +z-normal opaque triangle (dot == 1) is dropped
    assert len(culled.scene_objects.triangles) == 1
    assert len(culled.scene_objects.spheres) == 1
    # transmissive triangles survive
    s2 = Scene()
    s2.add_triangle(
        TriangleData.with_material(
            (0, 0, 1), (1, 0, 1), (0, 1, 1),
            Material.new((1, 1, 1), 0, 0, TransmissionProperties.new(0.5, 1.5)),
        )
    )
    assert len(Scene.backface_culling(s2, np.array([0.0, 0.0, 1.0])).scene_objects.triangles) == 1


# ---- materials ----

def test_transmission_mask_semantics():
    assert not TransmissionProperties.none().mask
    assert not TransmissionProperties().mask
    assert TransmissionProperties.new(0.5, 1.5).mask
    assert not TransmissionProperties.new(0.0, 1.5).mask  # zero opacity == none


def test_material_absorption():
    m = Material.new((0.8, 0.4, 0.2), 0, 0, TransmissionProperties.new(0.75, 1.5))
    np.testing.assert_allclose(m.absorption(), np.array([0.8, 0.4, 0.2]) * 0.25, rtol=1e-5)
    opaque = Material.diffuse((0.8, 0.4, 0.2))
    assert np.abs(opaque.absorption()).max() < 1e-6


# ---- lights ----

def test_point_light_color_maximized():
    l = PointLight.new((0, 0, 0), (0.4, 0.2, 0.1), 1.0)
    srgb = srgb_encode(l.color)
    np.testing.assert_allclose(srgb.max(), 1.0, atol=1e-5)


def test_light_cloud_properties():
    cfg = RenderConfig(width=100, height=100)
    l = PointLight.new((0.5, 0.5, 0.1), (1, 1, 1), 0.9)
    rng = np.random.default_rng(0)
    cloud = l.to_point_light_cloud(10, cfg.camera, rng)
    assert len(cloud) == 10
    np.testing.assert_allclose(sum(c.intensity for c in cloud), 0.9, rtol=1e-5)
    # offsets are positive-quadrant and tiny in scene units (window scaled)
    r = 1.725 + 10 / 20.0
    for c in cloud:
        off = c.position - l.position
        assert (off >= 0).all()
        assert (off <= r * np.float32(cfg.camera.w2s_width) * 1.5 + 1e-6).all()
    assert len(l.to_point_light_cloud(1, cfg.camera, rng)) == 1


# ---- config ----

def test_config_quality_tiers():
    c = RenderConfig()
    assert (c.reflection_max_depth, c.refraction_max_depth) == (9, 8)
    assert c.point_light_multiplicator == 1
    hq = RenderConfig(high_quality=True)
    assert (hq.reflection_max_depth, hq.refraction_max_depth) == (13, 18)
    assert hq.point_light_multiplicator == 19
    assert hq.anti_aliasing and hq.soft_shadows and hq.high_quality_model
    xq = RenderConfig(extreme_quality=True)
    assert (xq.reflection_max_depth, xq.refraction_max_depth) == (21, 21)
    assert xq.point_light_multiplicator == 28
    assert xq.antialiasing_samples_per_pixel == 24 and xq.total_aa_rays == 24
    assert RenderConfig(soft_shadows=True).point_light_multiplicator == 10
    assert RenderConfig().total_aa_rays == 16


def test_camera_spec_matches_reference_constants():
    cam = CameraSpec(*RESOLUTION_MEDIUM)
    assert cam.scene_width == 1.0
    np.testing.assert_allclose(cam.scene_height, 950 / 1140)
    np.testing.assert_allclose(cam.scene_depth, (1.0 + 950 / 1140) / 2)
    assert cam.window_scene_depth == (1140 + 950) // 2
    f = cam.render_ray_focus
    np.testing.assert_allclose(f, (0.5, cam.scene_height / 2, -1.9 * cam.scene_depth))


def test_feature_string_banner():
    s = RenderConfig.reference_default().feature_string()
    assert "Antialiasing" in s and "Reflections + Refractions" in s
    assert "High Quality" in s and "NO-OPT" in s


# ---- AA tables ----

def test_aa_offsets_shape_and_first_sample():
    cfg = RenderConfig(anti_aliasing_rotation_scale=True, anti_aliasing_randomness=True)
    off = cam_ops.antialiasing_offsets(cfg)
    assert off.shape == (16, 3)
    np.testing.assert_allclose(off[0], 0.0)  # first sample unjittered
    assert (off[:, 2] == 0).all()  # z never jittered


def test_aa_directions_rotated_grid():
    dirs = cam_ops.antialiasing_sampling_directions(True)
    assert dirs.shape == (8, 3)
    np.testing.assert_allclose(np.linalg.norm(dirs, axis=1), 1.0, atol=1e-6)
    ang = math.atan(0.5)
    # t = -y_r where y_r = (-sin, cos, 0)
    np.testing.assert_allclose(dirs[0], [math.sin(ang), -math.cos(ang), 0], atol=1e-6)


def test_aa_scalar_vs_simd_direction_cycling():
    cfg = RenderConfig(anti_aliasing_rotation_scale=True)
    scalar = cam_ops.antialiasing_offsets(cfg, packet_lanes=1)
    simd = cam_ops.antialiasing_offsets(cfg, packet_lanes=8)
    # scalar path (reference default build) always uses direction 0
    assert not np.allclose(scalar[1:9], simd[1:9])
    np.testing.assert_allclose(scalar[1], scalar[2])


# ---- PNG + framebuffer ----

def test_png_roundtrip(tmp_path):
    img = (np.arange(5 * 7 * 3).reshape(5, 7, 3) * 3 % 256).astype(np.uint8)
    p = tmp_path / "t.png"
    write_png(p, img)
    np.testing.assert_array_equal(read_png(p), img)


def test_read_reference_golden_png():
    if not reference_available():
        pytest.skip("reference data not mounted")
    ref = read_png(os.path.join(REFERENCE_ROOT, "output.png"))
    assert ref.shape == (950, 1140, 3)


def test_framebuffer_commit_and_views():
    buf = ImageBuffer(4, 2)
    color = np.full((1, 2, 3), 0.5, np.float32)
    valid = np.array([[True, False]])
    buf.commit_tile(0, 1, color, valid)
    lin = buf.as_linear()
    assert lin[0, 1, 0] == np.float32(0.5) and lin[0, 2, 0] == 0.0
    u32 = buf.get_u32_slice()
    assert u32.shape == (8,)
    assert u32[1] == pack_u32(np.array([[128, 128, 128]], np.uint8))[0]


# ---- OBJ loader ----

def test_obj_loader_small(tmp_path):
    mtl = tmp_path / "m.mtl"
    mtl.write_text(
        "newmtl red\nKd 0.9 0.1 0.2\nillum 3\nPm 0.4\nPs 0.6\n"
        "newmtl plain\nKd 0.1 0.2 0.3\nillum 1\nPs 0.9\n"
    )
    obj = tmp_path / "t.obj"
    obj.write_text(
        "mtllib m.mtl\n"
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vn 0 0 1\n"
        "usemtl red\n"
        "f 1//1 2//1 3//1 4//1\n"  # quad -> 2 triangles
        "usemtl plain\n"
        "f 1 2 3\n"
    )
    scene = Scene.from_obj(obj)
    tris = scene.scene_objects.triangles
    assert len(tris) == 3
    np.testing.assert_allclose(tris[0].material.color, (0.9, 0.1, 0.2))
    assert tris[0].material.metallic == 0.4  # illum 3 -> Pm honored
    assert tris[0].material.shininess == 0.6
    assert tris[1].material.metallic == 0.4
    # illum 1 -> both Pm and Ps ignored
    assert tris[2].material.metallic == 0.0 and tris[2].material.shininess == 0.0
    # supplied vertex normals survive (merged, not recomputed)
    np.testing.assert_allclose(tris[0].normal, (0, 0, 1), atol=1e-6)


def test_obj_normal_lerp_merge_quirk(tmp_path):
    obj = tmp_path / "t.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
        "vn 1 0 0\nvn 0 1 0\nvn 0 0 1\n"
        "f 1//1 2//2 3//3\n"
    )
    scene = Scene.from_obj(obj)
    t = scene.scene_objects.triangles[0]
    # n1.lerp(n2,.5).lerp(n3,.5) = 0.25*n1 + 0.25*n2 + 0.5*n3, NOT renormalized
    np.testing.assert_allclose(t.normal, (0.25, 0.25, 0.5), atol=1e-6)


def test_obj_loader_reference_mesh_counts():
    if not reference_available():
        pytest.skip("reference data not mounted")
    p = os.path.join(REFERENCE_ROOT, "data", "obj", "text", "text_lowres.obj")
    scene = Scene.from_obj(p)
    assert len(scene.scene_objects.triangles) == 1639


def test_get_pixel_color_matches_render():
    from hslu_i.ba_raytracing.f2501_raytracer_tpu import (
        RaytracerRenderer,
        build_device_scene,
    )
    from scenes import simple_sphere_scene

    cfg = RenderConfig(width=32, height=32, tile_rays=2048)
    scene = simple_sphere_scene(cfg)
    r = RaytracerRenderer(cfg)
    ds = build_device_scene(scene, cfg)
    buf = r.render_device(ds)
    color, valid = r.get_pixel_color(ds, 16, 16)
    assert valid == bool(buf.valid[16, 16])
    import numpy as _np

    _np.testing.assert_allclose(color, buf.as_linear()[16, 16], atol=1e-6)


def test_tiles_per_program_chunking_identical():
    """Capping tiles per launched program (watchdog mitigation for heavy
    configs on the remote relay) must not change the image."""
    import dataclasses

    import numpy as _np

    from hslu_i.ba_raytracing.f2501_raytracer_tpu import RaytracerRenderer
    from scenes import mixed_scene

    cfg = RenderConfig(
        width=48, height=32, tile_rays=1024, reflections=True, refractions=True,
        max_nodes=16,
    )
    scene = mixed_scene(cfg)
    buf_all = RaytracerRenderer(cfg).render(scene)
    # 48*32/1024 = 1.5 -> 2 tiles; group of 1 also exercises the ragged pad
    cfg_chunked = dataclasses.replace(cfg, tiles_per_program=1)
    buf_chunked = RaytracerRenderer(cfg_chunked).render(scene)
    _np.testing.assert_array_equal(buf_all.valid, buf_chunked.valid)
    _np.testing.assert_array_equal(buf_all.as_u8(), buf_chunked.as_u8())
