"""Analytic intersection unit tests (the reference has almost none —
SURVEY.md §4 — these close that gap)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from hslu_i.ba_raytracing.f2501_raytracer_tpu import (
    Material,
    RenderConfig,
    Scene,
    SphereData,
    TransmissionProperties,
    TriangleData,
    build_device_scene,
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.intersect import (
    cast_rays,
    occlude_rays,
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.vecmath import normalized

CFG = RenderConfig(width=64, height=64)


def _cast(scene, o, d, backface=False):
    ds = build_device_scene(scene, CFG)
    o = jnp.asarray(np.atleast_2d(o), jnp.float32)
    d = normalized(jnp.asarray(np.atleast_2d(d), jnp.float32))
    return cast_rays(ds, o, d, backface)


def test_sphere_hit_distance_and_normal():
    s = Scene()
    s.add_sphere(SphereData.new((0, 0, 5), 1.0, (1, 0, 0)))
    h = _cast(s, (0, 0, 0), (0, 0, 1))
    assert bool(h.valid[0])
    np.testing.assert_allclose(float(h.t[0]), 4.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(h.normal[0]), [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(h.point[0]), [0, 0, 4], rtol=1e-6)


def test_sphere_inside_prefers_positive_root():
    s = Scene()
    s.add_sphere(SphereData.new((0, 0, 0), 2.0, (1, 0, 0)))
    h = _cast(s, (0, 0, 0), (0, 0, 1))  # origin inside: t0 < 0 < t1
    assert bool(h.valid[0])
    np.testing.assert_allclose(float(h.t[0]), 2.0, rtol=1e-6)


def test_sphere_miss():
    s = Scene()
    s.add_sphere(SphereData.new((0, 0, 5), 1.0, (1, 0, 0)))
    h = _cast(s, (0, 3, 0), (0, 0, 1))
    assert not bool(h.valid[0])


def test_sphere_behind_ray_invalid():
    s = Scene()
    s.add_sphere(SphereData.new((0, 0, -5), 1.0, (1, 0, 0)))
    h = _cast(s, (0, 0, 0), (0, 0, 1))
    assert not bool(h.valid[0])


def test_triangle_hit_barycentric_interior():
    s = Scene()
    s.add_triangle(TriangleData.new((-1, -1, 3), (1, -1, 3), (0, 1, 3), (0, 1, 0)))
    h = _cast(s, (0, 0, 0), (0, 0, 1))
    assert bool(h.valid[0])
    np.testing.assert_allclose(float(h.t[0]), 3.0, rtol=1e-5)


def test_triangle_edge_exclusive_u_plus_v():
    # u + v >= 1 is invalid (triangle.rs:192): a ray at the far edge misses
    s = Scene()
    s.add_triangle(TriangleData.new((0, 0, 3), (1, 0, 3), (0, 1, 3), (0, 1, 0)))
    h = _cast(s, (0.51, 0.51, 0), (0, 0, 1))
    assert not bool(h.valid[0])
    h2 = _cast(s, (0.49, 0.49, 0), (0, 0, 1))
    assert bool(h2.valid[0])


def test_triangle_parallel_ray_invalid():
    s = Scene()
    s.add_triangle(TriangleData.new((-1, -1, 3), (1, -1, 3), (0, 1, 3), (0, 1, 0)))
    h = _cast(s, (0, 0, 0), (1, 0, 0))  # ray in the z=0 plane, triangle at z=3
    assert not bool(h.valid[0])


def test_nearest_hit_wins():
    s = Scene()
    s.add_sphere(SphereData.new((0, 0, 10), 1.0, (1, 0, 0)))
    s.add_sphere(SphereData.new((0, 0, 5), 1.0, (0, 1, 0)))
    s.add_triangle(TriangleData.new((-2, -2, 7), (2, -2, 7), (0, 2, 7), (0, 0, 1)))
    h = _cast(s, (0, 0, 0), (0, 0, 1))
    np.testing.assert_allclose(float(h.t[0]), 4.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(h.color[0]), [0, 1, 0], atol=1e-7)


def test_backface_cull_quirk_threshold():
    # cull when dot(dir, normal) >= 0.75, NOT at 0 (sphere.rs:137-151)
    s = Scene()
    s.add_triangle(
        TriangleData.with_material_and_normal(
            (-1, -1, 3), (1, -1, 3), (0, 1, 3), (0, 0, 1), Material.diffuse((1, 1, 1))
        )
    )
    # dir (0,0,1): dot = 1.0 >= 0.75 -> culled
    h = _cast(s, (0, 0, 0), (0, 0, 1), backface=True)
    assert not bool(h.valid[0])
    # same geometry, transmissive material -> visible despite backface
    s2 = Scene()
    s2.add_triangle(
        TriangleData.with_material_and_normal(
            (-1, -1, 3), (1, -1, 3), (0, 1, 3), (0, 0, 1),
            Material.new((1, 1, 1), 0.0, 0.0, TransmissionProperties.new(0.5, 1.5)),
        )
    )
    h2 = _cast(s2, (0, 0, 0), (0, 0, 1), backface=True)
    assert bool(h2.valid[0])
    # grazing-ish normal: dot < 0.75 -> kept even though it's a "backface"
    s3 = Scene()
    s3.add_triangle(
        TriangleData.with_material_and_normal(
            (-1, -1, 3), (1, -1, 3), (0, 1, 3), (1, 0, 0), Material.diffuse((1, 1, 1))
        )
    )
    h3 = _cast(s3, (0, 0, 0), (0, 0, 1), backface=True)
    assert bool(h3.valid[0])


def test_occlusion_opaque_blocks_completely():
    s = Scene()
    s.add_sphere(SphereData.new((0, 0, 5), 1.0, (0.3, 0.4, 0.5)))
    ds = build_device_scene(s, CFG)
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    occ, cop, filt = occlude_rays(ds, o, d, jnp.asarray([10.0]))
    assert bool(occ[0])
    np.testing.assert_allclose(float(cop[0]), 0.0)
    # filter loses ~eps * color (absorption of an opaque occluder)
    np.testing.assert_allclose(np.asarray(filt[0]), [1, 1, 1], atol=1e-5)


def test_occlusion_out_of_range_ignored():
    s = Scene()
    s.add_sphere(SphereData.new((0, 0, 5), 1.0, (0.3, 0.4, 0.5)))
    ds = build_device_scene(s, CFG)
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    occ, cop, _ = occlude_rays(ds, o, d, jnp.asarray([3.0]))
    assert not bool(occ[0])
    np.testing.assert_allclose(float(cop[0]), 1.0)


def test_occlusion_transmissive_partial():
    op_val = 0.6
    s = Scene()
    s.add_sphere(
        SphereData.with_material(
            (0, 0, 5), 1.0,
            Material.new((1, 1, 1), 0.0, 0.0, TransmissionProperties.new(op_val, 1.5)),
        )
    )
    ds = build_device_scene(s, CFG)
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    occ, cop, filt = occlude_rays(ds, o, d, jnp.asarray([10.0]))
    assert not bool(occ[0])  # transmissive never fully occludes
    # per-OBJECT accumulation (raytracer.rs scans objects, one hit each):
    # one decrement of (1 - opacity*T_red), T = 1 - fresnel at normal incidence
    f0 = ((1 - 1.5) / (1 + 1.5)) ** 2
    t_red = 1 - f0
    expected = max(0.0, 1.0 - (1.0 - op_val * t_red))
    np.testing.assert_allclose(float(cop[0]), expected, rtol=1e-4)
    # filter = 1 - absorption, absorption = color*(1-opacity)
    np.testing.assert_allclose(np.asarray(filt[0]), 1 - (1 - op_val), rtol=1e-4)
