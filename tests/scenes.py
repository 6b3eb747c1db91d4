"""Shared miniature test scenes exercising every material/geometry feature."""

from __future__ import annotations

import numpy as np

from hslu_i.ba_raytracing.f2501_raytracer_tpu import (
    BoundedPlane,
    Material,
    PointLight,
    RenderConfig,
    Scene,
    SphereData,
    TransmissionProperties,
    TriangleData,
)


def mixed_scene(cfg: RenderConfig) -> Scene:
    """Spheres (diffuse/metallic/transmissive+boost), triangles, a bounded
    plane and two lights — small enough for the scalar oracle."""
    cam = cfg.camera
    w, h, d = cam.scene_width, cam.scene_height, cam.scene_depth
    s = Scene()
    s.add_sphere(
        SphereData.with_material(
            (0.35 * w, 0.45 * h, 0.30 * d),
            0.16 * d,
            Material.new((0.9, 0.2, 0.3), 0.0, 0.3, TransmissionProperties.none()),
        )
    )
    s.add_sphere(
        SphereData.with_material(
            (0.68 * w, 0.40 * h, 0.45 * d),
            0.14 * d,
            Material.new((1.0, 1.0, 1.0), 0.9, 0.25, TransmissionProperties.none()),
        )
    )
    s.add_sphere(
        SphereData.with_material(
            (0.52 * w, 0.62 * h, 0.22 * d),
            0.12 * d,
            Material.new(
                (0.8, 0.9, 1.0), 0.1, 0.4, TransmissionProperties.new_with_boost(0.7, 1.5, 0.05)
            ),
        )
    )
    s.add_triangle(
        TriangleData.with_material(
            (0.1 * w, 0.95 * h, 0.1 * d),
            (0.9 * w, 0.95 * h, 0.1 * d),
            (0.5 * w, 0.95 * h, 0.9 * d),
            Material.new((0.4, 0.6, 0.4), 0.0, 0.6, TransmissionProperties.none()),
        )
    )
    for tri in BoundedPlane.with_material(
        (0.0, 0.0, -1.0),
        (0.5 * w, 0.5 * h, 0.95 * d),
        (0.0, 1.0, 0.0),
        1.2 * w,
        1.2 * h,
        0.02 * d,
        Material.new((0.5, 0.6, 0.75), 0.0, 0.0, TransmissionProperties.none()),
    ).to_basic_geometries():
        s.add_triangle(tri)
    s.add_light(PointLight.new((0.85 * w, 0.05 * h, 0.02 * d), (0.9, 0.8, 0.6), 1.0))
    s.add_light(PointLight.new((0.15 * w, 0.9 * h, 0.55 * d), (0.5, 0.6, 1.0), 0.5))
    return s


def simple_sphere_scene(cfg: RenderConfig) -> Scene:
    cam = cfg.camera
    s = Scene()
    s.add_sphere(
        SphereData.new(
            (0.5 * cam.scene_width, 0.5 * cam.scene_height, 0.3 * cam.scene_depth),
            0.2 * cam.scene_depth,
            (1.0, 0.2, 0.2),
        )
    )
    s.add_light(PointLight.new((0.5, 0.0, 0.0), (1.0, 1.0, 1.0), 1.0))
    return s


def preprocessed_light_tuples(scene: Scene, cfg: RenderConfig):
    """Host-side cloud expansion shared by oracle and engine."""
    from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.lighting import (
        preprocess_lights,
    )

    pos, col, inten = preprocess_lights(
        scene.scene_lights, cfg.point_light_multiplicator, cfg.camera, seed=cfg.seed
    )
    return [(pos[i], col[i], float(inten[i])) for i in range(pos.shape[0])]


def translucent_scene(cfg: RenderConfig) -> Scene:
    """Low-opacity transmissives exercising the adaptive refraction budget
    branches (divisor 3 at op<=0.3, divisor 2 / step 2 at op<0.5 —
    ref raytracer_renderer.rs:458-491)."""
    cam = cfg.camera
    w, h, d = cam.scene_width, cam.scene_height, cam.scene_depth
    s = Scene()
    s.add_sphere(
        SphereData.with_material(
            (0.3 * w, 0.5 * h, 0.3 * d), 0.15 * d,
            Material.new((0.9, 0.95, 1.0), 0.0, 0.2, TransmissionProperties.new(0.25, 1.4)),
        )
    )
    s.add_sphere(
        SphereData.with_material(
            (0.65 * w, 0.5 * h, 0.35 * d), 0.15 * d,
            Material.new((1.0, 0.9, 0.9), 0.1, 0.3, TransmissionProperties.new(0.45, 1.6)),
        )
    )
    s.add_sphere(
        SphereData.with_material(
            (0.5 * w, 0.52 * h, 0.62 * d), 0.2 * d,
            Material.new((0.9, 0.2, 0.3), 0.0, 0.4, TransmissionProperties.none()),
        )
    )
    for tri in BoundedPlane.with_material(
        (0.0, 0.0, -1.0), (0.5 * w, 0.5 * h, 0.95 * d), (0.0, 1.0, 0.0),
        1.4 * w, 1.4 * h, 0.02 * d,
        Material.new((0.6, 0.6, 0.7), 0.0, 0.1, TransmissionProperties.none()),
    ).to_basic_geometries():
        s.add_triangle(tri)
    s.add_light(PointLight.new((0.5 * w, 0.1 * h, 0.05 * d), (1.0, 0.9, 0.8), 0.9))
    return s
