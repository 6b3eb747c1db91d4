"""The compacted ray pool must not silently drop pending secondary rays.

A heavily transmissive+reflective scene makes nearly every serviced ray push
BOTH children (metallic > 0 spawns the reflection child, has_trans spawns the
refraction child), which is the sustained-branching regime where an
undersized pool would truncate the deepest pending entries and lose
reflection/refraction energy relative to the reference recursion
(ref raytracer_renderer.rs:279-524, 526-729). The pool is sized from the
LIFO/DFS depth bound (ops/trace.py); this gate compares the pool path
against the full-width stack path, which never drops."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from hslu_i.ba_raytracing.f2501_raytracer_tpu import (
    Material,
    PointLight,
    RenderConfig,
    Scene,
    SphereData,
    TransmissionProperties,
    build_device_scene,
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.trace import trace_rays


def glass_hall_scene(cfg: RenderConfig) -> Scene:
    """Overlapping metallic glass spheres filling the whole view: every hit
    branches into reflection AND refraction, and nested interfaces keep the
    chains alive to the full depth budget."""
    cam = cfg.camera
    w, h, d = cam.scene_width, cam.scene_height, cam.scene_depth
    s = Scene()
    glass = Material.new(
        (0.95, 0.97, 1.0), 0.4, 0.3, TransmissionProperties.new_with_boost(0.6, 1.5, 0.1)
    )
    for i in range(4):
        for j in range(3):
            s.add_sphere(
                SphereData.with_material(
                    ((0.18 + 0.22 * i) * w, (0.25 + 0.25 * j) * h, (0.25 + 0.13 * i) * d),
                    0.22 * d,
                    glass,
                )
            )
    s.add_light(PointLight.new((0.5 * w, 0.05 * h, 0.02 * d), (1.0, 1.0, 0.95), 1.0))
    return s


def _primary_rays(cfg):
    cam = cfg.camera
    px, py = np.meshgrid(np.arange(cfg.width), np.arange(cfg.height))
    coords = np.stack(
        [
            px.reshape(-1) * cam.w2s_width,
            py.reshape(-1) * cam.w2s_height,
            np.zeros(cfg.width * cfg.height),
        ],
        axis=-1,
    ).astype(np.float32)
    dirs = coords - np.asarray(cam.render_ray_focus, np.float32)
    return jnp.asarray(coords), jnp.asarray(dirs)


def test_pool_never_drops_under_sustained_branching():
    W, H = 64, 32  # R = 2048 >= 256 * ratio -> pool path
    cfg = RenderConfig(
        width=W,
        height=H,
        reflections=True,
        refractions=True,
        max_nodes=512,
        weight_cutoff=0.0,
        compaction_ratio=1,
    )
    scene = glass_hall_scene(cfg)
    ds = build_device_scene(scene, cfg)
    o, d = _primary_rays(cfg)

    c_stack, v_stack, st_stack = trace_rays(ds, cfg, o, d, with_stats=True)
    cfg_pool = dataclasses.replace(cfg, compaction_ratio=8)
    c_pool, v_pool, st_pool = trace_rays(ds, cfg_pool, o, d, with_stats=True)

    assert int(st_stack["dropped"]) == 0
    assert int(st_pool["dropped"]) == 0
    np.testing.assert_array_equal(np.asarray(v_pool), np.asarray(v_stack))
    np.testing.assert_allclose(
        np.asarray(c_pool), np.asarray(c_stack), rtol=1e-5, atol=1e-6
    )
