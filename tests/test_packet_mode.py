"""simd_render packet semantics (cfg.packet_mode): packet-wide spawn
decisions / shared depth budgets / packet-max adaptive refraction steps
(ref raytracer_renderer.rs:217,232,306-308,458-491,584-594).

Validation strategy: a homogeneous packet (8 identical lanes) must be
bit-identical to per-ray mode (every packet reduction degenerates to the
lane value); heterogeneous packets must exhibit the budget coupling; the
pool and stack wavefront paths must agree in packet mode."""

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
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.trace import trace_rays
from scenes import mixed_scene


def _rays_for(cfg, n_pix, repeat=8, jitter=None):
    cam = cfg.camera
    rng = np.random.default_rng(7)
    px = rng.uniform(0.1, 0.9, n_pix) * cam.scene_width
    py = rng.uniform(0.1, 0.9, n_pix) * cam.scene_height
    coords = np.stack([px, py, np.zeros(n_pix)], axis=-1).astype(np.float32)
    coords = np.repeat(coords, repeat, axis=0)
    if jitter is not None:
        coords = coords + jitter
    dirs = coords - np.asarray(cam.render_ray_focus, np.float32)
    return jnp.asarray(coords), jnp.asarray(dirs)


def test_homogeneous_packets_match_per_ray():
    """All 8 lanes identical -> every packet any()/max() degenerates to the
    lane value and packet mode must be bit-identical to per-ray mode."""
    base = RenderConfig(
        width=64, height=48, reflections=True, refractions=True,
        max_nodes=64, weight_cutoff=0.0, compaction_ratio=1, use_pallas=False,
    )
    scene = mixed_scene(base)
    from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.device import (
        build_device_scene,
    )

    ds = build_device_scene(scene, base)
    o, d = _rays_for(base, 32)
    c_ray, v_ray = trace_rays(ds, base, o, d)
    pk = dataclasses.replace(base, packet_mode=True)
    c_pk, v_pk = trace_rays(ds, pk, o, d)
    np.testing.assert_array_equal(np.asarray(v_pk), np.asarray(v_ray))
    np.testing.assert_array_equal(np.asarray(c_pk), np.asarray(c_ray))


def test_heterogeneous_packets_couple_budgets():
    """Lanes of one packet hitting glass of different opacities must couple
    through the packet-max opacity (deeper budgets for the low-opacity lane
    than its per-ray divisor would give) -> images differ from per-ray mode,
    while the primary-hit masks stay identical."""
    cfg = RenderConfig(
        width=64, height=48, reflections=True, refractions=True,
        max_nodes=96, weight_cutoff=0.0, compaction_ratio=1, use_pallas=False,
    )
    cam = cfg.camera
    w, h, dd = cam.scene_width, cam.scene_height, cam.scene_depth
    scene = Scene()
    # two glass walls side by side: opacity 0.2 (per-ray divisor 3) and 0.6
    # (divisor 1); behind them a bright diffuse wall
    scene.add_sphere(
        SphereData.with_material(
            (0.30 * w, 0.5 * h, 0.4 * dd), 0.22 * dd,
            Material.new((1.0, 1.0, 1.0), 0.0, 0.0,
                         TransmissionProperties.new(0.2, 1.5)),
        )
    )
    scene.add_sphere(
        SphereData.with_material(
            (0.62 * w, 0.5 * h, 0.4 * dd), 0.22 * dd,
            Material.new((1.0, 1.0, 1.0), 0.0, 0.0,
                         TransmissionProperties.new(0.6, 1.5)),
        )
    )
    scene.add_sphere(
        SphereData.with_material(
            (0.5 * w, 0.5 * h, 1.05 * dd), 0.4 * dd,
            Material.new((0.9, 0.8, 0.2), 0.0, 0.5, TransmissionProperties.none()),
        )
    )
    scene.add_light(PointLight.new((0.5 * w, 0.15 * h, 0.2 * dd), (1, 1, 1), 0.9))

    from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.device import (
        build_device_scene,
    )

    ds = build_device_scene(scene, cfg)
    # packets straddle the two spheres: 4 lanes on each
    n_pk = 48
    rng = np.random.default_rng(3)
    py = rng.uniform(0.35, 0.65, n_pk) * h
    ax = rng.uniform(0.22, 0.38, (n_pk, 4)) * w
    bx = rng.uniform(0.54, 0.70, (n_pk, 4)) * w
    px = np.concatenate([ax, bx], axis=1).reshape(-1)
    coords = np.stack(
        [px, np.repeat(py, 8), np.zeros(n_pk * 8)], axis=-1
    ).astype(np.float32)
    dirs = coords - np.asarray(cam.render_ray_focus, np.float32)
    o, d = jnp.asarray(coords), jnp.asarray(dirs)

    c_ray, v_ray = trace_rays(ds, cfg, o, d)
    pk = dataclasses.replace(cfg, packet_mode=True)
    c_pk, v_pk = trace_rays(ds, pk, o, d)
    np.testing.assert_array_equal(np.asarray(v_pk), np.asarray(v_ray))
    diff = np.abs(np.asarray(c_pk) - np.asarray(c_ray)).max()
    assert diff > 1e-4, "packet budget coupling should change the image"
    assert np.isfinite(np.asarray(c_pk)).all()


def test_packet_pool_matches_stack():
    """The compacted pool services whole packets (W and all push widths are
    multiples of 8), so pool and stack paths must agree in packet mode."""
    cfg = RenderConfig(
        width=64, height=32, reflections=True, refractions=True,
        max_nodes=64, weight_cutoff=0.0, compaction_ratio=1, use_pallas=False,
        packet_mode=True,
    )
    scene = mixed_scene(cfg)
    from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.device import (
        build_device_scene,
    )

    ds = build_device_scene(scene, cfg)
    o, d = _rays_for(cfg, 64)  # R = 512
    c_stack, v_stack = trace_rays(ds, cfg, o, d)
    pool = dataclasses.replace(cfg, compaction_ratio=2)  # 512 >= 256*2
    c_pool, v_pool = trace_rays(ds, pool, o, d)
    np.testing.assert_array_equal(np.asarray(v_pool), np.asarray(v_stack))
    np.testing.assert_allclose(
        np.asarray(c_pool), np.asarray(c_stack), rtol=1e-5, atol=1e-6
    )
