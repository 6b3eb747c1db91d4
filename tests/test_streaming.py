"""HBM-streaming scene variant vs the resident path.

Scenes past the VMEM ceiling (cfg.stream_triangles) switch cast/occlude to
the 2-D-grid streaming kernels and lighting to the occlusion path
(ref parity: the reference's linear scan has no scene-size ceiling,
raytracer.rs:180). The streaming kernels must agree with the resident
kernels/XLA path on identical scenes — same per-block math, same
front-to-back strict-min combine."""

from __future__ import annotations

import dataclasses

import numpy as np
import pytest

from hslu_i.ba_raytracing.f2501_raytracer_tpu import (
    RaytracerRenderer,
    RenderConfig,
    build_device_scene,
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.intersect import (
    cast_rays,
    occlude_rays,
)
from scenes import mixed_scene

import jax.numpy as jnp

SIZE = dict(width=24, height=20, tile_rays=24 * 20, weight_cutoff=0.0, max_nodes=256)


def _scene_pair():
    """Same scene, resident and forced-streaming DeviceScene views."""
    cfg = RenderConfig(reflections=True, refractions=True, **SIZE)
    scene = mixed_scene(cfg)
    ds = build_device_scene(scene, cfg)
    ds_stream = dataclasses.replace(ds, streaming=True)
    return cfg, ds, ds_stream


def _rays(n=512, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-1.0, 3.0, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("backface", [False, True])
def test_cast_stream_matches_resident(backface):
    cfg, ds, ds_s = _scene_pair()
    o, d = _rays()
    a = cast_rays(ds, o, d, backface, use_pallas=True, interpret=True)
    b = cast_rays(ds_s, o, d, backface, use_pallas=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    both = np.asarray(a.valid)
    np.testing.assert_allclose(
        np.asarray(a.t)[both], np.asarray(b.t)[both], rtol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(a.obj_idx)[both], np.asarray(b.obj_idx)[both]
    )


@pytest.mark.parametrize("backface", [False, True])
def test_occlude_stream_matches_resident(backface):
    cfg, ds, ds_s = _scene_pair()
    o, d = _rays(512, seed=1)
    md = jnp.full((512,), 5.0, jnp.float32)
    a = occlude_rays(ds, o, d, md, backface, use_pallas=True, interpret=True)
    b = occlude_rays(ds_s, o, d, md, backface, use_pallas=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a[2]), np.asarray(b[2]), atol=1e-6)


def test_streaming_render_matches_resident():
    """Full render through the streaming path (forced via a tiny threshold)
    vs the resident render — image-level agreement."""
    cfg = RenderConfig(
        reflections=True, refractions=True, use_pallas=True, interpret=True,
        **SIZE,
    )
    scene = mixed_scene(cfg)
    buf_res = RaytracerRenderer(cfg).render(scene)
    cfg_s = dataclasses.replace(cfg, stream_triangles=1)
    buf_s = RaytracerRenderer(cfg_s).render(scene)
    np.testing.assert_array_equal(buf_res.valid, buf_s.valid)
    diff = np.abs(buf_res.as_linear() - buf_s.as_linear())
    assert (diff.max(axis=-1) > 2e-3).mean() < 0.005, f"max {diff.max():.5f}"


def test_streaming_auto_threshold():
    """build_device_scene flips to streaming past cfg.stream_triangles."""
    cfg = RenderConfig(**SIZE)
    scene = mixed_scene(cfg)
    assert not build_device_scene(scene, cfg).streaming
    cfg_small = dataclasses.replace(cfg, stream_triangles=4)
    assert build_device_scene(scene, cfg_small).streaming


def _clustered_mixed_blocks_scene(cfg):
    """Two spatial clusters of small triangles — one transmissive, one
    opaque — so the Morton blocks carry MIXED per-block trans flags and the
    streaming kernel's per-block Fresnel cond takes both branches
    (ADVICE r2 item 4)."""
    from hslu_i.ba_raytracing.f2501_raytracer_tpu import (
        Material,
        PointLight,
        TransmissionProperties,
        TriangleData,
    )

    cam = cfg.camera
    w, h, d = cam.scene_width, cam.scene_height, cam.scene_depth
    rng = np.random.default_rng(7)
    s = __import__(
        "hslu_i.ba_raytracing.f2501_raytracer_tpu", fromlist=["Scene"]
    ).Scene()
    glass = Material.new(
        (0.9, 0.95, 1.0), 0.0, 0.2, TransmissionProperties.new(0.35, 1.5)
    )
    matte = Material.new((0.7, 0.4, 0.3), 0.0, 0.5, TransmissionProperties.none())
    # clusters in opposite octants (all three axes) so the Morton sort
    # cleanly separates them into different blocks
    for ci, (cx, mat) in enumerate([(0.18, glass), (0.80, matte)]):
        base = np.array([cx * w, cx * h, cx * d], np.float32)
        for _ in range(40):
            p = base + rng.uniform(-0.06, 0.06, 3).astype(np.float32) * (w, h, d)
            e1 = rng.normal(size=3).astype(np.float32) * 0.02 * d
            e2 = rng.normal(size=3).astype(np.float32) * 0.02 * d
            s.add_triangle(
                TriangleData.with_material(tuple(p), tuple(p + e1), tuple(p + e2), mat)
            )
    s.add_light(PointLight.new((0.5 * w, 0.1 * h, 0.1 * d), (1.0, 0.9, 0.8), 1.0))
    return s


@pytest.mark.parametrize("backface", [False, True])
def test_occlude_stream_mixed_trans_blocks(backface):
    """Streaming occlusion == resident occlusion on a scene whose Morton
    blocks mix transmissive and opaque (exercises the per-block runtime
    Fresnel cond in _occl_stream_kernel)."""
    cfg = RenderConfig(reflections=True, refractions=True, triangle_block=32, **SIZE)
    scene = _clustered_mixed_blocks_scene(cfg)
    ds = build_device_scene(scene, cfg)
    assert len(set(ds.block_has_trans)) == 2, ds.block_has_trans
    ds_s = dataclasses.replace(ds, streaming=True)
    o, d = _rays(512, seed=3)
    md = jnp.full((512,), 5.0, jnp.float32)
    a = occlude_rays(ds, o, d, md, backface, use_pallas=True, interpret=True)
    b = occlude_rays(ds_s, o, d, md, backface, use_pallas=True, interpret=True)
    c = occlude_rays(ds, o, d, md, backface, use_pallas=False)
    for got, ref in [(b, a), (b, c)]:
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(got[2]), np.asarray(ref[2]), atol=1e-6)
