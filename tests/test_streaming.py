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
