"""Pallas kernels (interpret mode on CPU) vs the XLA reference path."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from hslu_i.ba_raytracing.f2501_raytracer_tpu import RenderConfig, build_device_scene
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.intersect import (
    cast_rays,
    occlude_rays,
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.vecmath import normalized
from scenes import mixed_scene


@pytest.fixture(scope="module")
def setup():
    cfg = RenderConfig(width=32, height=24)
    scene = mixed_scene(cfg)
    ds = build_device_scene(scene, cfg)
    cam = cfg.camera
    px, py = np.meshgrid(np.arange(32), np.arange(24))
    coords = np.stack(
        [
            px.reshape(-1) * cam.w2s_width,
            py.reshape(-1) * cam.w2s_height,
            np.zeros(32 * 24),
        ],
        axis=-1,
    ).astype(np.float32)
    d = normalized(jnp.asarray(coords - np.asarray(cam.render_ray_focus, np.float32)))
    return ds, jnp.asarray(coords), d


@pytest.mark.parametrize("backface", [False, True])
def test_pallas_cast_matches_xla(setup, backface):
    ds, o, d = setup
    ref = cast_rays(ds, o, d, backface, use_pallas=False)
    got = cast_rays(ds, o, d, backface, use_pallas=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref.valid))
    m = np.asarray(ref.valid)
    np.testing.assert_allclose(np.asarray(got.t)[m], np.asarray(ref.t)[m], rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(got.obj_idx)[m], np.asarray(ref.obj_idx)[m]
    )


@pytest.mark.parametrize("backface", [False, True])
def test_pallas_occlude_matches_xla(setup, backface):
    ds, o, d = setup
    # shadow rays from slightly off origin toward a light-ish point
    target = jnp.asarray([0.8, 0.1, 0.05], jnp.float32)
    sd = normalized(target[None, :] - o)
    md = jnp.full((o.shape[0],), 1.5, jnp.float32)
    ref = occlude_rays(ds, o, sd, md, backface, use_pallas=False)
    got = occlude_rays(ds, o, sd, md, backface, use_pallas=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[2]), np.asarray(ref[2]), atol=1e-5)


def test_pallas_full_trace_matches_xla(setup):
    """End-to-end: the all-Pallas path (cast + fused lighting kernels,
    interpret mode) must match the XLA engine on a realistic config."""
    import dataclasses

    from hslu_i.ba_raytracing.f2501_raytracer_tpu import build_device_scene as _b
    from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.trace import trace_rays

    ds, o, d = setup
    cfg = RenderConfig(
        width=32, height=24, reflections=True, refractions=True,
        max_nodes=64, weight_cutoff=1e-3,
    )
    dirs = d  # already normalized is fine; trace normalizes again
    c_ref, v_ref = trace_rays(ds, dataclasses.replace(cfg, use_pallas=False), o, dirs)
    c_pal, v_pal = trace_rays(
        ds, dataclasses.replace(cfg, use_pallas=True, interpret=True), o, dirs
    )
    np.testing.assert_array_equal(np.asarray(v_pal), np.asarray(v_ref))
    np.testing.assert_allclose(
        np.asarray(c_pal), np.asarray(c_ref), rtol=2e-5, atol=2e-6
    )


def test_pallas_full_trace_matches_xla_backface(setup):
    import dataclasses

    from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.trace import trace_rays

    ds, o, d = setup
    cfg = RenderConfig(
        width=32, height=24, reflections=True, refractions=True,
        backface_culling=True, max_nodes=64, weight_cutoff=1e-3,
    )
    c_ref, v_ref = trace_rays(ds, dataclasses.replace(cfg, use_pallas=False), o, d)
    c_pal, v_pal = trace_rays(
        ds, dataclasses.replace(cfg, use_pallas=True, interpret=True), o, d
    )
    np.testing.assert_array_equal(np.asarray(v_pal), np.asarray(v_ref))
    np.testing.assert_allclose(
        np.asarray(c_pal), np.asarray(c_ref), rtol=2e-5, atol=2e-6
    )
