"""Multi-device tests on the 8-way virtual CPU mesh: sharded rendering must
agree bitwise-ish with single-device rendering, and the object-sharded cast
must reproduce the dense nearest-hit."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hslu_i.ba_raytracing.f2501_raytracer_tpu import RenderConfig, build_device_scene
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.intersect import cast_rays
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.trace import trace_rays
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.vecmath import normalized
from hslu_i.ba_raytracing.f2501_raytracer_tpu.parallel import (
    cast_nearest_objsharded,
    make_mesh,
    render_image_sharded,
)
from scenes import mixed_scene


@pytest.fixture(scope="module")
def setup():
    cfg = RenderConfig(
        width=32, height=16, reflections=True, refractions=True, max_nodes=64
    )
    scene = mixed_scene(cfg)
    ds = build_device_scene(scene, cfg, min_tri_blocks=8)
    cam = cfg.camera
    px, py = np.meshgrid(np.arange(32), np.arange(16))
    coords = np.stack(
        [
            px.reshape(-1) * cam.w2s_width,
            py.reshape(-1) * cam.w2s_height,
            np.zeros(512),
        ],
        axis=-1,
    ).astype(np.float32)
    dirs = coords - np.asarray(cam.render_ray_focus, np.float32)
    return cfg, ds, jnp.asarray(coords), jnp.asarray(dirs)


def test_devices_available():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"


def test_render_image_sharded_matches_single(setup):
    cfg, ds, o, d = setup
    mesh = make_mesh(8)
    color_m, valid_m = render_image_sharded(ds, cfg, o, d, mesh)
    color_1, valid_1 = trace_rays(ds, cfg, o, d)
    np.testing.assert_array_equal(np.asarray(valid_m), np.asarray(valid_1))
    np.testing.assert_allclose(
        np.asarray(color_m), np.asarray(color_1), rtol=1e-5, atol=1e-6
    )


def test_objsharded_cast_matches_dense(setup):
    cfg, ds, o, d = setup
    dn = normalized(d)
    mesh = make_mesh(8, axis="objs")
    if ds.triangle_blocks % 8 != 0:
        pytest.skip("triangle blocks not divisible by mesh size")
    t_s, idx_s, valid_s = cast_nearest_objsharded(ds, o, dn, mesh)
    hit = cast_rays(ds, o, dn, False)
    np.testing.assert_array_equal(np.asarray(valid_s), np.asarray(hit.valid))
    both = np.asarray(valid_s)
    np.testing.assert_allclose(
        np.asarray(t_s)[both], np.asarray(hit.t)[both], rtol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(idx_s)[both], np.asarray(hit.obj_idx)[both]
    )
