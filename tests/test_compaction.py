"""Secondary-ray compaction must not change results (evaluation order of the
weight-linear node contributions is free)."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from hslu_i.ba_raytracing.f2501_raytracer_tpu import RenderConfig, build_device_scene
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.trace import trace_rays
from scenes import mixed_scene


def test_compaction_matches_full():
    W, H = 64, 32
    cfg = RenderConfig(
        width=W,
        height=H,
        reflections=True,
        refractions=True,
        max_nodes=256,
        weight_cutoff=0.0,
        compaction_ratio=1,
    )
    scene = mixed_scene(cfg)
    ds = build_device_scene(scene, cfg)
    cam = cfg.camera
    px, py = np.meshgrid(np.arange(W), np.arange(H))
    coords = np.stack(
        [
            px.reshape(-1) * cam.w2s_width,
            py.reshape(-1) * cam.w2s_height,
            np.zeros(W * H),
        ],
        axis=-1,
    ).astype(np.float32)
    dirs = coords - np.asarray(cam.render_ray_focus, np.float32)
    o, d = jnp.asarray(coords), jnp.asarray(dirs)

    c_full, v_full = trace_rays(ds, cfg, o, d)
    cfg4 = dataclasses.replace(cfg, compaction_ratio=4)
    c_cmp, v_cmp = trace_rays(ds, cfg4, o, d)

    np.testing.assert_array_equal(np.asarray(v_cmp), np.asarray(v_full))
    np.testing.assert_allclose(
        np.asarray(c_cmp), np.asarray(c_full), rtol=1e-5, atol=1e-6
    )
