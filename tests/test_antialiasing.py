"""AA supersampling parity: the renderer's sample expansion + averaging must
equal a per-pixel oracle loop over the same offset table
(ref raytracer_renderer.rs:918-1016 antialiased_raytrace)."""

from __future__ import annotations

import numpy as np

from hslu_i.ba_raytracing.f2501_raytracer_tpu import RaytracerRenderer, RenderConfig
from hslu_i.ba_raytracing.f2501_raytracer_tpu.config import DEFAULT_REFRACTION_INDEX
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.camera import antialiasing_offsets
from oracle import OracleRenderer
from scenes import mixed_scene, preprocessed_light_tuples


def test_aa_render_matches_oracle_average():
    cfg = RenderConfig(
        width=16,
        height=12,
        anti_aliasing_rotation_scale=True,
        anti_aliasing_randomness=True,
        tile_rays=16 * 12 * 16,
        weight_cutoff=0.0,
    )
    scene = mixed_scene(cfg)
    lights = preprocessed_light_tuples(scene, cfg)
    offsets = antialiasing_offsets(cfg)
    assert offsets.shape[0] == 16

    orc = OracleRenderer(scene, cfg, lights)
    cam = cfg.camera
    focus = np.asarray(cam.render_ray_focus)

    oracle_img = np.zeros((12, 16, 3))
    oracle_valid = np.zeros((12, 16), bool)
    for py in range(12):
        for px in range(16):
            base = np.array([px * cam.w2s_width, py * cam.w2s_height, 0.0])
            direction = base - focus
            acc = np.zeros(3)
            any_valid = False
            for k in range(offsets.shape[0]):
                res = orc.single_raytrace(
                    base + offsets[k], direction, DEFAULT_REFRACTION_INDEX, None
                )
                if res is None:
                    continue
                color, v, _ = res
                if v:
                    acc += color
                    any_valid = True
            oracle_img[py, px] = acc / offsets.shape[0]
            oracle_valid[py, px] = any_valid

    buf = RaytracerRenderer(cfg).render(scene)
    img = buf.as_linear()
    mism = (buf.valid != oracle_valid).mean()
    assert mism < 0.02, f"validity mismatch {mism:.3%}"
    both = buf.valid & oracle_valid
    diff = np.abs(img - oracle_img)[both]
    frac_bad = (diff.max(axis=-1) > 2e-3).mean()
    assert frac_bad < 0.03, f"{frac_bad:.2%} bad, max {diff.max():.4f}"
