"""Every BASELINE.json benchmark config must construct, resolve its derived
quality constants, and build a device scene; the one config no other test
traces (soft_shadows) gets a tiny end-to-end render. (Full per-config traces
live on the TPU side: bench.py BENCH_CONFIG=..., numbers in PERF.md.)"""

from __future__ import annotations

import numpy as np

import bench
from hslu_i.ba_raytracing.f2501_raytracer_tpu import (
    RaytracerRenderer,
    RenderConfig,
    build_device_scene,
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.models import build


def test_all_bench_configs_construct_and_build():
    expected = {
        # (anti_aliasing, aa_rays, light_multiplier, realistic)
        "default": (False, 1, 1, False),
        "anti_aliasing": (True, 16, 1, False),
        "soft_shadows": (False, 1, 10, False),
        "realistic": (False, 1, 1, True),
        "extreme": (True, 24, 28, True),
    }
    for name, kw in bench.CONFIGS.items():
        cfg = RenderConfig(width=16, height=8, scene_backface_culling=True, **kw)
        aa, aar, lm, real = expected[name]
        assert cfg.anti_aliasing == aa, name
        if cfg.anti_aliasing:
            assert cfg.total_aa_rays == aar, name
        assert cfg.point_light_multiplicator == lm, name
        assert cfg.realistic == real, name
        # device scene builds (lowres mesh: hq OBJ is slow to load on CPU)
        scene_cfg = (
            RenderConfig(width=16, height=8, scene_backface_culling=True)
            if cfg.high_quality_model
            else cfg
        )
        ds = build_device_scene(build("semesterbild", scene_cfg), cfg)
        assert ds.n_triangles > 0, name


def test_soft_shadows_traces():
    cfg = RenderConfig(
        width=16, height=8, scene_backface_culling=True, soft_shadows=True,
        max_nodes=4,
    )
    buf = RaytracerRenderer(cfg).render(build("semesterbild", cfg))
    img = buf.as_u8()
    assert img.shape == (8, 16, 3)
    assert bool(buf.valid.any()) and int(img.max()) > 0
