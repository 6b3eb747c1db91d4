"""Per-scene triangle_block auto-tuner (tune.py): picks a candidate, and
every candidate is image-identical (block size only regroups the scan)."""

from __future__ import annotations

import dataclasses

import numpy as np

from hslu_i.ba_raytracing.f2501_raytracer_tpu import (
    RaytracerRenderer,
    RenderConfig,
    autotune,
)
from scenes import mixed_scene

SIZE = dict(width=24, height=20, tile_rays=24 * 20)


def test_autotune_picks_fastest_and_is_exact():
    cfg = RenderConfig(reflections=True, refractions=True, **SIZE)
    scene = mixed_scene(cfg)
    res = autotune(scene, cfg, candidates=(32, 128), repeats=1, tile=480)
    assert res.tuned_block in (32, 128)
    assert set(res.timings_ms) == {32, 128}
    assert res.cfg.triangle_block == res.tuned_block
    assert res.timings_ms[res.tuned_block] == min(res.timings_ms.values())

    # image parity: the tuned config renders bit-identically to any other
    # candidate (grouping only affects scan order, which is commutative
    # for the strict-min nearest hit and the order-free shadow sums)
    img_a = RaytracerRenderer(res.cfg).render(scene).as_linear()
    other = dataclasses.replace(cfg, triangle_block=128 if res.tuned_block == 32 else 32)
    img_b = RaytracerRenderer(other).render(scene).as_linear()
    np.testing.assert_array_equal(img_a, img_b)
