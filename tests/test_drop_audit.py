"""The drop counter must be LIVE in the production (u32-encode) paths.

Round-3 gap: `trace_rays` counted pool/stack saturation, but the u32/bench/
mesh paths discarded the counter — a capacity regression would have silently
lost reflection/refraction energy exactly where it ships. The reference
recursion never drops subtrees (ref raytracer_renderer.rs:216-248), so the
rebuilt engine surfaces the per-tile drop count from every path and the
renderer/bench warn loudly.

These gates exercise both directions at pool-engaging (bench-shaped) tiles:
a deliberately undersized pool (cfg.pool_capacity) MUST report drops, and
the auto-sized pool MUST report zero.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from hslu_i.ba_raytracing.f2501_raytracer_tpu import (
    RenderConfig,
    build_device_scene,
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.trace import (
    trace_rays_tiled_u32,
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.renderer import RaytracerRenderer

from test_pool_saturation import glass_hall_scene, _primary_rays


def _cfg(**kw):
    # R = 2048 rays/tile >= kernel_ray_tile(256) * ratio(8) -> the pool
    # path engages, exactly like the bench's 131072-ray tiles
    base = dict(
        width=64,
        height=32,
        reflections=True,
        refractions=True,
        max_nodes=256,
        weight_cutoff=0.0,
        compaction_ratio=8,
        tile_rays=2048,
    )
    base.update(kw)
    return RenderConfig(**base)


def _tiles(cfg):
    o, d = _primary_rays(cfg)
    return o.reshape(1, -1, 3), d.reshape(1, -1, 3)


def test_undersized_pool_reports_drops_through_u32_path():
    cfg = _cfg(pool_capacity=1)  # clamps to the legal floor (2R rows)
    scene = glass_hall_scene(cfg)
    ds = build_device_scene(scene, cfg)
    o_t, d_t = _tiles(cfg)
    w = jnp.ones((1,), jnp.float32)
    u32, dropped = trace_rays_tiled_u32(ds, cfg, o_t, d_t, w)
    assert dropped.shape == (1,)
    assert int(np.asarray(dropped).sum()) > 0, (
        "a floor-capacity pool under sustained branching must saturate — "
        "if this holds, the drop counter is dark in the production path"
    )


def test_auto_sized_pool_reports_zero_drops_through_u32_path():
    cfg = _cfg()
    scene = glass_hall_scene(cfg)
    ds = build_device_scene(scene, cfg)
    o_t, d_t = _tiles(cfg)
    w = jnp.ones((1,), jnp.float32)
    u32, dropped = trace_rays_tiled_u32(ds, cfg, o_t, d_t, w)
    assert int(np.asarray(dropped).sum()) == 0


def test_undersized_stack_reports_drops_through_u32_path():
    # compaction off -> the full-width per-ray stack path; stack_size=1
    # cannot hold both children of a branching hit
    cfg = _cfg(compaction_ratio=1, stack_size=1, max_nodes=48)
    scene = glass_hall_scene(cfg)
    ds = build_device_scene(scene, cfg)
    o_t, d_t = _tiles(cfg)
    w = jnp.ones((1,), jnp.float32)
    _, dropped = trace_rays_tiled_u32(ds, cfg, o_t, d_t, w)
    assert int(np.asarray(dropped).sum()) > 0


def test_renderer_warns_on_drops(capsys):
    cfg = _cfg(device_encode=True, pool_capacity=1, max_nodes=48)
    scene = glass_hall_scene(cfg)
    buf = RaytracerRenderer(cfg).render(scene)
    out = capsys.readouterr().out
    assert "WARNING: ray pool/stack saturated" in out
    assert buf.valid.any()


def test_renderer_quiet_at_default_capacity(capsys):
    cfg = _cfg(device_encode=True, max_nodes=48)
    scene = glass_hall_scene(cfg)
    RaytracerRenderer(cfg).render(scene)
    assert "WARNING" not in capsys.readouterr().out
