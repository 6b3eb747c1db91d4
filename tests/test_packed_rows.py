"""Packed pool-row kernel epilogue (cfg.packed_stage): bit-identity.

The fused shade+eval kernel writes each child's (T, 16) POOL_COLS staging
rows directly (pallas_shade_eval_rows) instead of per-field outputs that
XLA transposes and `_pack_entry` re-concatenates. The row VALUES are the
same f32 ops on the same kernel locals, so the pool state — and therefore
the whole trace — must be BIT-identical with the flag on and off, on the
compacted-pool path the flag targets (ops/trace.py::_run_pool).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from hslu_i.ba_raytracing.f2501_raytracer_tpu import RenderConfig
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.camera import (
    pixel_scene_coords,
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.trace import trace_rays
from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.device import (
    build_device_scene,
)
from scenes import mixed_scene


def _trace(cfg, kw):
    c = dataclasses.replace(cfg, **kw)
    ds = build_device_scene(mixed_scene(c), c)
    W, H = c.width, c.height
    px, py = np.meshgrid(np.arange(W), np.arange(H))
    coords = pixel_scene_coords(c, px.ravel(), py.ravel())
    focus = np.asarray(c.camera.render_ray_focus, np.float32)
    dirs = coords - focus
    color, valid, stats = trace_rays(
        ds, c, jnp.asarray(coords), jnp.asarray(dirs), with_stats=True
    )
    return np.asarray(color), np.asarray(valid), int(stats["dropped"])


def test_packed_rows_bit_identical_pool_path():
    # 24x12 = 288 rays >= kernel_ray_tile * ratio = 128*2 -> pool path
    cfg = RenderConfig(
        width=24, height=12, reflections=True, refractions=True,
        use_pallas=True, interpret=True, kernel_ray_tile=128,
        compaction_ratio=2, loop_chunk=8, max_nodes=16,
    )
    c_on, v_on, d_on = _trace(cfg, dict(packed_stage=True))
    c_off, v_off, d_off = _trace(cfg, dict(packed_stage=False))
    np.testing.assert_array_equal(v_on, v_off)
    np.testing.assert_array_equal(c_on, c_off)
    assert d_on == d_off == 0
    assert v_on.any() and (np.abs(c_on).max() > 0)


def test_packed_rows_bit_identical_single_child():
    # reflections-only: the packed path must append ONE child type's rows
    # (k=1) in the same order as the push-dict path
    cfg = RenderConfig(
        width=24, height=12, reflections=True, refractions=False,
        use_pallas=True, interpret=True, kernel_ray_tile=128,
        compaction_ratio=2, loop_chunk=8, max_nodes=16,
    )
    c_on, v_on, _ = _trace(cfg, dict(packed_stage=True))
    c_off, v_off, _ = _trace(cfg, dict(packed_stage=False))
    np.testing.assert_array_equal(v_on, v_off)
    np.testing.assert_array_equal(c_on, c_off)
