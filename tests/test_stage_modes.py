"""The pool staging-compaction machinery (cfg.stage_mode) must be
output-IDENTICAL across modes: scatter (drop-slot row scatter), gather
(searchsorted-inverse + row gather) and unique (collision-free scatter into
a 2x buffer) compact the same accepted candidate rows to the same dense
pool positions; only which XLA op pays the per-row cost differs
(ops/trace.py _pool_append; A/B in scripts/tpu_stage_ab.py)."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from hslu_i.ba_raytracing.f2501_raytracer_tpu import RenderConfig, build_device_scene
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.trace import trace_rays
from scenes import mixed_scene


def test_stage_modes_bit_identical():
    W, H = 64, 32
    cfg = RenderConfig(
        width=W,
        height=H,
        reflections=True,
        refractions=True,
        max_nodes=64,
        weight_cutoff=0.0,
        compaction_ratio=8,
        loop_chunk=16,
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

    base, v_base = trace_rays(ds, cfg, o, d)
    for mode in ("gather", "unique"):
        c, v = trace_rays(ds, dataclasses.replace(cfg, stage_mode=mode), o, d)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(v_base))
        np.testing.assert_array_equal(np.asarray(c), np.asarray(base))
    # the cond-gated segmented contribution commit is exact: skipped
    # segments hold only rows the n_exec mask discards anyway
    for splits in (4, 8, 5):
        c, v = trace_rays(
            ds, dataclasses.replace(cfg, commit_splits=splits), o, d
        )
        np.testing.assert_array_equal(np.asarray(v), np.asarray(v_base))
        np.testing.assert_array_equal(np.asarray(c), np.asarray(base))
