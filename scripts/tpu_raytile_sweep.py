"""Sweep cfg.kernel_ray_tile (rays per Pallas kernel instance) at 1080p
realistic in ONE relay session (cross-session variance is 3-4x; only
within-session comparisons are meaningful — PERF.md).

Motivation (round-3 profile work): the fused shade/light kernels run flat
(RT,)-wide ops; at RT=256 each op touches 2 VPU registers and a 131k-ray
tile pays 512 sequential kernel instances of issue overhead. Larger tiles
amortize the issue cost against coarser per-tile AABB culling.
"""
import os, sys, time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from hslu_i.ba_raytracing.f2501_raytracer_tpu import RenderConfig, build_device_scene
from hslu_i.ba_raytracing.f2501_raytracer_tpu.models import build
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.trace import trace_rays_tiled_u32
from hslu_i.ba_raytracing.f2501_raytracer_tpu.renderer import (
    build_frame_rays,
    plan_frame,
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.builder import Scene

W0, H0 = (int(v) for v in os.environ.get("SWEEP_RES", "1920x1080").split("x"))

VARIANTS = [
    dict(kernel_ray_tile=256),
    dict(kernel_ray_tile=512),
    dict(kernel_ray_tile=1024),
    dict(kernel_ray_tile=2048),
    # cross: coarser cull granularity may prefer a different triangle block
    dict(kernel_ray_tile=1024, triangle_block=128),
    dict(kernel_ray_tile=1024, triangle_block=256),
]

for over in VARIANTS:
    cfg = RenderConfig(
        width=W0, height=H0, reflections=True, refractions=True,
        light_reflections=True, scene_backface_culling=True,
        tile_rays=262144, compaction_ratio=64, max_nodes=48,
        weight_cutoff=1e-3, loop_chunk=128, use_pallas=True,
        triangle_block=64 if W0 * H0 >= 10**6 else 512,
        device_encode=True, dedupe_aa=True,
        **over,
    )
    scene = build("semesterbild", cfg)
    scene = Scene.backface_culling(scene, np.array([0.0, 0.0, 1.0]))
    ds = build_device_scene(scene, cfg)
    plan = plan_frame(cfg)
    o_np, d_np = build_frame_rays(cfg, plan)
    o_t, d_t = jnp.asarray(o_np), jnp.asarray(d_np)
    w_dev = jnp.asarray(plan.weights)

    def frame():
        out, _dr = trace_rays_tiled_u32(ds, cfg, o_t, d_t, w_dev)
        return np.asarray(out)

    t0 = time.monotonic()
    fb = frame()
    comp = time.monotonic() - t0
    ts = []
    for _ in range(4):
        t0 = time.monotonic()
        frame()
        ts.append((time.monotonic() - t0) * 1e3)
    chk = int(np.int64(fb.astype(np.int64).sum()) & 0xFFFFFFFF)
    print(
        f"{str(over):60s}: {min(ts):8.1f} ms "
        f"(all {[f'{t:.0f}' for t in ts]}) compile {comp:.0f}s checksum {chk:#x}",
        flush=True,
    )
