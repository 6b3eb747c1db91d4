"""All five BASELINE configs in ONE relay session, reported as ratios
against that session's `realistic` row (VERDICT r2 item 7: cross-session
absolutes are 3-4x noisy, so only same-session ratios are
regression-trackable; see PERF.md per-config table).

Env: CFGBENCH_RES=WxH (default 240x135), CFGBENCH_REPEATS (default 3).
Ray layout + AA expansion go through the library renderer's plan_frame /
build_frame_rays (the same path bench.py and RaytracerRenderer use).
"""
import json
import os
import sys
import time

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

# realistic FIRST: it is the baseline row every other config is divided by
CONFIGS = {
    "realistic": dict(reflections=True, light_reflections=True, refractions=True),
    "default": dict(),
    "anti_aliasing": dict(
        anti_aliasing_rotation_scale=True, anti_aliasing_randomness=True
    ),
    "soft_shadows": dict(soft_shadows=True),
    # reference default features (AA jitter variants) stay on for the
    # shipped example — see bench.py CONFIGS["extreme"]
    "extreme": dict(
        reflections=True, light_reflections=True, refractions=True,
        anti_aliasing_rotation_scale=True, anti_aliasing_randomness=True,
        extreme_quality=True, high_quality_model=True,
    ),
}

W0, H0 = (int(v) for v in os.environ.get("CFGBENCH_RES", "240x135").split("x"))
REPEATS = int(os.environ.get("CFGBENCH_REPEATS", 3))

rows = []
for name, feats in CONFIGS.items():
    cfg = RenderConfig(
        width=W0, height=H0, scene_backface_culling=True,
        tile_rays=262144, max_nodes=48, weight_cutoff=1e-3,
        compaction_ratio=64, loop_chunk=128, use_pallas=True,
        triangle_block=0,  # auto (scene/device.py::_resolve_block)
        device_encode=True, dedupe_aa=True,
        kernel_ray_tile=int(os.environ.get("CFGBENCH_RAY_TILE", 256)),
        **feats,
    )
    scene = build("semesterbild", cfg)
    scene = Scene.backface_culling(scene, np.array([0.0, 0.0, 1.0]))
    ds = build_device_scene(scene, cfg)
    plan = plan_frame(cfg)
    o_np, d_np = build_frame_rays(cfg, plan)
    o_t, d_t = jnp.asarray(o_np), jnp.asarray(d_np)
    w_dev = jnp.asarray(plan.weights)
    n_tiles = o_t.shape[0]
    # the extreme row at >=960x540 outlives the relay's ~4-min worker
    # watchdog in one program (observed: worker crash mid-row); chunk it
    # like bench.py's tiles_per_program path, syncing per group
    tpp = int(os.environ.get("CFGBENCH_TPP", 4)) if name == "extreme" else 0

    def frame(ds=ds, cfg=cfg, o_t=o_t, d_t=d_t, w_dev=w_dev,
              n_tiles=n_tiles, tpp=tpp):
        if tpp and tpp < n_tiles:
            parts = []
            for gs in range(0, n_tiles, tpp):
                out, _dr = trace_rays_tiled_u32(
                    ds, cfg, o_t[gs : gs + tpp], d_t[gs : gs + tpp], w_dev
                )
                np.asarray(out[0, 0])  # per-group sync (watchdog safety)
                parts.append(out)
            return np.concatenate([np.asarray(p) for p in parts])
        return np.asarray(trace_rays_tiled_u32(ds, cfg, o_t, d_t, w_dev)[0])

    t0 = time.monotonic()
    frame()
    comp = time.monotonic() - t0
    ts = []
    for _ in range(REPEATS):
        t0 = time.monotonic()
        frame()
        ts.append((time.monotonic() - t0) * 1e3)
    rows.append((name, min(ts), ts, comp, plan.aa, int(ds.light_pos.shape[0]),
                 ds.n_triangles))
    print(
        f"{name:14s}: {min(ts):9.1f} ms (all {[f'{t:.0f}' for t in ts]}) "
        f"aa={plan.aa} lights={int(ds.light_pos.shape[0])} "
        f"tris={ds.n_triangles} compile {comp:.0f}s",
        flush=True,
    )

base = rows[0][1]
print(f"\n== same-session ratios vs realistic ({base:.1f} ms) @ {W0}x{H0} ==")
table = {}
for name, ms, *_ in rows:
    table[name] = round(ms / base, 3)
    print(f"{name:14s}: {ms / base:7.3f}x")
print(json.dumps({"res": f"{W0}x{H0}", "realistic_ms": round(base, 1),
                  "ratios": table}))
