"""Secondary benchmark: the 14.5k-face high-quality mesh at 1080p realistic.

Round-3 update: uses the library frame plan (tile-major layout + AA dedupe),
the device-side u32 encode and the overlapped group fetch — the same wall
path as bench.py — plus the round-3 kernel defaults (RT=512). r2 measured
3,663 ms (B=512, fast epoch) / 4,487 (B=256) on the old f32-fetch path.
Env: HQ_B (triangle block, default 256), HQ_TILE (default 131072),
HQ_G (fetch groups, default 8), HQ_LREF=1 adds light_reflections (full
`realistic` feature set; default off to stay comparable with r2 rows).
"""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from hslu_i.ba_raytracing.f2501_raytracer_tpu import RenderConfig, build_device_scene
from hslu_i.ba_raytracing.f2501_raytracer_tpu.models import build
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.trace import trace_rays_tiled_u32
from hslu_i.ba_raytracing.f2501_raytracer_tpu.renderer import (
    build_frame_rays,
    plan_frame,
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.builder import Scene

W, H = 1920, 1080
cfg = RenderConfig(width=W, height=H, reflections=True, refractions=True,
                   light_reflections=os.environ.get("HQ_LREF") == "1",
                   scene_backface_culling=True, high_quality_model=True,
                   triangle_block=int(os.environ.get("HQ_B", 256)),
                   tile_rays=int(os.environ.get("HQ_TILE", 131072)),
                   compaction_ratio=64, max_nodes=48, weight_cutoff=1e-3,
                   use_pallas=True, kernel_ray_tile=512, loop_chunk=128,
                   device_encode=True, dedupe_aa=True)
scene = build("semesterbild", cfg)
scene = Scene.backface_culling(scene, np.array([0.0, 0.0, 1.0]))
ds = build_device_scene(scene, cfg)
print("triangles:", ds.n_triangles, flush=True)
plan = plan_frame(cfg)
o_np, d_np = build_frame_rays(cfg, plan)
o, d = jnp.asarray(o_np), jnp.asarray(d_np)
w_dev = jnp.asarray(plan.weights)
n_tiles = o.shape[0]
from hslu_i.ba_raytracing.f2501_raytracer_tpu.renderer import fetch_schedule

# tapered schedule + async D2H streaming (same wall path as bench.py;
# HQ_G=uniform-count override for A/Bs)
G = int(os.environ.get("HQ_G", 0))
if G:
    sizes = [n_tiles // G] * G if n_tiles % G == 0 and n_tiles >= G else [n_tiles]
else:
    sizes = fetch_schedule(n_tiles)


def frame():
    parts, gs = [], 0
    for sz in sizes:
        parts.append(
            trace_rays_tiled_u32(ds, cfg, o[gs : gs + sz], d[gs : gs + sz], w_dev)
        )
        gs += sz
    for p, _dr in parts:  # queue every D2H up front (stream as groups finish)
        p.copy_to_host_async()
    return np.concatenate([np.asarray(p) for p, _dr in parts])


t0 = time.monotonic(); frame()
print("compile+first:", time.monotonic() - t0, flush=True)
ts = []
for _ in range(3):
    t0 = time.monotonic(); frame()
    ts.append(time.monotonic() - t0)
print("repeats (ms):", [f"{t*1e3:.0f}" for t in ts], flush=True)
best = min(ts)
print(json.dumps({"metric": "1080p semesterbild realistic, 14.5k-face mesh",
                  "value": round(best * 1e3, 1), "unit": "ms"}))
