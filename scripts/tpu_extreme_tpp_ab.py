"""Same-session A/B over the extreme frame's program structure at 480x270:
tiles_per_program (TPP) chunking vs the overlapped/tapered fetch path.

bench.py defaults extreme to TPP=4 (watchdog safety for FULL-RES programs
that run minutes); at 480x270 each program is ~10 s, far under the ~4-min
relay watchdog, so the overlap path (TPP=0: dispatch all fetch groups,
stream D2H async) may win like it does at 1080p realistic. VERDICT r4
item 6 names "larger tiles_per_program now that groups are balanced" as
the unattempted knob.

Variants run interleaved in ONE session; images asserted bit-identical.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses

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
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.trace import (
    trace_rays_tiled_u32_gen,
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.renderer import (
    fetch_schedule,
    frame_order_device,
    plan_frame,
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.builder import Scene

W = int(os.environ.get("AB_W", 480))
H = int(os.environ.get("AB_H", 270))
cfg0 = RenderConfig(
    width=W, height=H, scene_backface_culling=True,
    reflections=True, light_reflections=True, refractions=True,
    anti_aliasing_rotation_scale=True, anti_aliasing_randomness=True,
    extreme_quality=True, high_quality_model=True,
    tile_rays=int(os.environ.get("AB_TILE", 262144)),
    max_nodes=48, weight_cutoff=1e-3,
    compaction_ratio=64, loop_chunk=128, use_pallas=True,
    triangle_block=0, kernel_ray_tile=512,
    device_encode=True, dedupe_aa=True,
)
scene = build("semesterbild", cfg0)
scene = Scene.backface_culling(scene, np.array([0.0, 0.0, 1.0]))
ds = build_device_scene(scene, cfg0)
plan = plan_frame(cfg0)
n = plan.n_tiles
order_dev, offs_dev = frame_order_device(cfg0, plan, n)
w_dev = jnp.asarray(plan.weights)
pixt = plan.pix_per_tile
print(f"extreme {W}x{H}: n_tiles={n} aa={plan.aa} pixt={pixt}", flush=True)


def frame_tpp(tpp):
    """bench.py's chunked TPP path."""
    n_g = (n + tpp - 1) // tpp * tpp
    pad_g = n_g - n
    og_pad = (
        jnp.concatenate([order_dev, jnp.full((pad_g * pixt,), -1, jnp.int32)])
        if pad_g else order_dev
    )
    parts = []
    for gs in range(0, n_g, tpp):
        out, dr = trace_rays_tiled_u32_gen(
            ds, cfg0, og_pad[gs * pixt : (gs + tpp) * pixt],
            offs_dev, w_dev, n_tiles=tpp,
        )
        np.asarray(out[0, 0])  # sync per group (watchdog)
        parts.append(out)
    return np.concatenate([np.asarray(p) for p in parts])[:n]


def frame_overlap():
    """bench.py's overlapped/tapered async-fetch path."""
    sizes = fetch_schedule(n, max_groups=8)
    parts, gs = [], 0
    for sz in sizes:
        parts.append(
            trace_rays_tiled_u32_gen(
                ds, cfg0, order_dev[gs * pixt : (gs + sz) * pixt],
                offs_dev, w_dev, n_tiles=sz,
            )
        )
        gs += sz
    for p, dr in parts:
        p.copy_to_host_async()
        dr.copy_to_host_async()
    return np.concatenate([np.asarray(p) for p, _ in parts])


VARIANTS = {}
for v in os.environ.get("AB_VARIANTS", "tpp4,overlap,tpp9").split(","):
    if v == "overlap":
        VARIANTS[v] = frame_overlap
    else:
        VARIANTS[v] = (lambda t: lambda: frame_tpp(t))(int(v[3:]))

frames = {}
for name, f in VARIANTS.items():
    t0 = time.monotonic()
    frames[name] = f()  # compile + first
    print(f"{name}: compile+first {time.monotonic()-t0:.1f}s", flush=True)
base = list(VARIANTS)[0]
for name in list(VARIANTS)[1:]:
    np.testing.assert_array_equal(frames[base], frames[name])
print("frames bit-identical across variants", flush=True)

rounds = int(os.environ.get("AB_ROUNDS", 3))
res = {k: [] for k in VARIANTS}
for r in range(rounds):
    for name, f in VARIANTS.items():
        t0 = time.monotonic()
        f()
        res[name].append(time.monotonic() - t0)
    print({k: [round(x, 2) for x in v] for k, v in res.items()}, flush=True)
for name, ts in res.items():
    arr = np.array(ts)
    print(f"{name:10s}: min {arr.min():7.2f}s  median {np.median(arr):7.2f}s",
          flush=True)
