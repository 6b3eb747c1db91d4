"""Interleaved same-session A/B: uniform G=8 vs tapered fetch schedule.

The overlap sweep's variant ordering reorders between relay sessions
(knob plateau, PERF.md); an interleaved A/B/A/B sequence cancels slow
session drift and gives a paired comparison."""
import os
import sys
import time

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
    fetch_schedule,
    plan_frame,
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.builder import Scene

cfg = RenderConfig(
    width=1920, height=1080, scene_backface_culling=True,
    reflections=True, light_reflections=True, refractions=True,
    tile_rays=131072, max_nodes=48, weight_cutoff=1e-3,
    compaction_ratio=64, loop_chunk=128, use_pallas=True,
    triangle_block=64, kernel_ray_tile=512,
    device_encode=True, dedupe_aa=True,
)
scene = build("semesterbild", cfg)
scene = Scene.backface_culling(scene, np.array([0.0, 0.0, 1.0]))
ds = build_device_scene(scene, cfg)
plan = plan_frame(cfg)
o_np, d_np = build_frame_rays(cfg, plan)
o_t, d_t = jnp.asarray(o_np), jnp.asarray(d_np)
w_dev = jnp.asarray(plan.weights)
n = o_t.shape[0]

ASYNC = os.environ.get("AB_ASYNC", "1") == "1"


from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.trace import (
    trace_rays_tiled_u32_gen,
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.renderer import frame_order_device

order_dev, offs_dev = frame_order_device(cfg, plan, n)
pixt = plan.pix_per_tile


def frame(sizes, use_async, gen=False):
    outs, gs = [], 0
    for sz in sizes:
        if gen:
            outs.append(
                trace_rays_tiled_u32_gen(
                    ds, cfg, order_dev[gs * pixt : (gs + sz) * pixt],
                    offs_dev, w_dev, n_tiles=sz,
                )
            )
        else:
            outs.append(
                trace_rays_tiled_u32(
                    ds, cfg, o_t[gs : gs + sz], d_t[gs : gs + sz], w_dev
                )
            )
        gs += sz
    if use_async:
        for o, _dr in outs:
            o.copy_to_host_async()
    return np.concatenate([np.asarray(o) for o, _dr in outs])


# MODE=sched: uniform G8 vs tapered (async per AB_ASYNC on both)
# MODE=async: uniform G8 with vs without the up-front copy_to_host_async
# MODE=gsweep: group-count sweep under async fetch (the G=8 default was
#   tuned under the old blocking per-group fetch)
mode = os.environ.get("AB_MODE", "sched")
if mode == "async":
    VARIANTS = {
        "sync_fetch": ([n // 8] * 8, False),
        "async_fetch": ([n // 8] * 8, True),
    }
elif mode == "gsweep":
    VARIANTS = {
        f"G{g}": ([n // g] * g, True, False) for g in (2, 4, 8, 16) if n % g == 0
    }
    VARIANTS["taper"] = (fetch_schedule(n), True, False)
elif mode == "raygen":
    VARIANTS = {
        "host_rays": (fetch_schedule(n), True, False),
        "device_gen": (fetch_schedule(n), True, True),
    }
else:
    VARIANTS = {
        "uniformG8": ([n // 8] * 8, ASYNC),
        "taper": (fetch_schedule(n), ASYNC),
    }
VARIANTS = {k: (v + (False,))[:3] for k, v in VARIANTS.items()}
for name, (s, ua, gen) in VARIANTS.items():
    frame(s, ua, gen)  # compile
rounds = int(os.environ.get("AB_ROUNDS", 8))
res = {k: [] for k in VARIANTS}
for r in range(rounds):
    for name, (s, ua, gen) in VARIANTS.items():
        t0 = time.monotonic()
        frame(s, ua, gen)
        res[name].append((time.monotonic() - t0) * 1e3)
print(f"n_tiles={n} variants={list(VARIANTS)}")
for name, ts in res.items():
    arr = np.array(ts)
    print(
        f"{name:12s}: min {arr.min():7.1f}  median {np.median(arr):7.1f} "
        f" all {[f'{t:.0f}' for t in ts]}"
    )
names = list(VARIANTS)
base = names[0]
for kb in names[1:]:
    d = np.array(res[kb]) - np.array(res[base])
    print(f"paired {kb}-{base} per round (ms): {[f'{x:+.0f}' for x in d]}  "
          f"median {np.median(d):+.1f}")
