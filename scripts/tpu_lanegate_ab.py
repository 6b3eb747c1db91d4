"""Interleaved same-session A/B: LANE_GATE (per-lane evolving-opacity
block gating in the shadow scan) on vs off, full 1080p realistic frames
on the bench-default path (device raygen + taper + async fetch).

LANE_GATE is a module flag read at kernel-build time, so each variant
gets a FRESH jit of the frame function (the shared jit cache would not
retrace on a module-flag flip). Frames must be bit-identical: the gate
only skips pair math whose results are discarded by can_reach.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from functools import partial

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
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops import pallas_kernels as PK
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.trace import (
    trace_rays_tiled_u32_gen,
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.renderer import (
    fetch_schedule,
    frame_order_device,
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
n = plan.n_tiles
order_dev, offs_dev = frame_order_device(cfg, plan, n)
w_dev = jnp.asarray(plan.weights)
pixt = plan.pix_per_tile
sizes = fetch_schedule(n)

# fresh jit per variant (module flag is a trace-time constant)
JITS = {
    name: jax.jit(
        partial(trace_rays_tiled_u32_gen.__wrapped__),
        static_argnames=("cfg", "n_tiles"),
    )
    for name in ("lane_on", "lane_off")
}
FLAGS = {"lane_on": True, "lane_off": False}


def frame(name):
    PK.LANE_GATE = FLAGS[name]
    f = JITS[name]
    outs, gs = [], 0
    for sz in sizes:
        outs.append(
            f(ds, cfg, order_dev[gs * pixt : (gs + sz) * pixt],
              offs_dev, w_dev, n_tiles=sz)
        )
        gs += sz
    for o, _dr in outs:
        o.copy_to_host_async()
    return np.concatenate([np.asarray(o) for o, _dr in outs])


frames = {}
try:
    for name in JITS:
        t0 = time.monotonic()
        frames[name] = frame(name)  # compile
        print(f"{name}: compile+first {time.monotonic()-t0:.1f}s", flush=True)
    np.testing.assert_array_equal(frames["lane_on"], frames["lane_off"])
    print("frames bit-identical across LANE_GATE", flush=True)

    rounds = int(os.environ.get("AB_ROUNDS", 8))
    res = {k: [] for k in JITS}
    for r in range(rounds):
        for name in JITS:
            t0 = time.monotonic()
            frame(name)
            res[name].append((time.monotonic() - t0) * 1e3)
finally:
    PK.LANE_GATE = True
for name, ts in res.items():
    arr = np.array(ts)
    print(f"{name:10s}: min {arr.min():7.1f}  median {np.median(arr):7.1f} "
          f" all {[f'{t:.0f}' for t in ts]}", flush=True)
d = np.array(res["lane_on"]) - np.array(res["lane_off"])
print(f"paired on-off per round (ms): {[f'{x:+.0f}' for x in d]}  "
      f"median {np.median(d):+.1f}")
