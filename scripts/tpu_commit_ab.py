"""Interleaved same-session A/B over cfg.commit_splits (cond-gated
segmented per-chunk contribution commit).

The HEAD tile profile puts the per-chunk contribution scatter-add
(fusion.47) at 2.96 ms of a 34.6 ms tile; the staged buffer covers all
loop_chunk=128 iterations but typical 1080p tiles execute ~66, so gating
the commit in segments skips the unexecuted suffix (~25-40% of the
scatter rows). Exact — asserted bit-identical below. Full-frame paired
rounds at 1080p realistic on the bench path.
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

cfg0 = RenderConfig(
    width=1920, height=1080, scene_backface_culling=True,
    reflections=True, light_reflections=True, refractions=True,
    tile_rays=131072, max_nodes=48, weight_cutoff=1e-3,
    compaction_ratio=64, loop_chunk=128, use_pallas=True,
    triangle_block=64, kernel_ray_tile=512,
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
sizes = fetch_schedule(n)

SPLITS = [int(v) for v in os.environ.get("SPLITS", "1,4,8").split(",")]


def frame(cfg):
    outs, gs = [], 0
    for sz in sizes:
        outs.append(
            trace_rays_tiled_u32_gen(
                ds, cfg, order_dev[gs * pixt : (gs + sz) * pixt],
                offs_dev, w_dev, n_tiles=sz,
            )
        )
        gs += sz
    for o, _dr in outs:
        o.copy_to_host_async()
    return np.concatenate([np.asarray(o) for o, _dr in outs])


VARIANTS = {
    f"splits={sp}": dataclasses.replace(cfg0, commit_splits=sp)
    for sp in SPLITS
}
frames = {}
for name, c in VARIANTS.items():
    t0 = time.monotonic()
    frames[name] = frame(c)  # compile
    print(f"{name}: compile+first {time.monotonic()-t0:.1f}s", flush=True)
base_name = list(VARIANTS)[0]
for name in list(VARIANTS)[1:]:  # the image must be BIT-identical
    np.testing.assert_array_equal(frames[base_name], frames[name])
print("frames bit-identical across commit splits", flush=True)

rounds = int(os.environ.get("AB_ROUNDS", 6))
res = {k: [] for k in VARIANTS}
for r in range(rounds):
    for name, c in VARIANTS.items():
        t0 = time.monotonic()
        frame(c)
        res[name].append((time.monotonic() - t0) * 1e3)
for name, ts in res.items():
    arr = np.array(ts)
    print(f"{name:12s}: min {arr.min():7.1f}  median {np.median(arr):7.1f} "
          f" all {[f'{t:.0f}' for t in ts]}", flush=True)
for name in list(VARIANTS)[1:]:
    d = np.array(res[name]) - np.array(res[base_name])
    print(f"paired {name}-{base_name} (ms): {[f'{x:+.0f}' for x in d]}  "
          f"median {np.median(d):+.1f}")
