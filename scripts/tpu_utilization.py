"""Utilization account for the shadow/shading kernels (VERDICT r2 item 6).

Two measurements in ONE relay session:
  1. empirical VPU f32 "speed of light": a chained-FMA elementwise program
     at native (8,128)-aligned shapes, timed on device — avoids guessing
     clock specs for the shared relay chip;
  2. the fused shade_eval / cast kernels at bench shapes, timed the same
     way; their known per-pair op counts give achieved op/s.

utilization = achieved_ops / (elapsed * empirical_peak). A low number means
latency/issue-bound (the flat (RT,)-wide ops fill 2/8 sublanes at RT=256),
NOT compute-bound — i.e. there is headroom without algorithmic cuts.
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

# ---- 1. empirical f32 FMA peak ----
N = 8 * 1024 * 1024  # 32 MB array
K = 64  # FMAs per element per pass


@jax.jit
def fma_chain(x):
    a = jnp.float32(1.0000001)
    b = jnp.float32(1e-7)
    for _ in range(K):
        x = x * a + b
    return x


def fetch_scalar(arr):
    """Force real completion: on the relay, block_until_ready can return
    early after fresh compiles (see bench.py) — only a value fetch proves
    the program ran. 4-byte transfer; costs one relay round-trip."""
    return float(np.asarray(arr.ravel()[0]))


x = jnp.arange(N, dtype=jnp.float32)
fetch_scalar(fma_chain(x))
# relay round-trip floor for the scalar fetch itself (subtracted below)
tiny = jnp.zeros((8, 128), jnp.float32)
fetch_scalar(tiny * 1.0)
rtts = []
for _ in range(5):
    t0 = time.monotonic()
    fetch_scalar(tiny * 1.0)
    rtts.append(time.monotonic() - t0)
rtt = min(rtts)
print(f"relay scalar-fetch round-trip: {rtt*1e3:.1f} ms")
reps = 200  # amortize the round-trip: device time >> rtt
t0 = time.monotonic()
y = x
for _ in range(reps):
    y = fma_chain(y)
fetch_scalar(y)
dt = max(time.monotonic() - t0 - rtt, 1e-9)
# FMA = 2 flops
peak = N * K * reps * 2 / dt
print(f"empirical f32 FMA rate: {peak/1e12:.3f} Tflop/s "
      f"({N*4/1e6:.0f} MB array, {K} chained FMAs, {reps} reps, {dt*1e3:.1f} ms)")
# HBM roofline context for this shape: 8 B/elem moved per pass
bw = N * 8 * reps / dt
print(f"  (implied HBM traffic if uncached: {bw/1e9:.0f} GB/s)")

# ---- 2. kernel rates at bench shapes ----
from hslu_i.ba_raytracing.f2501_raytracer_tpu import RenderConfig, build_device_scene
from hslu_i.ba_raytracing.f2501_raytracer_tpu.models import build
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.trace import trace_rays
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.camera import (
    pixel_scene_coords, tile_major_order,
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.builder import Scene

W0, H0 = 1920, 1080
cfg = RenderConfig(width=W0, height=H0, reflections=True, refractions=True,
                   light_reflections=True, scene_backface_culling=True,
                   weight_cutoff=1e-3, use_pallas=True, max_nodes=48,
                   compaction_ratio=64, loop_chunk=128, tile_rays=131072,
                   triangle_block=64)
scene = build("semesterbild", cfg)
scene = Scene.backface_culling(scene, np.array([0.0, 0.0, 1.0]))
ds = build_device_scene(scene, cfg)
px, py = np.meshgrid(np.arange(W0), np.arange(H0))
order = tile_major_order(W0, H0)
px, py = px.reshape(-1)[order], py.reshape(-1)[order]
coords = pixel_scene_coords(cfg, px, py)
dirs = (coords - np.asarray(cfg.camera.render_ray_focus, np.float32)).astype(np.float32)
R = 131072
sl = slice(4 * R, 5 * R)
o, d = jnp.asarray(coords[sl]), jnp.asarray(dirs[sl])
out = trace_rays(ds, cfg, o, d)
fetch_scalar(out[0])
ts = []
for _ in range(5):
    t0 = time.monotonic()
    out = trace_rays(ds, cfg, o, d)
    fetch_scalar(out[0])
    ts.append(time.monotonic() - t0 - rtt)
tile_s = min(ts)
print(f"131k-ray tile: {tile_s*1e3:.1f} ms wall (rtt-corrected)")

# op accounting (see PERF.md "Utilization account" for the derivation):
# per serviced ray eval: 5 lights x (9 spheres + 48 bigtris + ~3% of 26x64
# Morton pairs) x ~25 VPU ops/pair + ~400 flat ops of per-light math
n_lights, n_sph, n_bigtri = 5, 9, 48
morton_pairs = 0.03 * 26 * 64
pairs_per_ray = n_lights * (n_sph + n_bigtri + morton_pairs)
ops_per_ray = pairs_per_ray * 25 + n_lights * 400 + 2000  # children+cast share
evals = R + 66 * (R // 64)  # primary + measured ~66 pool iterations at W=R/64
total_ops = evals * ops_per_ray
print(f"~{total_ops/1e9:.2f} G VPU ops/tile (accounting) over {tile_s*1e3:.0f} ms "
      f"=> {total_ops/tile_s/1e12:.3f} Tflop/s achieved")
print(f"utilization vs empirical peak: {total_ops/tile_s/peak*100:.1f}%")
