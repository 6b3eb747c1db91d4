"""Round-3 re-sweep after the rolled/flipped kernels + vectorized gates:
triangle_block / compaction_ratio / kernel_ray_tile on one 131k-ray 1080p
tile, in ONE relay session (cross-session variance is 3-4x). The gate pass
is now vectorized over blocks (cheap per block), so the B=64 optimum from
round 2 may have shifted finer.

Env: SWEEP="B,ratio,chunk,RT;..." overrides the default variant list.
"""
import os, sys, time
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
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.camera import pixel_scene_coords, tile_major_order
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.trace import trace_rays
from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.builder import Scene

W0, H0 = 1920, 1080
R = 131072

VARIANTS = [
    (64, 64, 128, 256),   # current bench defaults (baseline row)
    (32, 64, 128, 256),
    (128, 64, 128, 256),
    (64, 96, 128, 256),
    (64, 128, 128, 256),
    (64, 64, 128, 512),
]
if os.environ.get("SWEEP"):
    VARIANTS = [
        tuple(int(x) for x in v.split(","))
        for v in os.environ["SWEEP"].split(";")
    ]


def make(tri_block, ratio, chunk, rt):
    cfg = RenderConfig(width=W0, height=H0, reflections=True, refractions=True,
                       light_reflections=True,
                       scene_backface_culling=True, weight_cutoff=1e-3,
                       use_pallas=True, max_nodes=48, compaction_ratio=ratio,
                       loop_chunk=chunk, tile_rays=R, triangle_block=tri_block,
                       kernel_ray_tile=rt)
    scene = build("semesterbild", cfg)
    scene = Scene.backface_culling(scene, np.array([0.0, 0.0, 1.0]))
    ds = build_device_scene(scene, cfg)
    return cfg, ds


px, py = np.meshgrid(np.arange(W0), np.arange(H0))
order = tile_major_order(W0, H0)
px, py = px.reshape(-1)[order], py.reshape(-1)[order]
cfg0, _ = make(*VARIANTS[0])
coords = pixel_scene_coords(cfg0, px, py)
dirs = (coords - np.asarray(cfg0.camera.render_ray_focus, np.float32)).astype(np.float32)
sl = slice(4 * R, 5 * R)  # a middle tile
o, d = jnp.asarray(coords[sl]), jnp.asarray(dirs[sl])

ref_out = None
for tri_block, ratio, chunk, rt in VARIANTS:
    cfg, ds = make(tri_block, ratio, chunk, rt)
    t0 = time.monotonic()
    out = trace_rays(ds, cfg, o, d)
    jax.block_until_ready(out)
    float(np.asarray(out[0])[0, 0] if np.asarray(out[0]).ndim > 1 else np.asarray(out[0])[0])
    compile_s = time.monotonic() - t0
    times = []
    for _ in range(5):
        t0 = time.monotonic()
        out = trace_rays(ds, cfg, o, d)
        jax.block_until_ready(out)
        times.append((time.monotonic() - t0) * 1e3)
    c = np.asarray(out[0])
    if ref_out is None:
        ref_out = c
        drift = 0.0
    else:
        drift = float(np.abs(c - ref_out).max())
    print(f"B={tri_block:4d} ratio={ratio:3d} chunk={chunk:3d} RT={rt:4d}: "
          f"{min(times):8.2f} ms (all {['%.1f' % t for t in times]}) "
          f"compile {compile_s:.0f}s max|drift|={drift:.2e}", flush=True)
