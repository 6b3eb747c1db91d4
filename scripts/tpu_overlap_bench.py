"""Overlapped fetch vs single-program frame (same relay session).

The 1080p u32 frame = device compute (~540 ms in a good epoch) + a 8.3 MB
host fetch that today starts only after the WHOLE lax.map program finishes.
Splitting the frame into G programs and dispatching them all before
fetching in order lets group g's fetch ride while g+1 computes — wall
should drop toward device_total + fetch(one group) + dispatch overheads.

Variants (one process, same session): single-program, then G in {2,4,8,16,32}.
Also times an empty-ish dispatch round trip to bound per-program overhead.
"""
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
    plan_frame,
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.builder import Scene

W0, H0 = (int(v) for v in os.environ.get("OVERLAP_RES", "1920x1080").split("x"))
REPEATS = int(os.environ.get("OVERLAP_REPEATS", 4))

TILES = [int(v) for v in os.environ.get("OVERLAP_TILES", "131072").split(",")]
RT = int(os.environ.get("OVERLAP_RAY_TILE", "512"))


def make(tile_rays):
    cfg = RenderConfig(
        width=W0, height=H0, scene_backface_culling=True,
        reflections=True, light_reflections=True, refractions=True,
        tile_rays=tile_rays, max_nodes=48, weight_cutoff=1e-3,
        compaction_ratio=64, loop_chunk=128, use_pallas=True,
        triangle_block=64 if W0 * H0 >= 10**6 else 512,
        kernel_ray_tile=RT,
        device_encode=True, dedupe_aa=True,
    )
    scene = build("semesterbild", cfg)
    scene = Scene.backface_culling(scene, np.array([0.0, 0.0, 1.0]))
    ds = build_device_scene(scene, cfg)
    plan = plan_frame(cfg)
    o_np, d_np = build_frame_rays(cfg, plan)
    return cfg, ds, jnp.asarray(o_np), jnp.asarray(d_np), jnp.asarray(plan.weights)


cfg, ds, o_t, d_t, w_dev = make(TILES[0])
n_tiles = o_t.shape[0]
print(f"{W0}x{H0}: {n_tiles} tiles of {o_t.shape[1]} rays (RT={RT})", flush=True)

# tiny dispatch round-trip cost
tin = jnp.zeros((8, 128), jnp.float32)
tiny = jax.jit(lambda x: x + 1.0)
np.asarray(tiny(tin))
t0 = time.monotonic()
for _ in range(10):
    np.asarray(tiny(tin))
print(f"tiny dispatch+fetch round trip: {(time.monotonic()-t0)*100:.1f} ms each",
      flush=True)


def run(label, fn):
    out = fn()  # compile
    del out
    ts = []
    for _ in range(REPEATS):
        t0 = time.monotonic()
        fn()
        ts.append((time.monotonic() - t0) * 1e3)
    print(f"{label:24s}: {min(ts):8.1f} ms (all {[f'{t:.0f}' for t in ts]})",
          flush=True)
    return min(ts)


for tile_rays in TILES:
    cfg, ds, o_t, d_t, w_dev = make(tile_rays)
    n_tiles = o_t.shape[0]
    print(f"-- tile_rays={tile_rays}: {n_tiles} tiles --", flush=True)

    def single(cfg=cfg, ds=ds, o_t=o_t, d_t=d_t, w_dev=w_dev):
        return np.asarray(trace_rays_tiled_u32(ds, cfg, o_t, d_t, w_dev)[0])

    run(f"T={tile_rays} single", single)

    for G in (2, 4, 8, 16, 32):
        if n_tiles % G or n_tiles < G:
            continue
        per = n_tiles // G

        def grouped(per=per, G=G, cfg=cfg, ds=ds, o_t=o_t, d_t=d_t, w_dev=w_dev):
            outs = [
                trace_rays_tiled_u32(
                    ds, cfg, o_t[g * per : (g + 1) * per],
                    d_t[g * per : (g + 1) * per], w_dev,
                )
                for g in range(G)
            ]  # all dispatched before any fetch
            return np.concatenate([np.asarray(o) for o, _dr in outs])

        run(f"T={tile_rays} G={G} overlapped", grouped)

    # tapered schedules: the exposed wall tail is the LAST group's fetch
    # (~13 ms/tile through the relay), so shrink late groups; early groups
    # can be bigger since their fetches hide under more remaining compute.
    # OVERLAP_TAPER="3,3,2,2,2,2,1,1;2,2,2,2,2,2,2,1,1" (sizes must sum to
    # n_tiles; each distinct size compiles once, cache-amortized)
    for spec in [t for t in os.environ.get("OVERLAP_TAPER", "").split(";") if t]:
        sizes = [int(v) for v in spec.split(",")]
        if sum(sizes) != n_tiles:
            print(f"taper {spec}: sizes sum {sum(sizes)} != {n_tiles}, skip",
                  flush=True)
            continue

        def tapered(sizes=sizes, cfg=cfg, ds=ds, o_t=o_t, d_t=d_t, w_dev=w_dev):
            outs, gs = [], 0
            for sz in sizes:
                outs.append(
                    trace_rays_tiled_u32(
                        ds, cfg, o_t[gs : gs + sz], d_t[gs : gs + sz], w_dev
                    )
                )
                gs += sz
            return np.concatenate([np.asarray(o) for o, _dr in outs])

        run(f"T={tile_rays} taper {spec}", tapered)

        def tapered_async(sizes=sizes, cfg=cfg, ds=ds, o_t=o_t, d_t=d_t,
                          w_dev=w_dev):
            # queue every D2H up front (copy_to_host_async) so the relay can
            # stream results as groups finish, instead of paying one blocking
            # round trip per group in the fetch loop
            outs, gs = [], 0
            for sz in sizes:
                outs.append(
                    trace_rays_tiled_u32(
                        ds, cfg, o_t[gs : gs + sz], d_t[gs : gs + sz], w_dev
                    )
                )
                gs += sz
            for o, _dr in outs:
                o.copy_to_host_async()
            return np.concatenate([np.asarray(o) for o, _dr in outs])

        run(f"T={tile_rays} taper+async {spec}", tapered_async)
