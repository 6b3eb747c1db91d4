"""Ad-hoc TPU profiling of the hot ops: cast, occlude, full trace."""

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
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.camera import pixel_scene_coords
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.intersect import cast_rays, occlude_rays
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.trace import trace_rays
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.vecmath import normalized
from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.builder import Scene


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.monotonic() - t0)
    print(f"{name}: {best*1e3:.2f} ms")
    return out


def main():
    W, H = 240, 135
    cfg = RenderConfig(
        width=W, height=H, reflections=True, refractions=True,
        scene_backface_culling=True, tile_rays=65536, max_nodes=48,
        weight_cutoff=1e-3, use_pallas=True,
    )
    scene = build("semesterbild", cfg)
    scene = Scene.backface_culling(scene, np.array([0.0, 0.0, 1.0]))
    ds = build_device_scene(scene, cfg)
    print("tris:", ds.n_triangles, "blocks:", ds.triangle_blocks, "lights:", ds.light_pos.shape[0])

    px, py = np.meshgrid(np.arange(W), np.arange(H))
    coords = pixel_scene_coords(cfg, px.reshape(-1), py.reshape(-1))
    dirs = (coords - np.asarray(cfg.camera.render_ray_focus, np.float32)).astype(np.float32)
    R = 31744
    o = jnp.asarray(coords[:R])
    d = normalized(jnp.asarray(dirs[:R]))

    hit = timeit("cast_rays 32k", cast_rays, ds, o, d, False, True)
    md = jnp.full((R,), 2.0)
    timeit("occlude_rays 32k", occlude_rays, ds, o, d, md, False, True)

    for mn in (0, 1, 2, 4, 16, 48):
        c = RenderConfig(**{**cfg.__dict__, "max_nodes": mn})
        timeit(f"trace max_nodes={mn}", trace_rays, ds, c, o, jnp.asarray(dirs[:R]), reps=2)


if __name__ == "__main__":
    main()
