"""Microbench: pallas_light_shade alone on the real 1080p primary wavefront.

Isolates the fused lighting kernel (the frame-time leader) so kernel-form
variants can be compared in ~30s cycles instead of full-bench runs."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache")))
import jax.numpy as jnp
import numpy as np
from hslu_i.ba_raytracing.f2501_raytracer_tpu import RenderConfig, build_device_scene
from hslu_i.ba_raytracing.f2501_raytracer_tpu.models import build
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.camera import pixel_scene_coords, tile_major_order
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.intersect import cast_rays
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.vecmath import normalized
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.pallas_kernels import pallas_light_shade
from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.builder import Scene

W0, H0 = 1920, 1080
TB = int(os.environ.get("TB", 512))
cfg = RenderConfig(width=W0, height=H0, reflections=True, refractions=True,
                   scene_backface_culling=True, use_pallas=True, triangle_block=TB)
scene = build("semesterbild", cfg)
scene = Scene.backface_culling(scene, np.array([0.0, 0.0, 1.0]))
ds = build_device_scene(scene, cfg)
print(f"nb={ds.triangle_blocks} B={ds.tri_block} sb={ds.sb_sizes}")

px, py = np.meshgrid(np.arange(W0), np.arange(H0))
order = tile_major_order(W0, H0)
px, py = px.reshape(-1)[order], py.reshape(-1)[order]
coords = pixel_scene_coords(cfg, px, py)
dirs = (coords - np.asarray(cfg.camera.render_ray_focus, np.float32)).astype(np.float32)
R = 131072
sl = slice(4*R, 5*R)
o, d = jnp.asarray(coords[sl]), normalized(jnp.asarray(dirs[sl]))
hit = cast_rays(ds, o, d, use_pallas=True)
jax.block_until_ready(hit.point)

args = (ds.light_pack, ds.sph_pack, ds.tri_woop, ds.tri_nsq, ds.tri_valid_f,
        ds.tri_httr_f, ds.tri_normal3, ds.tri_ior, ds.tri_op, ds.tri_met,
        ds.tri_colr, ds.tri_absn, ds.tri_aabb, ds.tri_saabb,
        hit.point, hit.normal, d, hit.color, hit.shininess,
        hit.valid.astype(jnp.float32))
kw = dict(n_lights=ds.n_lights, eps_dist=float(cfg.camera.epsilon_distance),
          backface_culling=False, block_has_trans=ds.block_has_trans,
          sb_sizes=ds.sb_sizes)

def timeit(name, fn, *a, reps=10, **k):
    out = fn(*a, **k); jax.block_until_ready(out)
    _ = float(np.asarray(out[0]).sum())  # force fetch (relay first-block quirk)
    t0 = time.monotonic()
    for _i in range(reps):
        out = fn(*a, **k)
    jax.block_until_ready(out)
    print(f"{name}: {(time.monotonic()-t0)/reps*1e3:.2f} ms")

RT = int(os.environ.get("RT", 256))
timeit(f"light_shade 131k rt={RT}", pallas_light_shade, *args, ray_tile=RT, **kw)
if os.environ.get("NOAABB") == "1":
    timeit(f"light_shade 131k rt={RT} noaabb", pallas_light_shade, *args,
           ray_tile=RT, use_aabb=False, **kw)
