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
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.camera import pixel_scene_coords
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.intersect import cast_rays
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.pallas_kernels import pallas_light_shade
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.vecmath import normalized
from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.builder import Scene

def timeit(name, fn, *args, reps=5, **kw):
    out = fn(*args, **kw); jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.monotonic(); out = fn(*args, **kw); jax.block_until_ready(out)
        best = min(best, time.monotonic() - t0)
    print(f"{name}: {best*1e3:.2f} ms", flush=True)

W0, H0 = 1920, 1080
cfg = RenderConfig(width=W0, height=H0, scene_backface_culling=True, use_pallas=True)
scene = build("semesterbild", cfg)
scene = Scene.backface_culling(scene, np.array([0.0, 0.0, 1.0]))
ds = build_device_scene(scene, cfg)
px, py = np.meshgrid(np.arange(W0), np.arange(H0))
coords = pixel_scene_coords(cfg, px.reshape(-1), py.reshape(-1))
dirs = (coords - np.asarray(cfg.camera.render_ray_focus, np.float32)).astype(np.float32)
R = 131072
sl = slice(4*R, 5*R)
o, d = jnp.asarray(coords[sl]), normalized(jnp.asarray(dirs[sl]))
hit = cast_rays(ds, o, d, False, True)
args = (ds.light_pack, ds.sph_pack, ds.tri_woop, ds.tri_nsq, ds.tri_valid_f,
        ds.tri_httr_f, ds.tri_normal3, ds.tri_ior, ds.tri_op, ds.tri_met,
        ds.tri_colr, ds.tri_absn, ds.tri_aabb,
        hit.point, hit.normal, d, hit.color, hit.metallic[:, None],
        hit.shininess[:, None], hit.valid.astype(jnp.float32)[:, None])
for rt in (256, 128, 64):
    timeit(f"light_shade rt={rt}", pallas_light_shade, *args,
           n_lights=ds.n_lights, eps_dist=float(cfg.camera.epsilon_distance),
           ray_tile=rt, block_has_trans=ds.block_has_trans)
