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
from functools import partial
from hslu_i.ba_raytracing.f2501_raytracer_tpu import RenderConfig, build_device_scene
from hslu_i.ba_raytracing.f2501_raytracer_tpu.models import build
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops import trace as T
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.vecmath import normalized
from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.builder import Scene

def timeit(name, fn, *args, reps=4):
    out = fn(*args); jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.monotonic(); out = fn(*args); jax.block_until_ready(out)
        best = min(best, time.monotonic() - t0)
    print(f"{name}: {best*1e3:.2f} ms", flush=True)

W0, H0 = 240, 135
cfg = RenderConfig(width=W0, height=H0, reflections=True, refractions=True,
                   scene_backface_culling=True, max_nodes=48, weight_cutoff=1e-3, use_pallas=True)
scene = build("semesterbild", cfg)
scene = Scene.backface_culling(scene, np.array([0.0, 0.0, 1.0]))
ds = build_device_scene(scene, cfg)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.camera import pixel_scene_coords
px, py = np.meshgrid(np.arange(W0), np.arange(H0))
coords = pixel_scene_coords(cfg, px.reshape(-1), py.reshape(-1))
dirs = (coords - np.asarray(cfg.camera.render_ray_focus, np.float32)).astype(np.float32)
R = 31744
o = jnp.asarray(coords[:R]); d = jnp.asarray(dirs[:R])

@jax.jit
def trace_fori(o_, d_):
    eps = jnp.float32(cfg.camera.epsilon_distance)
    d0 = normalized(d_)
    contrib, top_valid, rp, fp = T._eval_node(ds, cfg, eps, o_, d0,
        jnp.full((R,), T.AIR), jnp.ones((R,3)), jnp.full((R,),-1,jnp.int32),
        jnp.zeros((R,),bool), jnp.ones((R,),bool))
    K = cfg.stack_size
    s = dict(sp=jnp.zeros((R,), jnp.int32),
             st_o=jnp.zeros((K,R,3)), st_d=jnp.zeros((K,R,3)), st_w=jnp.zeros((K,R,3)),
             st_ior=jnp.ones((K,R)), st_budget=jnp.zeros((K,R),jnp.int32),
             st_refl=jnp.zeros((K,R),bool), accum=contrib, it=jnp.int32(0))
    s = T._push(s, fp); s = T._push(s, rp)
    Wc = 7936
    body = partial(T._body_compacted, ds, cfg, jnp.float32(cfg.camera.epsilon_distance), Wc)
    s = jax.lax.fori_loop(0, 17, lambda i, st: body(st), s)
    return s["accum"], top_valid

timeit("trace FORI 17 iters", trace_fori, o, d)
timeit("trace WHILE (prod)", partial(T.trace_rays.__wrapped__, ds, cfg), o, d)
