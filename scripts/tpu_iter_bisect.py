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
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.camera import pixel_scene_coords
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops import trace as T
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.intersect import cast_rays
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.shading import calculate_lighting
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.vecmath import normalized
from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.builder import Scene

def timeit(name, fn, *args, reps=5):
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
px, py = np.meshgrid(np.arange(W0), np.arange(H0))
coords = pixel_scene_coords(cfg, px.reshape(-1), py.reshape(-1))
dirs = (coords - np.asarray(cfg.camera.render_ray_focus, np.float32)).astype(np.float32)
R = 31744
o = jnp.asarray(coords[:R]); dn = normalized(jnp.asarray(dirs[:R]))
W = 7936  # R//4 rounded to 256
ow, dw = o[:W], dn[:W]
eps = jnp.float32(cfg.camera.epsilon_distance)

# A: 17 x eval_node only (no stack machinery)
@jax.jit
def eval17(o_, d_):
    def body(i, acc):
        c, hv, rp, fp = T._eval_node(ds, cfg, eps, o_ + acc[:1, :1]*0, d_,
            jnp.full((W,), T.AIR), jnp.ones((W,3)), jnp.full((W,),-1,jnp.int32),
            jnp.zeros((W,),bool), jnp.ones((W,),bool))
        return acc + c
    return jax.lax.fori_loop(0, 17, body, jnp.zeros((W,3)))
timeit("17x eval_node(W=7936)", eval17, ow, dw)

# B: 17 x lighting only (cast once)
@jax.jit
def light17(o_, d_):
    hit = cast_rays(ds, o_, d_, False, True)
    def body(i, acc):
        dct, sp = calculate_lighting(ds, cfg, hit, d_, eps)
        return acc + dct + sp
    return jax.lax.fori_loop(0, 17, body, jnp.zeros((W,3)))
timeit("17x lighting(W=7936)", light17, ow, dw)

# C: 17 x stack machinery only (pop/push with dummy entries)
@jax.jit
def mach17(o_, d_):
    K = cfg.stack_size
    s = dict(sp=jnp.ones((R,), jnp.int32),
             st_o=jnp.zeros((K,R,3)), st_d=jnp.zeros((K,R,3)), st_w=jnp.ones((K,R,3)),
             st_ior=jnp.ones((K,R)), st_budget=jnp.full((K,R),5,jnp.int32),
             st_refl=jnp.zeros((K,R),bool), accum=jnp.zeros((R,3)), it=jnp.int32(0))
    def body(i, s):
        active_all = s["sp"] > 0
        act_rank = jnp.cumsum(active_all.astype(jnp.int32)) - 1
        n_active = act_rank[-1] + 1
        inact_rank = jnp.cumsum((~active_all).astype(jnp.int32)) - 1
        pos = jnp.where(active_all, act_rank, n_active + inact_rank)
        perm = jnp.zeros((R,), jnp.int32).at[pos].set(jnp.arange(R, dtype=jnp.int32))
        sel = perm[:W]
        sel_active = jnp.take(active_all, sel)
        sp_sel = jnp.take(s["sp"], sel)
        slot = jnp.maximum(sp_sel-1, 0)
        e_o = s["st_o"][slot, sel]
        s = dict(s)
        s["sp"] = s["sp"].at[sel].add(-sel_active.astype(jnp.int32))
        s["accum"] = s["accum"].at[sel].add(e_o)
        # push back one entry
        sp2 = jnp.take(s["sp"], sel)
        mask = sel_active & (sp2 < K)
        ws = jnp.minimum(sp2, K-1)
        s["st_o"] = s["st_o"].at[ws, sel].set(jnp.where(mask[:,None], e_o, s["st_o"][ws, sel]))
        s["sp"] = s["sp"].at[sel].add(mask.astype(jnp.int32))
        return s
    s = jax.lax.fori_loop(0, 17, body, s)
    return s["accum"]
timeit("17x stack machinery", mach17, o, dn)
