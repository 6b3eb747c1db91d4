"""Decompose the fused lighting kernel's cost on the 1080p primary wavefront:
time pallas_light_shade with (a) the full scene, (b) no AABB gates, (c) only
the big-primitive block, (d) only the text blocks, (e) full scene with the
big block forced onto the opaque path. Also time the cast+Hit-build glue
(material gathers) vs the raw cast kernel."""
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
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.pallas_kernels import (
    pallas_cast_triangles, pallas_light_shade,
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.vecmath import normalized
from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.builder import Scene

W0, H0, R = 1920, 1080, 131072
cfg = RenderConfig(width=W0, height=H0, reflections=True, refractions=True,
                   light_reflections=True, scene_backface_culling=True,
                   use_pallas=True, tile_rays=R)
scene = build("semesterbild", cfg)
scene = Scene.backface_culling(scene, np.array([0.0, 0.0, 1.0]))
ds = build_device_scene(scene, cfg)
px, py = np.meshgrid(np.arange(W0), np.arange(H0))
order = tile_major_order(W0, H0)
px, py = px.reshape(-1)[order], py.reshape(-1)[order]
coords = pixel_scene_coords(cfg, px, py)
dirs = (coords - np.asarray(cfg.camera.render_ray_focus, np.float32)).astype(np.float32)
sl = slice(4 * R, 5 * R)
o = jnp.asarray(coords[sl])
d = normalized(jnp.asarray(dirs[sl]))
jax.block_until_ready(d)

hit = cast_rays(ds, o, d, True, True)
jax.block_until_ready(hit.point)
eps = float(cfg.camera.epsilon_distance)

point = jnp.where(hit.valid[:, None], hit.point, 1e9)
normal, view = hit.normal, -d
color = hit.color
shin = hit.shininess
validf = hit.valid.astype(jnp.float32)


def timeit(name, fn):
    out = fn(); jax.block_until_ready(out)
    ts = []
    for _ in range(5):
        t0 = time.monotonic(); out = fn(); jax.block_until_ready(out)
        ts.append((time.monotonic() - t0) * 1e3)
    print(f"{name:36s} {min(ts):8.2f} ms  (med {sorted(ts)[2]:.2f})", flush=True)


def light(ds2, use_aabb=True, bht=None):
    return lambda: pallas_light_shade(
        ds2.light_pack, ds2.sph_pack, ds2.trb_pack, ds2.tri_woop, ds2.tri_nsq, ds2.tri_valid_f,
        ds2.tri_httr_f, ds2.tri_normal3, ds2.tri_ior, ds2.tri_op, ds2.tri_met,
        ds2.tri_colr, ds2.tri_absn, ds2.tri_aabb, ds2.tri_saabb,
        point, normal, view, color, shin, validf,
        ds2.n_lights, eps, backface_culling=True, use_aabb=use_aabb,
        block_has_trans=bht if bht is not None else ds2.block_has_trans,
        sb_sizes=ds2.sb_sizes,
    )


import dataclasses
def subset(ds0, blocks, sbs):
    sel = np.array(blocks)
    return dataclasses.replace(
        ds0,
        tri_woop=ds0.tri_woop[sel], tri_nsq=ds0.tri_nsq[sel],
        tri_valid_f=ds0.tri_valid_f[sel], tri_httr_f=ds0.tri_httr_f[sel],
        tri_normal3=ds0.tri_normal3[sel], tri_ior=ds0.tri_ior[sel],
        tri_op=ds0.tri_op[sel], tri_met=ds0.tri_met[sel],
        tri_colr=ds0.tri_colr[sel], tri_absn=ds0.tri_absn[sel],
        tri_aabb=ds0.tri_aabb[sel],
        tri_saabb=ds0.tri_saabb[: len(sbs)],
        block_has_trans=tuple(ds0.block_has_trans[b] for b in sel),
        sb_sizes=sbs,
    )


timeit("full scene (current)", light(ds))
timeit("no AABB gates", light(ds, use_aabb=False))
nbk = ds.triangle_blocks
timeit("full, morton forced opaque", light(ds, bht=(False,) * nbk))

# cast kernel vs cast_rays (kernel + material-gather glue)
def raw_cast():
    return pallas_cast_triangles(
        ds.trb_pack, ds.tri_woop, ds.tri_nsq, ds.tri_valid_f, ds.tri_httr_f, ds.tri_normal3,
        ds.tri_aabb, ds.tri_saabb, o, d, backface_culling=True,
        sb_sizes=ds.sb_sizes,
    )
timeit("raw cast kernel", raw_cast)
full_cast = jax.jit(lambda: cast_rays(ds, o, d, True, True))
timeit("cast_rays (kernel+spheres+gathers)", lambda: full_cast())

# ---- floor analysis: what does an (almost) empty occlusion scan cost? ----
import jax.numpy as jnp2

def empty_scene(ds0):
    z = lambda a: jnp.zeros_like(a)
    return dataclasses.replace(
        ds0,
        sph_pack=z(ds0.sph_pack),
        trb_pack=z(ds0.trb_pack),
        tri_woop=ds0.tri_woop[:1], tri_nsq=ds0.tri_nsq[:1],
        tri_valid_f=z(ds0.tri_valid_f[:1]), tri_httr_f=ds0.tri_httr_f[:1] * 0,
        tri_normal3=ds0.tri_normal3[:1], tri_ior=ds0.tri_ior[:1],
        tri_op=ds0.tri_op[:1], tri_met=ds0.tri_met[:1],
        tri_colr=ds0.tri_colr[:1], tri_absn=ds0.tri_absn[:1],
        tri_aabb=jnp.tile(jnp.float32([1e8,1e8,1e8,-1e8,-1e8,-1e8,0,0]), (1,1)),
        tri_saabb=jnp.tile(jnp.float32([1e8,1e8,1e8,-1e8,-1e8,-1e8,0,0]), (1,1)),
        block_has_trans=(False,), sb_sizes=(1,),
    )

es = empty_scene(ds)
timeit("empty scene (floor)", light(es))

def nl(ds0, n):
    return dataclasses.replace(ds0, n_lights=n)
timeit("full, 1 light", light(nl(ds, 1)))
timeit("full, 2 lights", light(nl(ds, 2)))
timeit("empty, 1 light", light(nl(es, 1)))
