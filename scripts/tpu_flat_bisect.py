"""Bisect the flat per-light shading math inside `_light_sums` (round 3).

The cond-isolation ablation (tpu_shade_ablate.py) pinned ~80% of the light
kernel in the FLAT per-(light, ray) shading math (29.4 of 36.5 ms/tile at
RT=256), far above an op-count roofline (~2-5 us/instance vs 57.5
measured). This script compiles VARIANTS of pallas_kernels.py with pieces
of `chunk_sums` textually replaced (fresh module exec per variant — no
product code is touched), all in ONE relay session:

  full       — unmodified source
  no_spec    — specular term zeroed (removes pow + reflect chain)
  no_att     — tanh attenuation sigmoid replaced by 1.0
  no_coldiv  — per-channel color-filter divisions replaced by plain colors
  no_inv     — slab-gate reciprocals (1/ldx..) replaced by ldx..
  no_norm    — light direction left unnormalized (removes sqrt + 3 divs)
  flat_min   — all of the above

Each variant still runs the REAL Morton scan + sphere/bigtri occlusion, so
shares are of the full kernel.
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
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops import pallas_kernels as PK
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.intersect import cast_rays
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.vecmath import normalized
from hslu_i.ba_raytracing.f2501_raytracer_tpu.renderer import (
    build_frame_rays,
    plan_frame,
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.builder import Scene

W0, H0 = 1920, 1080
RT = int(os.environ.get("RT", 256))
R = 131072

cfg = RenderConfig(
    width=W0, height=H0, reflections=True, refractions=True,
    light_reflections=True, scene_backface_culling=True, use_pallas=True,
    triangle_block=64, kernel_ray_tile=RT,
)
scene = build("semesterbild", cfg)
scene = Scene.backface_culling(scene, np.array([0.0, 0.0, 1.0]))
ds = build_device_scene(scene, cfg)
plan = plan_frame(cfg)
o_np, d_np = build_frame_rays(cfg, plan)
o = jnp.asarray(o_np.reshape(-1, 3)[4 * R : 5 * R])
d = normalized(jnp.asarray(d_np.reshape(-1, 3)[4 * R : 5 * R]))
hit = cast_rays(ds, o, d, cfg.backface_culling, True)
jax.block_until_ready(hit.point)
print(f"wavefront: {R} rays, {float(jnp.mean(hit.valid))*100:.1f}% hit; RT={RT}",
      flush=True)

view = d
args = (hit.point, hit.normal, view, hit.color, hit.shininess,
        hit.valid.astype(jnp.float32))
static_kw = dict(
    n_lights=ds.n_lights, eps_dist=float(cfg.camera.epsilon_distance),
    n_trans_blocks=ds.n_trans_blocks,
    backface_culling=cfg.backface_culling, ray_tile=RT,
    bigtri_trans_rows=ds.bigtri_trans_rows,
)

SRC_PATH = os.path.join(os.path.dirname(PK.__file__), "pallas_kernels.py")
SRC = open(SRC_PATH).read()

# (marker that must exist, replacement) pairs per cut
CUTS = {
    "no_spec": [(
        "spec_f = jnp.where(has_spec[None, :], spec_dot ** spec_exp[None, :], 0.0)",
        "spec_f = jnp.zeros_like(spec_dot)",
    )],
    "no_att": [(
        "att_sig = (jnp.tanh(att) + 1.0) / 2.0",
        "att_sig = jnp.ones_like(att)",
    )],
    "no_coldiv": [(
        "lcsr = jnp.where(can_reach, ccr / (1.0 - fr), ccr)",
        "lcsr = ccr",
    ), (
        "lcsg = jnp.where(can_reach, ccg / (1.0 - fg), ccg)",
        "lcsg = ccg",
    ), (
        "lcsb = jnp.where(can_reach, ccb / (1.0 - fb), ccb)",
        "lcsb = ccb",
    )],
    "no_inv": [(
        "invx, invy, invz = 1.0 / ldx, 1.0 / ldy, 1.0 / ldz",
        "invx, invy, invz = ldx, ldy, ldz",
    )],
    "no_norm": [(
        "lt = jnp.sqrt(lt2)\n        inv_lt = 1.0 / lt",
        "lt = lt2\n        inv_lt = jnp.ones_like(lt)",
    )],
}
CUTS["flat_min"] = [p for cuts in CUTS.values() for p in cuts]

# section cuts: spans replaced wholesale ("SPAN", start_marker, end_marker,
# replacement) — the span [start, end_of(end_marker)) is replaced
POST_START = "combined_opacity = jnp.clip(1.0 - dec, 0.0, 1.0)"
POST_END = "spb = jnp.sum(jnp.where(ms, lcb * sf, 0.0), axis=0)"
PRE_START = "ltpx, ltpy, ltpz = lpx - ptx[None, :]"
PRE_END = "el = eps_dist * inv_lt"
CUTS["no_post"] = [(
    "SPAN", POST_START, POST_END,
    "dr = jnp.sum(dec + opq + fr + ci + lcr, axis=0)\n"
    "        dg = dr; db = dr; spr = dr; spg = dr; spb = dr",
)]
CUTS["no_pre"] = [(
    "SPAN", PRE_START, PRE_END,
    "lt = light_distance = jnp.broadcast_to(ptx[None, :] + lpx, (C, ptx.shape[0]))\n"
    "        inv_lt = lt; ldx = ldy = ldz = lt\n"
    "        sox = soy = soz = lt; dex = dey = dez = lt\n"
    "        cos_in = lt; angle_pos = lt > 0.0\n"
    "        en = (l0 + jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)) < n_lights\n"
    "        occl_lane = valid[None, :] & angle_pos & en\n"
    "        maxd = jnp.where(occl_lane, lt, 0.0)\n"
    "        invx = invy = invz = lt\n"
    "        maxdp = maxd; epsT = lt; epsD = lt; el = lt",
)]
VARIANTS = {"full": []} | {k: v for k, v in CUTS.items()}

only = [v for v in os.environ.get("VARIANTS", "").split(",") if v]
if only:
    VARIANTS = {k: v for k, v in VARIANTS.items() if k in only}

results = {}
for name, pairs in VARIANTS.items():
    src = SRC
    for pair in pairs:
        if pair[0] == "SPAN":
            _, start, end, new = pair
            i0 = src.index(start)
            i1 = src.index(end) + len(end)
            src = src[:i0] + new + src[i1:]
        else:
            old, new = pair
            assert old in src, (name, old[:60])
            src = src.replace(old, new)
    mod = {
        "__name__": f"{PK.__package__}.pk_{name}",
        "__package__": PK.__package__,
        "__file__": SRC_PATH,
    }
    exec(compile(src, SRC_PATH, "exec"), mod)
    entry = mod["pallas_light_shade"].__wrapped__
    f = jax.jit(
        lambda *a, entry=entry: entry(
            ds.light_pack, ds.sph_pack, ds.trb_pack,
            ds.tri_blk_pack, ds.tri_blk_aabb,
            *a, **static_kw,
        )
    )
    try:
        t0 = time.monotonic()
        out = f(*args)
        jax.block_until_ready(out)
        np.asarray(out[0])[0, 0]
        comp = time.monotonic() - t0
    except Exception as e:
        print(f"{name:10s}: FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}", flush=True)
        continue
    ts = []
    for _ in range(6):
        t0 = time.monotonic()
        out = f(*args)
        jax.block_until_ready(out)
        ts.append((time.monotonic() - t0) * 1e3)
    ms = min(ts)
    results[name] = ms
    print(f"{name:10s}: {ms:8.2f} ms/tile-kernel "
          f"({ms * 1e3 / (R // RT):6.1f} us/instance) compile {comp:.0f}s "
          f"checksum {float(jnp.sum(out[0])):.4g}", flush=True)

full = results.get("full")
if full:
    print("\nshares of full:")
    for k, v in results.items():
        print(f"  {k:10s}: {v:8.2f} ms  ({(full - v) / full * 100:+5.1f}% removed)")
