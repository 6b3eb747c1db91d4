"""Same-session A/B of the shadow-pack block ORDER on the extreme-config
light kernel (device events).

shadow_order="light" (RenderConfig) scans blocks NEAREST the lights
first within each trans/opaque section: every shadow segment converges at
its light, so near-light geometry is crossed (and opaquely hit) by the
most (ray, light) pairs — hitting it early saturates per-lane opacity
sooner, and the LANE_GATE evolving gate then skips later blocks. Order is
semantically free (shadow accumulation is a sum/max over blocks; the f32
sum order changes, so outputs are allclose, not bit-identical — the delta
is printed).

Both DeviceScenes share one compiled kernel (same shapes), so the A/B is
pure data. PROF=1 uses device events (the only reliable meter through the
relay); otherwise min-of-6 wall.
"""
import glob
import gzip
import json as _json
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

W0, H0 = 1620, 1350
RT = int(os.environ.get("RT", 512))
R = 131072
FEATS = dict(
    reflections=True, refractions=True, light_reflections=True,
    anti_aliasing_rotation_scale=True, anti_aliasing_randomness=True,
    extreme_quality=True, high_quality_model=True,
)
if os.environ.get("AB_CONFIG") == "realistic":
    W0, H0 = 1920, 1080
    FEATS = dict(reflections=True, refractions=True, light_reflections=True)

cfg = RenderConfig(
    width=W0, height=H0, scene_backface_culling=True, use_pallas=True,
    triangle_block=int(os.environ.get("TB", 256)), kernel_ray_tile=RT,
    **FEATS,
)
scene = build("semesterbild", cfg)
scene = Scene.backface_culling(scene, np.array([0.0, 0.0, 1.0]))

import dataclasses

dss = {}
for order in ("camera", "light"):
    dss[order] = build_device_scene(
        scene, dataclasses.replace(cfg, shadow_order=order)
    )
ds = dss["camera"]

plan = plan_frame(cfg)
o_np, d_np = build_frame_rays(cfg, plan)
flat_o = o_np.reshape(-1, 3)
mid = max(0, flat_o.shape[0] // 2 - R // 2)
o = jnp.asarray(flat_o[mid : mid + R])
d = normalized(jnp.asarray(d_np.reshape(-1, 3)[mid : mid + R]))
hit = cast_rays(ds, o, d, cfg.backface_culling, True)
jax.block_until_ready(hit.point)
print(f"wavefront: {R} rays, {float(jnp.mean(hit.valid))*100:.1f}% hit; "
      f"nb={ds.tri_woop.shape[0]} B={ds.tri_woop.shape[2]} RT={RT} "
      f"L={ds.n_lights} trans_blocks={ds.n_trans_blocks}", flush=True)

view = d
args = (hit.point, hit.normal, view, hit.color, hit.shininess,
        hit.valid.astype(jnp.float32))
kw = dict(
    n_lights=ds.n_lights, eps_dist=float(cfg.camera.epsilon_distance),
    n_trans_blocks=ds.n_trans_blocks,
    backface_culling=cfg.backface_culling, ray_tile=RT,
    bigtri_trans_rows=ds.bigtri_trans_rows,
)


def light_shade(dsx):
    return jax.jit(
        lambda *a: PK.pallas_light_shade.__wrapped__(
            dsx.light_pack, dsx.sph_pack, dsx.trb_pack,
            dsx.tri_blk_pack, dsx.tri_blk_aabb, *a, **kw,
        )
    )


def device_ms(f, *a):
    pdir = "/tmp/jaxprof_order"
    os.system(f"rm -rf {pdir}")
    with jax.profiler.trace(pdir):
        out = f(*a)
        jax.block_until_ready(out)
        np.asarray(out[0])[0, 0]
    tr = sorted(glob.glob(f"{pdir}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(tr) as fh:
        data = _json.load(fh)
    us = 0.0
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e and "pallas" in e.get("name", ""):
            us += e["dur"]
    return us / 1e3

# default wall timing: the extreme kernel is ~0.5-0.6 s device, far above
# the ~30 ms relay dispatch floor, so min-of-N wall is a valid meter here;
# PROF=1 device events are flaky through the relay (captures can be empty)
PROF = os.environ.get("PROF", "0") == "1"
fs = {name: light_shade(dsx) for name, dsx in dss.items()}
outs = {}
for name, f in fs.items():
    t0 = time.monotonic()
    outs[name] = f(*args)
    jax.block_until_ready(outs[name])
    np.asarray(outs[name][0])[0, 0]
    print(f"{name}: compile+first {time.monotonic()-t0:.1f}s", flush=True)

da = np.asarray(outs["camera"][0]) - np.asarray(outs["light"][0])
print(f"direct-sum delta: max|d| {np.abs(da).max():.3e} "
      f"(f32 sum-order noise expected)", flush=True)

rounds = int(os.environ.get("AB_ROUNDS", 4))
res = {k: [] for k in fs}
for r in range(rounds):
    for name, f in fs.items():
        if PROF:
            v = 0.0
            for _ in range(4):
                v = device_ms(f, *args)
                if v > 0.0:
                    break
            res[name].append(v)
        else:
            t0 = time.monotonic()
            out = f(*args)
            jax.block_until_ready(out)
            np.asarray(out[0])[0, 0]
            res[name].append((time.monotonic() - t0) * 1e3)
for name, ts in res.items():
    arr = np.array([t for t in ts if t > 0])
    if len(arr):
        print(f"{name:8s}: min {arr.min():8.1f}  median {np.median(arr):8.1f}"
              f"  all {[f'{t:.0f}' for t in ts]}", flush=True)
    else:
        print(f"{name:8s}: NO NONZERO SAMPLES (profiler captured nothing — "
              f"re-run with PROF=0)", flush=True)
d = np.array(res["light"]) - np.array(res["camera"])
if np.all(np.array(res["camera"]) > 0) and np.all(np.array(res["light"]) > 0):
    print(f"paired light-camera (ms): {[f'{x:+.0f}' for x in d]}  "
          f"median {np.median(d):+.1f}", flush=True)
