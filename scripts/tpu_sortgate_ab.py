"""Same-session A/B: SORT_GATE (distance-sorted opaque block order) on vs
off, on the extreme-config 131k mid-frame tile — the 140-cloud-light
hq-mesh shading kernel that dominates the extreme frame (~85% executed
pair math at B=256/RT=512, PERF.md "extreme decomposition").

Unlike the (negative, default-off) PRIME_GATE two-pass idea, the sort is
STATIC: a per-light-chunk SMEM order table computed once from block-AABB
centers, zero per-call selection work — the block loop just reads its
iteration index through the table. Blocks near the light subtend a large
solid angle, so early blocks saturate many lanes' opacity and LANE_GATE
drops them from the rest of the scan. Outputs are bit-identical
(tests/test_sort_gate.py proves exactness; re-asserted here at bench
shapes).

At extreme tile shapes the kernel runs ~0.5 s/call, far above the relay's
~30 ms dispatch floor, so wall best-of-K is a sound meter (see
tpu_prime_ab.py header).
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

RT = int(os.environ.get("RT", 512))
TB = int(os.environ.get("TB", 256))
R = 131072

if os.environ.get("AB_CONFIG", "extreme") == "realistic":
    cfg = RenderConfig(
        width=1920, height=1080, scene_backface_culling=True, use_pallas=True,
        reflections=True, refractions=True, light_reflections=True,
        triangle_block=int(os.environ.get("TB", 64)), kernel_ray_tile=RT,
    )
else:
    cfg = RenderConfig(
        width=1620, height=1350, scene_backface_culling=True, use_pallas=True,
        reflections=True, refractions=True, light_reflections=True,
        anti_aliasing_rotation_scale=True, anti_aliasing_randomness=True,
        extreme_quality=True, high_quality_model=True,
        triangle_block=TB, kernel_ray_tile=RT,
    )
scene = build("semesterbild", cfg)
scene = Scene.backface_culling(scene, np.array([0.0, 0.0, 1.0]))
ds = build_device_scene(scene, cfg)
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
static_kw = dict(
    n_lights=ds.n_lights, eps_dist=float(cfg.camera.epsilon_distance),
    n_trans_blocks=ds.n_trans_blocks,
    backface_culling=cfg.backface_culling, ray_tile=RT,
    bigtri_trans_rows=ds.bigtri_trans_rows,
)


def make(flag: bool):
    PK.SORT_GATE = flag
    f = jax.jit(
        lambda *a: PK.pallas_light_shade.__wrapped__(
            ds.light_pack, ds.sph_pack, ds.trb_pack,
            ds.tri_blk_pack, ds.tri_blk_aabb, *a, **static_kw,
        )
    )
    out = f(*args)
    jax.block_until_ready(out)
    float(np.asarray(out[0])[0, 0])  # completion fetch
    return f, tuple(np.asarray(x) for x in out)


res = {}
_orig = PK.SORT_GATE
try:
    f_on, out_on = make(True)
    f_off, out_off = make(False)
    for a, b in zip(out_on, out_off):
        np.testing.assert_array_equal(a, b)
    print("outputs bit-identical across SORT_GATE", flush=True)

    reps = int(os.environ.get("AB_REPS", 5))
    for r in range(reps):  # interleaved rounds
        for name, f, flag in (("sort_on", f_on, True), ("sort_off", f_off, False)):
            PK.SORT_GATE = flag
            t0 = time.monotonic()
            jax.block_until_ready(f(*args))
            res.setdefault(name, []).append((time.monotonic() - t0) * 1e3)
finally:
    PK.SORT_GATE = _orig

for name, ts in res.items():
    arr = np.array(ts)
    print(f"{name:10s}: min {arr.min():7.1f}  median {np.median(arr):7.1f} "
          f" all {[f'{t:.0f}' for t in ts]}", flush=True)
if res:
    d_ = np.array(res["sort_on"]) - np.array(res["sort_off"])
    print(f"paired on-off (ms): {[f'{x:+.0f}' for x in d_]}  "
          f"median {np.median(d_):+.1f}", flush=True)
