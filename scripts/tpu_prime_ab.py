"""Same-session A/B: PRIME_GATE (dominant-occluder prime, two-pass shadow
evaluation) on vs off, on the extreme-config 131k mid-frame tile — the
140-cloud-light hq-mesh shading kernel that dominates the extreme frame
(PERF.md "extreme decomposition": ~85% executed pair math at B=256/RT=512).

The prime carries the opaque Morton block that newly saturated the most
lanes in the previous light chunk's scan and runs just that block first
for the next chunk, so umbra lanes drop out of the whole scan via
LANE_GATE instead of only the blocks after the occluder's Morton slot.
Outputs must be bit-identical (tests/test_prime_gate.py proves exactness;
this script re-asserts it at bench shapes and measures the win).

PRIME_GATE is a module flag read at kernel-build time → fresh jax.jit per
variant. At extreme tile shapes the kernel runs ~0.5 s/call, far above the
relay's ~30 ms dispatch floor, so wall best-of-K is a sound meter here
(unlike the 1080p per-kernel numbers — see tpu_shade_ablate.py header).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

# same repo-local persistent cache as bench.py (/tmp is wiped between
# driver rounds; the workspace survives — ADVICE r4)
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
    ),
)
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
      f"L={ds.n_lights}", flush=True)

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
    PK.PRIME_GATE = flag
    f = jax.jit(
        lambda *a: PK.pallas_light_shade.__wrapped__(
            ds.light_pack, ds.sph_pack, ds.trb_pack,
            ds.tri_blk_pack, ds.tri_blk_aabb, *a, **static_kw,
        )
    )
    out = f(*args)
    jax.block_until_ready(out)
    return f, tuple(np.asarray(x) for x in out)


res = {}
_orig_prime = PK.PRIME_GATE  # restore the SHIPPED value, not True (ADVICE r4)
try:
    f_on, out_on = make(True)
    f_off, out_off = make(False)
    for a, b in zip(out_on, out_off):
        np.testing.assert_array_equal(a, b)
    print("outputs bit-identical across PRIME_GATE", flush=True)

    reps = int(os.environ.get("AB_REPS", 5))
    for name, f, flag in (("prime_on", f_on, True), ("prime_off", f_off, False)):
        PK.PRIME_GATE = flag
        ts = []
        for _ in range(reps):
            t0 = time.monotonic()
            jax.block_until_ready(f(*args))
            ts.append((time.monotonic() - t0) * 1e3)
        res[name] = ts
finally:
    PK.PRIME_GATE = _orig_prime

for name, ts in res.items():
    arr = np.array(ts)
    print(f"{name:10s}: min {arr.min():7.1f}  median {np.median(arr):7.1f} "
          f" all {[f'{t:.0f}' for t in ts]}", flush=True)
if res:
    d_ = np.median(res["prime_on"]) - np.median(res["prime_off"])
    print(f"median on-off: {d_:+.1f} ms "
          f"({100*d_/np.median(res['prime_off']):+.1f}%)")
