"""Ablation of the fused light/shadow kernel at bench shapes (round 3).

Context: utilization account (PERF.md) shows the kernels achieve <1% of
the empirical 63 Tflop/s VPU peak, and the CPU gate diagnostic
(scripts/gate_stats.py) shows only ~3% of (light, block) Morton pairs
execute — so Morton pair MATH is small and the time must sit in fixed
per-instance work. This script times `pallas_light_shade` (the shading
core shared with shade_eval) with pieces disabled one at a time, in ONE
relay session, on a REAL primary-hit wavefront:

  full        — unmodified kernel
  no_morton   — Morton-block scan removed (gates + pair math)
  gates_only  — Morton gates/conds kept, pair math removed
  no_gates    — pair math for ALL blocks, no gates/conds (use_aabb=False)
  no_bigsph   — sphere + big-triangle shadow scans removed
  flat_only   — no_morton + no_bigsph: per-light flat shading math only

Each variant monkeypatches module internals and wraps the unjitted entry
in a FRESH jax.jit (the public entry's jit cache would otherwise reuse the
unpatched trace).

PROF=1: report DEVICE time from the jax profiler (sum of pallas custom-call
event durations) instead of wall clock. Wall-clock single-call timing
measures the relay's per-dispatch floor (~30 ms/call in some epochs —
verified by a trivial 16-op kernel timing identical to the full one,
scripts/tpu_op_calib.py); device events are the only reliable meter for
kernel work.
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

W0, H0 = 1920, 1080
RT = int(os.environ.get("RT", 256))
R = 131072

# ABLATE_CONFIG=extreme: decompose the 140-cloud-light hq-mesh kernel
# (nb=228 Morton blocks) instead of the 5-light realistic one — the gate
# pass scales with lights x blocks, so its share differs by ~250x
FEATS = dict(reflections=True, refractions=True, light_reflections=True)
if os.environ.get("ABLATE_CONFIG") == "extreme":
    W0, H0 = 1620, 1350
    FEATS.update(
        anti_aliasing_rotation_scale=True, anti_aliasing_randomness=True,
        extreme_quality=True, high_quality_model=True,
    )

cfg = RenderConfig(
    width=W0, height=H0, scene_backface_culling=True, use_pallas=True,
    triangle_block=int(os.environ.get("TB", 64)), kernel_ray_tile=RT, **FEATS,
)
scene = build("semesterbild", cfg)
scene = Scene.backface_culling(scene, np.array([0.0, 0.0, 1.0]))
ds = build_device_scene(scene, cfg)
plan = plan_frame(cfg)
o_np, d_np = build_frame_rays(cfg, plan)
# representative slice: the MIDDLE of the frame (a fixed 4R offset lands in
# the background sky under AA expansion — extreme's 17 rays/px put ray 4R at
# image row ~20, where nothing hits and the whole kernel gates away)
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

orig_occl_lights = PK._tri_occl_lights
orig_pair = PK._pair_flip_update
orig_sph = PK._sphere_occl_comp
orig_big = PK._bigtri_occl_split


def occl_identity(*a, **kw):
    return a[6]  # carries untouched (rolled signature)


def pair_trivial(blk, carry, lj, P, trans_block, backface_culling):
    # keep a data dependence on P so the gates/conds can't fold away
    dec, opq, fr, fg, fb = carry
    return (dec + 0.0 * jnp.sum(P[0], axis=0), opq, fr, fg, fb)


def zeros_occl(sph, sox, soy, soz, dx, dy, dz, maxd, backface_culling=False):
    z = jnp.zeros_like(sox)
    return z + 0.0 * sox, z, z, z, z


def zeros_big(trb, sox, soy, soz, dx, dy, dz, maxd, backface_culling, rows):
    z = jnp.zeros_like(sox)
    return z + 0.0 * sox, z, z, z, z


VARIANTS = {
    "full": {},
    "no_morton": {"_tri_occl_lights": occl_identity},
    "gates_only": {"_pair_flip_update": pair_trivial},
    "no_gates": {"use_aabb": False},
    "no_bigsph": {"_sphere_occl_comp": zeros_occl, "_bigtri_occl_split": zeros_big},
    "flat_only": {
        "_tri_occl_lights": occl_identity,
        "_sphere_occl_comp": zeros_occl,
        "_bigtri_occl_split": zeros_big,
    },
    # flat_only minus the per-light sb_occl lax.conds and gate `any`
    # reductions (use_aabb=False takes the unconditional path; the Morton
    # scan is identity either way) — isolates cond/branch machinery cost
    "flat_nocond": {
        "_tri_occl_lights": occl_identity,
        "_sphere_occl_comp": zeros_occl,
        "_bigtri_occl_split": zeros_big,
        "use_aabb": False,
    },
    # per-ray opaque-occlusion gate fold disabled (round-3b A/B; the fold
    # is exact, so `full` vs `opq_off` outputs must be bit-identical)
    "opq_off": {"OPQ_GATE": False},
    # per-lane evolving-opacity block gating disabled (round-3c A/B;
    # exact, so `full` vs `lane_off` outputs must be bit-identical)
    "lane_off": {"LANE_GATE": False},
}

only = [v for v in os.environ.get("VARIANTS", "").split(",") if v]
if only:
    VARIANTS = {k: v for k, v in VARIANTS.items() if k in only}
# ray-tile sweep INSIDE one relay session (session-to-session variance is
# 3-4x; only same-session ratios are load-bearing — PERF.md)
RTS = [int(r) for r in os.environ.get("RTS", str(RT)).split(",")]
PROF = os.environ.get("PROF") == "1"


def device_ms(f, *a):
    """Sum of pallas custom-call device durations for one call of f."""
    pdir = "/tmp/jaxprof_ablate"
    os.system(f"rm -rf {pdir}")
    with jax.profiler.trace(pdir):
        out = f(*a)
        jax.block_until_ready(out)
        np.asarray(out[0])[0, 0]
    tr = sorted(glob.glob(f"{pdir}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(tr) as fh:
        data = _json.load(fh)
    import collections

    tot = collections.Counter()
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e:
            tot[e.get("name", "")] += e["dur"]
    us = sum(v for k, v in tot.items() if "pallas" in k)
    if us == 0.0 and os.environ.get("PROF_DEBUG"):
        for k, v in tot.most_common(10):
            print(f"    [ev] {v/1e3:8.2f} ms  {k[:90]}", flush=True)
        # fall back to the jit entry's device total
        us = max((v for k, v in tot.items() if k.startswith("jit")), default=0.0)
    return us / 1e3

# same-session reference point: the FULL fused shade+eval kernel (strictly
# more work than pallas_light_shade — lighting + fresnel + children math);
# the frame profile showed it ~4-5x FASTER per instance, so time both here
if "fused" in (only or ["fused"]):
    fused_args = (
        hit.point, hit.normal, view, hit.color, hit.shininess,
        hit.valid.astype(jnp.float32), hit.t,
        jnp.ones((R, 3), jnp.float32), jnp.full((R,), 1.000293, jnp.float32),
        jnp.full((R,), -1, jnp.int32), jnp.zeros((R,), jnp.float32),
        hit.has_trans.astype(jnp.float32), hit.metallic, hit.ior,
        hit.opacity, hit.boost,
    )
    for rt in [int(r) for r in os.environ.get("RTS", str(RT)).split(",")]:
        fkw = dict(static_kw, ray_tile=rt)
        ff = jax.jit(
            lambda *a, fkw=fkw: PK.pallas_shade_eval.__wrapped__(
                ds.light_pack, ds.sph_pack, ds.trb_pack,
                ds.tri_blk_pack, ds.tri_blk_aabb,
                *a, reflections=True, refractions=True,
                refl_max=9, refr_max=8, weight_cutoff=1e-3, **fkw,
            )
        )
        t0 = time.monotonic()
        out = ff(*fused_args)
        jax.block_until_ready(out)
        np.asarray(out[0])[0, 0]
        comp = time.monotonic() - t0
        if os.environ.get("PROF") == "1":
            ms = min(device_ms(ff, *fused_args) for _ in range(3))
        else:
            ts = []
            for _ in range(6):
                t0 = time.monotonic()
                out = ff(*fused_args)
                jax.block_until_ready(out)
                ts.append((time.monotonic() - t0) * 1e3)
            ms = min(ts)
        print(f"{'fused@'+str(rt):16s}: {ms:8.2f} ms "
              f"({ms * 1e3 / (R // rt):6.1f} us/instance) "
              f"compile {comp:.0f}s", flush=True)

def chain_slope(kw, n_hi=9):
    """Device ms per kernel call from the slope of N chained calls in one
    program (dispatch floor cancels). The chain feeds each call's output
    back into the next call's input so XLA cannot CSE or parallelize."""

    def run_n(n):
        def prog(point, normal, view, color, shin, valid):
            def one(i, carry):
                acc, = carry
                p = point * (1.0 + 0.0 * acc)
                d_, s_ = PK.pallas_light_shade.__wrapped__(
                    ds.light_pack, ds.sph_pack, ds.trb_pack,
                    ds.tri_blk_pack, ds.tri_blk_aabb,
                    p, normal, view, color, shin, valid, **kw,
                )
                return (acc + d_[0, 0],)

            return jax.lax.fori_loop(0, n, one, (jnp.float32(0.0),))[0]

        fj = jax.jit(prog)
        out = fj(*args)
        jax.block_until_ready(out)
        float(out)
        ts = []
        for _ in range(5):
            t0 = time.monotonic()
            out = fj(*args)
            jax.block_until_ready(out)
            float(out)
            ts.append((time.monotonic() - t0) * 1e3)
        return min(ts)

    lo, hi = run_n(1), run_n(n_hi)
    return (hi - lo) / (n_hi - 1)


results = {}
for name, patches in VARIANTS.items():
    patches = dict(patches)
    use_aabb = patches.pop("use_aabb", True)
    for attr, fn in patches.items():
        setattr(PK, attr, fn)
    try:
        for rt in RTS:
            kw = dict(static_kw, ray_tile=rt, use_aabb=use_aabb)
            f = jax.jit(
                lambda *a, kw=kw: PK.pallas_light_shade.__wrapped__(
                    ds.light_pack, ds.sph_pack, ds.trb_pack,
                    ds.tri_blk_pack, ds.tri_blk_aabb,
                    *a, **kw,
                )
            )
            tag = f"{name}@{rt}"
            try:
                t0 = time.monotonic()
                out = f(*args)
                jax.block_until_ready(out)
                np.asarray(out[0])[0, 0]
                comp = time.monotonic() - t0
            except Exception as e:
                print(f"{tag:16s}: FAILED {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:120]}", flush=True)
                continue
            if PROF:
                # device-trace capture through the relay fails sporadically
                # (no device events -> 0.0); keep sampling until 2 nonzero
                vals = []
                for _ in range(8):
                    v = device_ms(f, *args)
                    if v > 0.0:
                        vals.append(v)
                    if len(vals) >= 2:
                        break
                ms = min(vals) if vals else 0.0
                if ms == 0.0:
                    # profiler dead this session: chain-slope meter — N
                    # dependent kernel calls inside ONE program amortize the
                    # relay dispatch floor; slope = device ms/call
                    ms = chain_slope(kw)
            else:
                ts = []
                for _ in range(6):
                    t0 = time.monotonic()
                    out = f(*args)
                    jax.block_until_ready(out)
                    ts.append((time.monotonic() - t0) * 1e3)
                ms = min(ts)
            results[tag] = ms
            unit = "ms-device" if PROF else "ms/tile-kernel"
            print(f"{tag:16s}: {ms:8.2f} {unit} "
                  f"({ms * 1e3 / (R // rt):6.1f} us/instance) compile {comp:.0f}s "
                  f"checksum {float(jnp.sum(out[0])):.4g}", flush=True)
    finally:
        PK._tri_occl_lights = orig_occl_lights
        PK._pair_flip_update = orig_pair
        PK._sphere_occl_comp = orig_sph
        PK._bigtri_occl_split = orig_big
        PK.OPQ_GATE = True
        PK.LANE_GATE = True

full = results.get(f"full@{RTS[0]}")
if full:
    print("\nshares of full:")
    for k, v in results.items():
        print(f"  {k:16s}: {v:8.2f} ms  ({(full - v) / full * 100:+5.1f}% removed)")
