"""Shadow-gate survival diagnostic (CPU, numpy): for the bench's PRIMARY
wavefront, measure at kernel-instance granularity (RT=256 rays) how much
work the per-(light, block) gates actually admit:

  - instance-any rate: fraction of (instance, light, block) triples where
    ANY of the 256 rays' shadow segments crosses the block AABB — each
    surviving triple pays the full (RT, B) pair math;
  - ray-pass rate within surviving triples: how many of those 256 rays
    individually need the block — the gap to 100% is pure lane waste;
  - same numbers at the superblock level (two-level culling).

This quantifies whether the next win is (a) finer/better culling (low
instance-any but high executed-pair waste), (b) per-ray work reduction
(high ray-pass gap), or (c) neither (gates already tight -> cut constant
factors / overlap host I/O instead).

Primary wavefront only — pool (secondary) rays are incoherent; their gate
rates are measured by the optional --pool flag using one serviced pool
generation traced on CPU.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from hslu_i.ba_raytracing.f2501_raytracer_tpu import RenderConfig, build_device_scene
from hslu_i.ba_raytracing.f2501_raytracer_tpu.models import build
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.intersect import cast_rays
from hslu_i.ba_raytracing.f2501_raytracer_tpu.renderer import (
    build_frame_rays,
    plan_frame,
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.builder import Scene

W0, H0 = (int(v) for v in os.environ.get("GATE_RES", "1920x1080").split("x"))
RT = int(os.environ.get("GATE_RT", 256))

cfg = RenderConfig(
    width=W0, height=H0, reflections=True, refractions=True,
    light_reflections=True, scene_backface_culling=True,
    triangle_block=64 if W0 * H0 >= 10**6 else 512,
)
scene = build("semesterbild", cfg)
scene = Scene.backface_culling(scene, np.array([0.0, 0.0, 1.0]))
ds = build_device_scene(scene, cfg)
plan = plan_frame(cfg)
o_np, d_np = build_frame_rays(cfg, plan)
n_tiles, T = o_np.shape[0], o_np.shape[1]
o = o_np.reshape(-1, 3)
d = d_np.reshape(-1, 3)
# normalize like trace_rays does
d = d / np.linalg.norm(d, axis=1, keepdims=True)

t0 = time.monotonic()
hit = cast_rays(ds, jnp.asarray(o), jnp.asarray(d), cfg.backface_culling, False)
valid = np.asarray(hit.valid)
t_hit = np.asarray(hit.t)
print(f"primary cast on CPU: {time.monotonic() - t0:.1f}s; "
      f"{valid.mean() * 100:.1f}% hit", flush=True)

P = o + d * t_hit[:, None]
eps = float(cfg.camera.epsilon_distance)
lights = np.asarray(ds.light_pos)  # (L, 3)
aabb = np.asarray(ds.tri_aabb)  # (nb, 8)
saabb = np.asarray(ds.tri_saabb)
sb_sizes = ds.sb_sizes
nb = aabb.shape[0]
L = lights.shape[0]
R = P.shape[0]
n_inst = R // RT
print(f"{L} lights, {nb} blocks of B={cfg.triangle_block}, "
      f"{n_inst} kernel instances of {RT} rays", flush=True)

# normals for the angle_pos gate (light behind surface -> maxd zeroed)
nrm = np.asarray(hit.normal)


def seg_gate(boxes, so, sd, maxd):
    """(R, nb) does segment so + t*sd, t in [0, maxd] (unnormalized; maxd=1
    reaches the light) cross each box. Matches _block_gate semantics."""
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / sd  # (R, 3)
        t1 = (boxes[None, :, 0:3] - so[:, None, :]) * inv[:, None, :]
        t2 = (boxes[None, :, 3:6] - so[:, None, :]) * inv[:, None, :]
    lo = np.minimum(t1, t2)
    hi = np.maximum(t1, t2)
    lo = np.where(np.isnan(lo), -np.inf, lo)
    hi = np.where(np.isnan(hi), np.inf, hi)
    tn = lo.max(axis=2)
    tf = hi.min(axis=2)
    return (tf >= np.maximum(tn, 0.0)) & (tn <= maxd[:, None])


tot_inst_any = np.zeros(L)
tot_ray_pass = np.zeros(L)
tot_pairs = 0
sb_any = np.zeros(L)
occl_frac = np.zeros(L)
for li in range(L):
    lp = lights[li]
    ltp = lp[None, :] - P
    lt = np.linalg.norm(ltp, axis=1)
    ld = ltp / np.maximum(lt[:, None], 1e-30)
    cos_in = (ltp * nrm).sum(1) / (lt + 2.0**-23)
    occl_lane = valid & (cos_in > 0.0)
    so = P + ld * eps
    de = lp[None, :] - so
    maxd = np.where(occl_lane, np.linalg.norm(de, axis=1), 0.0)
    # gate in the kernel's parameterization: direction ld, limit maxd
    g = seg_gate(aabb, so, ld, maxd) & occl_lane[:, None]  # (R, nb)
    gi = g.reshape(n_inst, RT, nb)
    inst_any = gi.any(axis=1)  # (n_inst, nb)
    tot_inst_any[li] = inst_any.mean()
    # within surviving triples, how many rays individually pass
    per = gi.sum(axis=1)  # (n_inst, nb)
    tot_ray_pass[li] = per[inst_any].mean() / RT if inst_any.any() else 0.0
    occl_frac[li] = occl_lane.mean()
    # superblock level
    gs = seg_gate(saabb, so, ld, maxd) & occl_lane[:, None]
    sb_any[li] = gs.reshape(n_inst, RT, -1).any(axis=1).mean()
    print(
        f"light {li}: occl-lanes {occl_frac[li]*100:5.1f}% | "
        f"sb-any {sb_any[li]*100:5.1f}% | block-any {tot_inst_any[li]*100:5.1f}% | "
        f"ray-pass|any {tot_ray_pass[li]*100:5.1f}%",
        flush=True,
    )

print(
    f"\nmean over {L} lights: instance-any {tot_inst_any.mean()*100:.1f}% "
    f"(executed pair fraction), ray-pass within executed {tot_ray_pass.mean()*100:.1f}% "
    f"(lane utility)",
)
print(
    "interpretation: executed-pair work ~ instance-any * L * nb * RT * B; "
    "per-ray ideal ~ ray-pass * that."
)


# ---------------------------------------------------------------------------
# --pool: the same statistic on a SERVICED SECONDARY generation. Gen-1
# children (reflection at metallic/transmissive hits, refraction at
# transmissive hits — approximate spawn physics; this is a gate statistic,
# not a parity path) are compacted in ray order exactly like the pool
# services pending rays, cast to their own hit points, and analyzed with
# the identical per-light loop.
# ---------------------------------------------------------------------------
if "--pool" in sys.argv:
    met = np.asarray(hit.metallic)
    htt = np.asarray(hit.has_trans)
    ior_a = np.maximum(np.asarray(hit.ior), 1e-6)
    nn = nrm / np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-30)
    cos = -(d * nn).sum(1)
    refl_d = d + 2.0 * cos[:, None] * nn
    eta = 1.0 / ior_a
    sin2 = eta * eta * (1.0 - cos * cos)
    with np.errstate(invalid="ignore"):
        refr_d = (
            eta[:, None] * d
            + (eta * cos - np.sqrt(np.maximum(1.0 - sin2, 0.0)))[:, None] * nn
        )
    kids_o, kids_d = [], []
    for sp, dd in [
        (valid & ((met > 0.0) | htt), refl_d),
        (valid & htt & (sin2 <= 1.0), refr_d),
    ]:
        ddn = dd[sp]
        ddn = ddn / np.maximum(np.linalg.norm(ddn, axis=1, keepdims=True), 1e-30)
        kids_o.append(P[sp] + ddn * eps)
        kids_d.append(ddn)
    ko = np.concatenate(kids_o)
    kd = np.concatenate(kids_d)
    cap = int(os.environ.get("GATE_POOL_CAP", 512 * 1024)) // RT * RT
    ko, kd = ko[:cap], kd[:cap]
    Rp = len(ko) // RT * RT
    ko, kd = ko[:Rp], kd[:Rp]
    t0 = time.monotonic()
    khit = cast_rays(ds, jnp.asarray(ko), jnp.asarray(kd), cfg.backface_culling, False)
    kvalid = np.asarray(khit.valid)
    kt = np.asarray(khit.t)
    knrm = np.asarray(khit.normal)
    print(
        f"\npool gen-1: {Rp} serviced children ({len(kids_o[0])} refl + "
        f"{len(kids_o[1])} refr pre-cap), cast {time.monotonic()-t0:.1f}s, "
        f"{kvalid.mean()*100:.1f}% hit",
        flush=True,
    )
    KP = ko + kd * kt[:, None]
    n_inst_p = Rp // RT
    p_inst_any = np.zeros(L)
    p_ray_pass = np.zeros(L)
    for li in range(L):
        lp = lights[li]
        ltp = lp[None, :] - KP
        lt = np.linalg.norm(ltp, axis=1)
        ld = ltp / np.maximum(lt[:, None], 1e-30)
        cos_in = (ltp * knrm).sum(1) / (lt + 2.0**-23)
        occl_lane = kvalid & (cos_in > 0.0)
        so = KP + ld * eps
        de = lp[None, :] - so
        maxd = np.where(occl_lane, np.linalg.norm(de, axis=1), 0.0)
        g = seg_gate(aabb, so, ld, maxd) & occl_lane[:, None]
        gi = g.reshape(n_inst_p, RT, nb)
        inst_any = gi.any(axis=1)
        p_inst_any[li] = inst_any.mean()
        per = gi.sum(axis=1)
        p_ray_pass[li] = per[inst_any].mean() / RT if inst_any.any() else 0.0
        print(
            f"pool light {li}: occl-lanes {occl_lane.mean()*100:5.1f}% | "
            f"block-any {p_inst_any[li]*100:5.1f}% | "
            f"ray-pass|any {p_ray_pass[li]*100:5.1f}%",
            flush=True,
        )
    print(
        f"pool mean: instance-any {p_inst_any.mean()*100:.1f}% vs primary "
        f"{tot_inst_any.mean()*100:.1f}%; lane utility {p_ray_pass.mean()*100:.1f}% "
        f"vs primary {tot_ray_pass.mean()*100:.1f}%"
    )
