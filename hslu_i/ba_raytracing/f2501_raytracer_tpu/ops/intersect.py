"""Batched ray casting and occlusion testing.

TPU-native replacement for the reference's per-object linear scans
(ref raytracing/raytracer.rs:162-220 `cast_ray` and :24-106
`has_any_intersection`): rays are dense wavefronts (R,3); triangles are
tested block-at-a-time against precomputed Woop transforms
(see scene/device.py); nearest-hit selection is a running (t, index) min,
replacing the reference's lane-masked `SurfaceInteraction::blend` chain
(surface_interaction.rs:55-64).

Two equivalent device paths:
* XLA: broadcast-fma pair tiles inside a `lax.scan` over triangle blocks
* Pallas (`use_pallas`): fully fused VMEM kernels (ops/pallas_kernels.py)

Semantics preserved exactly (these define the image):
* sphere root selection prefers the nearest non-negative t (sphere.rs:108-129)
* triangle validity: t > eps, u,v >= 0, u+v < 1, |det| > eps (triangle.rs:188-198)
* runtime backface cull quirk: dot(dir, normal) < 0.75 OR transmissive
  (sphere.rs:137-151, triangle.rs:154-168)
* shadow accumulation: multiplicative opacity through transmissive occluders
  with Fresnel transmittance, subtractive color filter, opaque hit =>
  completely occluded (raytracer.rs:43-98)
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..scene.device import DeviceScene
from .vecmath import F32_EPSILON, dot, normalized

INF = float("inf")  # python scalar: no backend init at import (weak-typed f32 in use)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Hit:
    """Wavefront surface-interaction record (ref surface_interaction.rs:13-32),
    with the material already gathered from the object SoA."""

    valid: jax.Array  # (R,) bool
    t: jax.Array  # (R,)
    point: jax.Array  # (R, 3)
    normal: jax.Array  # (R, 3) shading normal (non-unit for OBJ triangles)
    obj_idx: jax.Array  # (R,) int32 global object index
    color: jax.Array  # (R, 3)
    metallic: jax.Array  # (R,)
    shininess: jax.Array  # (R,)
    ior: jax.Array  # (R,)
    opacity: jax.Array  # (R,) transmission opacity value (0 where unset)
    has_trans: jax.Array  # (R,) bool
    boost: jax.Array  # (R,)


def _sphere_ts(scene: DeviceScene, o, d):
    """Quadratic per (ray, sphere): t (R,S) with the reference's root
    preference (sphere.rs:80-129) and validity ignoring backface culling."""
    oc = o[:, None, :] - scene.sph_center[None, :, :]  # (R,S,3)
    b = 2.0 * jnp.sum(d[:, None, :] * oc, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - scene.sph_r_sq[None, :]
    disc = b * b - 4.0 * c
    disc_pos = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (-b - sq) * 0.5
    t1 = (-b + sq) * 0.5
    t0_valid = (t0 >= 0.0) & disc_pos
    t1_valid = (t1 >= 0.0) & disc_pos
    use_t0 = t0_valid & (~t1_valid | (t0 < t1))
    use_t1 = t1_valid & ~use_t0
    t = jnp.where(use_t0, t0, jnp.where(use_t1, t1, INF))
    valid = (use_t0 | use_t1) & scene.sph_valid[None, :]
    return t, valid


def _sphere_cos(scene: DeviceScene, o, d, t):
    """cos between ray dir and outward unit normal at the hit point, (R,S)."""
    p = o[:, None, :] + d[:, None, :] * t[..., None]
    n = normalized(p - scene.sph_center[None, :, :])
    return jnp.sum(d[:, None, :] * n, axis=-1)


def _tri_block_ts(woop, nsq, tvalid_f, o4, d):
    """One triangle block: t (R,B) (+inf invalid), validity (no backface).

    Broadcast fma chains, (R,1)x(1,B): the contraction length is only 4, so
    a matmul would run the MXU at ~3% utilization; as elementwise work XLA
    fuses the transform, t/u/v, validity and the nearest-reduce."""
    B = nsq.shape[0]
    w = woop.reshape(4, 3, B)

    def transform(vec, rows):
        comps = []
        for c in range(3):
            acc = vec[:, 0:1] * rows[0, c][None, :]
            for k in range(1, vec.shape[1]):
                acc = acc + vec[:, k : k + 1] * rows[k, c][None, :]
            comps.append(acc)
        return comps

    u_o, v_o, w_o = transform(o4, w)
    u_d, v_d, w_d = transform(d, w[:3])

    t = -w_o / w_d
    u = u_o + t * u_d
    v = v_o + t * v_d
    det = w_d * nsq[None, :]  # = d·ñ = det([d,-e1,-e2])  (triangle.rs:179)
    valid = (
        (t > F32_EPSILON)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v < 1.0)
        & (jnp.abs(det) > F32_EPSILON)
        & (tvalid_f[None, :] != 0.0)
    )
    return jnp.where(valid, t, INF), valid


def _dot3_planes(d, tn3):
    """(R,3)x(3,B) -> (R,B) via broadcast fma (K=3 is too small for the MXU)."""
    return (
        d[:, 0:1] * tn3[0][None, :]
        + d[:, 1:2] * tn3[1][None, :]
        + d[:, 2:3] * tn3[2][None, :]
    )


def _backface_mask(cos_dn, has_trans):
    """ref sphere.rs:137-151 / triangle.rs:154-168: visible when
    dot(dir, normal) < 0.75 or the material is transmissive."""
    return (cos_dn < 0.75) | has_trans


def _pad_rays(arrs, multiple):
    R = arrs[0].shape[0]
    pad = (-R) % multiple
    if pad == 0:
        return arrs, R
    out = []
    for a in arrs:
        pad_width = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        out.append(jnp.pad(a, pad_width))
    return out, R


def _sphere_nearest(scene, o, d, backface_culling):
    S = scene.sphere_slots
    st, s_valid = _sphere_ts(scene, o, d)
    if backface_culling:
        cos = _sphere_cos(scene, o, d, jnp.where(s_valid, st, 0.0))
        s_valid &= _backface_mask(cos, scene.mat_has_trans[None, :S])
    st = jnp.where(s_valid, st, INF)
    return jnp.min(st, axis=1), jnp.argmin(st, axis=1).astype(jnp.int32)


def _bigtri_nearest_xla(scene, o4, d, backface_culling):
    """Nearest hit over the big-primitive sublane pack (XLA path):
    reconstructs a (12, P) coefficient block from trb_pack and reuses the
    pair-tile test. Returns (t (R,), local_idx (R,)) with idx in [0, P)."""
    pack = scene.trb_pack
    t, valid = _tri_block_ts(pack[:, 0:12].T, pack[:, 12], pack[:, 13], o4, d)
    if backface_culling:
        cos_dn = _dot3_planes(d, pack[:, 15:18].T)
        valid &= _backface_mask(cos_dn, pack[None, :, 14] != 0.0)
    t = jnp.where(valid, t, INF)
    return jnp.min(t, axis=1), jnp.argmin(t, axis=1).astype(jnp.int32)


def _bigtri_occlusion_xla(scene, o4, d, max_distance, backface_culling):
    """Shadow accumulators over the big-primitive pack (XLA path), same
    semantics as one `_tri_occlusion_xla` block."""
    pack = scene.trb_pack
    t, valid = _tri_block_ts(pack[:, 0:12].T, pack[:, 12], pack[:, 13], o4, d)
    httr = pack[None, :, 14] != 0.0
    cos_nv = -_dot3_planes(d, pack[:, 15:18].T)
    if backface_culling:
        valid &= _backface_mask(-cos_nv, httr)
    hit = valid & (t <= max_distance[:, None])
    tr = _shadow_transmittance_red(
        cos_nv, pack[None, :, 18], pack[None, :, 19], pack[None, :, 20],
        pack[None, :, 21], httr,
    )
    tr = jnp.where(httr, tr, 0.0)
    io = jnp.where(httr, pack[None, :, 19], 0.0) * tr
    dec = jnp.sum(jnp.where(hit, 1.0 - io, 0.0), axis=1)
    opq = jnp.any(hit & ~httr, axis=1)
    hit_f = jnp.where(hit, 1.0, 0.0)
    fsub = jnp.einsum("rp,pc->rc", hit_f, pack[:, 22:25])
    return dec, opq, fsub


def _tri_nearest_xla(scene, o4, d, backface_culling):
    S = scene.sphere_slots
    tri_base = (
        S
        + scene.n_bigtris
        + scene.tri_block * jnp.arange(scene.triangle_blocks, dtype=jnp.int32)
    )

    def body(carry, blk):
        bt, bi = carry
        woop, nsq, tn3, tval, httr, base = blk
        t, valid = _tri_block_ts(woop, nsq, tval, o4, d)
        if backface_culling:
            cos_dn = _dot3_planes(d, tn3)
            valid &= _backface_mask(cos_dn, httr[None, :] != 0.0)
        t = jnp.where(valid, t, INF)
        tmin = jnp.min(t, axis=1)
        targ = jnp.argmin(t, axis=1).astype(jnp.int32)
        closer = tmin < bt
        return (jnp.where(closer, tmin, bt), jnp.where(closer, base + targ, bi)), None

    R = o4.shape[0]
    init = (jnp.full((R,), INF), jnp.zeros((R,), jnp.int32))
    (t, idx), _ = jax.lax.scan(
        body,
        init,
        (
            scene.tri_woop,
            scene.tri_nsq,
            scene.tri_normal3,
            scene.tri_valid_f,
            scene.tri_httr_f,
            tri_base,
        ),
    )
    return t, idx


@partial(
    jax.jit,
    static_argnames=("backface_culling", "use_pallas", "interpret", "ray_tile"),
)
def cast_rays(
    scene: DeviceScene,
    o,
    d,
    backface_culling: bool = False,
    use_pallas: bool = False,
    interpret: bool = False,
    ray_tile: int = 256,
) -> Hit:
    """Nearest-hit cast of R rays (ref raytracer.rs:162-220). `d` must be
    normalized (Ray::new normalizes, ray.rs:54)."""
    R = o.shape[0]
    S = scene.sphere_slots

    best_t, best_idx = _sphere_nearest(scene, o, d, backface_culling)

    if use_pallas and scene.streaming:
        # past the VMEM-residency ceiling: Morton blocks stream from HBM
        # (pallas_cast_triangles_stream); spheres + big primitives stay XLA
        from .pallas_kernels import pallas_cast_triangles_stream

        o4 = jnp.concatenate([o, jnp.ones((R, 1), o.dtype)], axis=1)
        bt, bidx = _bigtri_nearest_xla(scene, o4, d, backface_culling)
        closer = bt < best_t
        best_t = jnp.where(closer, bt, best_t)
        best_idx = jnp.where(closer, S + bidx, best_idx)
        (op, dp), _ = _pad_rays((o, d), ray_tile)
        tt, tidx = pallas_cast_triangles_stream(
            scene.tri_woop,
            scene.tri_nsq,
            scene.tri_valid_f,
            scene.tri_httr_f,
            scene.tri_normal3,
            scene.tri_aabb,
            op,
            dp,
            backface_culling=backface_culling,
            ray_tile=ray_tile,
            interpret=interpret,
        )
        tt, tidx = tt[:R], tidx[:R]
        closer = tt < best_t
        best_t = jnp.where(closer, tt, best_t)
        best_idx = jnp.where(closer, S + scene.n_bigtris + tidx, best_idx)
    elif use_pallas:
        from .pallas_kernels import pallas_cast_triangles

        (op, dp), _ = _pad_rays((o, d), ray_tile)
        tt, tidx = pallas_cast_triangles(
            scene.trb_pack,
            scene.tri_cast_pack,
            scene.tri_aabb,
            scene.tri_saabb,
            op,
            dp,
            backface_culling=backface_culling,
            ray_tile=ray_tile,
            interpret=interpret,
            sb_sizes=scene.sb_sizes,
        )
        tt, tidx = tt[:R], tidx[:R]
        closer = tt < best_t
        best_t = jnp.where(closer, tt, best_t)
        best_idx = jnp.where(closer, S + tidx, best_idx)
    else:
        o4 = jnp.concatenate([o, jnp.ones((R, 1), o.dtype)], axis=1)
        bt, bidx = _bigtri_nearest_xla(scene, o4, d, backface_culling)
        closer = bt < best_t
        best_t = jnp.where(closer, bt, best_t)
        best_idx = jnp.where(closer, S + bidx, best_idx)
        tt, tidx = _tri_nearest_xla(scene, o4, d, backface_culling)
        closer = tt < best_t
        best_t = jnp.where(closer, tt, best_t)
        best_idx = jnp.where(closer, tidx, best_idx)

    valid = jnp.isfinite(best_t)
    t_safe = jnp.where(valid, best_t, 0.0)
    point = o + d * t_safe[:, None]

    # ONE packed row gather instead of ~12 separate takes: a TPU gather
    # costs ~the same per row regardless of row width (PERF.md), so the
    # material fields + the normal auxiliary ride one (R, 16) fetch
    row = jnp.take(scene.mat_pack, best_idx, axis=0)
    is_sphere = best_idx < S
    aux = row[:, 9:12]  # sphere center / triangle shading normal
    sph_normal = normalized(point - aux)
    normal = jnp.where(is_sphere[:, None], sph_normal, aux)

    return Hit(
        valid=valid,
        t=best_t,
        point=point,
        normal=normal,
        obj_idx=best_idx,
        color=row[:, 0:3],
        metallic=row[:, 3],
        shininess=row[:, 4],
        ior=row[:, 5],
        opacity=row[:, 6],
        has_trans=row[:, 7] != 0.0,
        boost=row[:, 8],
    )


def _shadow_transmittance_red(cos_nv, ior, opacity, metallic, color_r, has_trans):
    """Red channel of (1 - F) for a shadow ray through a transmissive occluder
    (ref material.rs:467-525 with other_ior = 1, view = -shadow_dir;
    raytracer.rs:57-74). transmittance.red == .green == .blue per the
    reference's own comment."""
    n_dot_v = cos_nv
    cos_theta = jnp.abs(n_dot_v)
    is_inside = n_dot_v < 0.0
    eta_t = jnp.where(is_inside, ior, 1.0 / ior)
    sin2_t = eta_t * eta_t * (1.0 - cos_theta * cos_theta)
    is_reflective = metallic > 0.0
    is_tir = (has_trans & is_inside & (sin2_t > 1.0)) | is_reflective
    f0 = ((1.0 - ior) / (1.0 + ior)) ** 2
    f0r = f0 + (color_r - f0) * metallic
    fresnel_r = f0r + (1.0 - f0r) * (1.0 - cos_theta) ** 5
    reflected_amount_r = jnp.where(is_reflective, metallic, 1.0)
    f_r = jnp.where(is_tir, reflected_amount_r, fresnel_r)
    # lanes whose material is NOT transmissive take the early-exit branch
    # (F = metallic); callers zero those out anyway (raytracer.rs:63-67).
    f_r = jnp.where(has_trans, f_r, metallic)
    return 1.0 - f_r


def _sphere_occlusion(scene, o, d, max_distance, backface_culling):
    S = scene.sphere_slots
    st, s_valid = _sphere_ts(scene, o, d)
    httr = scene.mat_has_trans[None, :S]
    cos = _sphere_cos(scene, o, d, jnp.where(s_valid, st, 0.0))
    if backface_culling:
        s_valid &= _backface_mask(cos, httr)
    s_hit = s_valid & (st <= max_distance[:, None])
    t_red = _shadow_transmittance_red(
        -cos,  # fresnel is called with view = -ray.direction (raytracer.rs:57-60)
        scene.mat_ior[None, :S],
        scene.mat_opacity[None, :S],
        scene.mat_metallic[None, :S],
        scene.mat_color[None, :S, 0],
        httr,
    )
    t_red = jnp.where(httr, t_red, 0.0)
    io = jnp.where(httr, scene.mat_opacity[None, :S], 0.0) * t_red
    dec = jnp.sum(jnp.where(s_hit, 1.0 - io, 0.0), axis=1)
    opq = jnp.any(s_hit & ~httr, axis=1)
    hit_f = jnp.where(s_hit, 1.0, 0.0)
    fsub = jnp.einsum("rs,sc->rc", hit_f, scene.mat_absorption[:S])
    return dec, opq, fsub


def _tri_occlusion_xla(scene, o4, d, max_distance, backface_culling):
    def body(carry, blk):
        dec, opq, fsub = carry
        woop, nsq, tn3, tval, httr_f, ior, op, met, col_r, absn = blk
        t, valid = _tri_block_ts(woop, nsq, tval, o4, d)
        httr = httr_f[None, :] != 0.0
        cos_nv = -_dot3_planes(d, tn3)
        if backface_culling:
            valid &= _backface_mask(-cos_nv, httr)
        hit = valid & (t <= max_distance[:, None])
        tr = _shadow_transmittance_red(
            cos_nv, ior[None, :], op[None, :], met[None, :], col_r[None, :], httr
        )
        tr = jnp.where(httr, tr, 0.0)
        io = jnp.where(httr, op[None, :], 0.0) * tr
        dec = dec + jnp.sum(jnp.where(hit, 1.0 - io, 0.0), axis=1)
        opq = opq | jnp.any(hit & ~httr, axis=1)
        hit_f = jnp.where(hit, 1.0, 0.0)
        fsub = fsub + jnp.stack(
            [jnp.sum(hit_f * absn[c][None, :], axis=1) for c in range(3)], axis=-1
        )
        return (dec, opq, fsub), None

    R = o4.shape[0]
    init = (
        jnp.zeros((R,)),
        jnp.zeros((R,), bool),
        jnp.zeros((R, 3)),
    )
    (dec, opq, fsub), _ = jax.lax.scan(
        body,
        init,
        (
            scene.tri_woop,
            scene.tri_nsq,
            scene.tri_normal3,
            scene.tri_valid_f,
            scene.tri_httr_f,
            scene.tri_ior,
            scene.tri_op,
            scene.tri_met,
            scene.tri_colr,
            scene.tri_absn,
        ),
    )
    return dec, opq, fsub


@partial(
    jax.jit,
    static_argnames=("backface_culling", "use_pallas", "interpret", "ray_tile"),
)
def occlude_rays(
    scene: DeviceScene,
    o,
    d,
    max_distance,
    backface_culling: bool = False,
    use_pallas: bool = False,
    interpret: bool = False,
    ray_tile: int = 256,
):
    """Shadow/occlusion test (ref raytracer.rs:24-106).

    Returns (completely_occluded (R,), combined_opacity (R,), color_filter (R,3)).
    completely_occluded reduces to "any opaque valid hit within distance";
    combined_opacity = max(0, 1 - Σ (1 - opacity_i·T_i)) over occluders;
    color_filter = 1 - Σ absorption_i over occluders (can go negative, as in
    the reference). The backface-cull quirk applies to shadow rays too, since
    the reference funnels them through the same `intersect` impls.
    """
    dec, opq, fsub = _sphere_occlusion(scene, o, d, max_distance, backface_culling)

    if use_pallas and scene.streaming:
        from .pallas_kernels import pallas_occlude_triangles_stream

        o4 = jnp.concatenate([o, jnp.ones((o.shape[0], 1), o.dtype)], axis=1)
        bdec, bopq, bfsub = _bigtri_occlusion_xla(
            scene, o4, d, max_distance, backface_culling
        )
        dec = dec + bdec
        opq = opq | bopq
        fsub = fsub + bfsub
        (op_, dp_, mp_), R = _pad_rays((o, d, max_distance), ray_tile)
        tdec, topq, tfsub = pallas_occlude_triangles_stream(
            scene.tri_woop,
            scene.tri_nsq,
            scene.tri_valid_f,
            scene.tri_httr_f,
            scene.tri_normal3,
            scene.tri_ior,
            scene.tri_op,
            scene.tri_met,
            scene.tri_colr,
            scene.tri_absn,
            scene.tri_aabb,
            jnp.asarray(scene.block_has_trans, jnp.float32)
            if scene.block_has_trans
            else jnp.ones((scene.tri_woop.shape[0],), jnp.float32),
            op_,
            dp_,
            mp_,
            backface_culling=backface_culling,
            ray_tile=ray_tile,
            interpret=interpret,
            trans_blocks=any(scene.block_has_trans) if scene.block_has_trans else True,
        )
        dec = dec + tdec[:R]
        opq = opq | topq[:R]
        fsub = fsub + tfsub[:R]
    elif use_pallas:
        from .pallas_kernels import pallas_occlude_triangles

        (op_, dp_, mp_), R = _pad_rays((o, d, max_distance), ray_tile)
        tdec, topq, tfsub = pallas_occlude_triangles(
            scene.trb_pack,
            scene.tri_woop,
            scene.tri_nsq,
            scene.tri_valid_f,
            scene.tri_httr_f,
            scene.tri_normal3,
            scene.tri_ior,
            scene.tri_op,
            scene.tri_met,
            scene.tri_colr,
            scene.tri_absn,
            scene.tri_aabb,
            scene.tri_saabb,
            op_,
            dp_,
            mp_,
            backface_culling=backface_culling,
            ray_tile=ray_tile,
            interpret=interpret,
            bigtri_trans=scene.bigtri_trans,
            block_has_trans=scene.block_has_trans,
            sb_sizes=scene.sb_sizes,
        )
        dec = dec + tdec[:R]
        opq = opq | topq[:R]
        fsub = fsub + tfsub[:R]
    else:
        o4 = jnp.concatenate([o, jnp.ones((o.shape[0], 1), o.dtype)], axis=1)
        bdec, bopq, bfsub = _bigtri_occlusion_xla(
            scene, o4, d, max_distance, backface_culling
        )
        dec = dec + bdec
        opq = opq | bopq
        fsub = fsub + bfsub
        tdec, topq, tfsub = _tri_occlusion_xla(scene, o4, d, max_distance, backface_culling)
        dec = dec + tdec
        opq = opq | topq
        fsub = fsub + tfsub

    combined_opacity = jnp.clip(1.0 - dec, 0.0, 1.0)
    color_filter = 1.0 - fsub
    return opq, combined_opacity, color_filter
