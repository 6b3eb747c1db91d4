"""Pallas TPU kernels for the two hot scans: nearest-hit cast and shadow
occlusion over triangle blocks.

Why Pallas: the per-(ray, triangle) work is ~35-60 VPU ops on a pair tile
followed by a lane reduction. Left to XLA the chain materializes many (R, B)
intermediates in HBM; here the whole pipeline — Woop transform, t/u/v
validity, the reference's quirky Fresnel shadow transmittance, and the
running min / accumulate — stays in VMEM and registers.

Structure: the full triangle SoA (~25 f32 planes, Morton-ordered) is small
enough to reside in VMEM (1.5 MB for the 14.5k-face semesterbild mesh), so
the grid is 1-D over ray tiles and a `fori_loop` walks the triangle blocks
in-kernel — a 2-D grid would pay per-step pipeline overhead on every
(tile, block) cell. Each block carries a Morton-tight AABB; a per-tile slab
test skips blocks no ray in the tile can touch (`lax.cond`), the TPU
analogue of an acceleration structure's node rejection — the reference
itself scans every object for every ray (SURVEY.md §3.4).

Semantics are identical to ops/intersect.py (same reference citations).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .vecmath import F32_EPSILON

# plain python literals: jnp constants would be captured tracers
INF = float("inf")
BIG_IDX = 2**31 - 1


def _pair_tuv(woop, o4, d):
    """Woop transform on a (RT, B) pair tile. woop: (12, B) rows =
    [A^T | b] coefficient planes; returns t, u, v, w_d."""

    def tf(vec, k0, nk):
        acc = vec[:, 0:1] * woop[k0, :][None, :]
        for k in range(1, nk):
            acc += vec[:, k : k + 1] * woop[k0 + 3 * k, :][None, :]
        return acc

    u_o, v_o, w_o = tf(o4, 0, 4), tf(o4, 1, 4), tf(o4, 2, 4)
    u_d, v_d, w_d = tf(d, 0, 3), tf(d, 1, 3), tf(d, 2, 3)
    t = -w_o / w_d
    u = u_o + t * u_d
    v = v_o + t * v_d
    return t, u, v, w_d


def _block_aabb_hit(aabb_row, o, d, t_limit):
    """Does ANY ray in the tile hit this block's AABB closer than `t_limit`?
    `t_limit` may be a scalar or a per-ray (RT,) vector. aabb_row: (8,) =
    [min xyz | max xyz | pad]. NaN-robust slab test: a zero direction
    component with the origin exactly on that slab plane yields 0*inf=NaN;
    mapping NaN lo/hi to -inf/+inf treats that degenerate lane as inside the
    slab, so the cull stays conservative (never a wrong miss)."""
    inv = 1.0 / d  # (RT,3); ±inf on zero components
    t1 = (aabb_row[0:3][None, :] - o) * inv
    t2 = (aabb_row[3:6][None, :] - o) * inv
    lo = jnp.minimum(t1, t2)
    hi = jnp.maximum(t1, t2)
    lo = jnp.where(jnp.isnan(lo), -INF, lo)
    hi = jnp.where(jnp.isnan(hi), INF, hi)
    tnear = jnp.max(lo, axis=1)
    tfar = jnp.min(hi, axis=1)
    hit = (tfar >= jnp.maximum(tnear, 0.0)) & (tnear <= t_limit)
    return jnp.any(hit)


def _tri_validity(woop, nsq, tval, o4, d):
    t, u, v, w_d = _pair_tuv(woop, o4, d)
    det = w_d * nsq[None, :]
    valid = (
        (t > F32_EPSILON)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v < 1.0)
        & (jnp.abs(det) > F32_EPSILON)
        & (tval[None, :] != 0.0)
    )
    return t, valid


def _cos_planes(d, tn):
    return (
        d[:, 0:1] * tn[0][None, :]
        + d[:, 1:2] * tn[1][None, :]
        + d[:, 2:3] * tn[2][None, :]
    )


def _cast_kernel(
    o4_ref, d_ref, woop_ref, nsq_ref, valid_ref, httr_ref, tnorm_ref, aabb_ref,
    t_out, idx_out, *, nb, block_size, backface_culling, use_aabb,
):
    o4 = o4_ref[:]
    d = d_ref[:]
    o3 = o4[:, 0:3]
    RT = o4.shape[0]
    # running minimum carried in registers; outputs written once at the end.
    # NB: block indices are python ints — dynamic VMEM indexing (traced
    # index) costs ~milliseconds per access on TPU.
    best_t = jnp.full((RT, 1), INF, jnp.float32)
    best_idx = jnp.full((RT, 1), BIG_IDX, jnp.int32)

    for b in range(nb):

        def compute(_, b=b):
            woop = woop_ref[b]
            t, valid = _tri_validity(woop, nsq_ref[b, 0], valid_ref[b, 0], o4, d)
            if backface_culling:
                cos_dn = _cos_planes(d, tnorm_ref[b])
                valid &= (cos_dn < 0.75) | (httr_ref[b, 0][None, :] != 0.0)
            t = jnp.where(valid, t, INF)
            tmin = jnp.min(t, axis=1, keepdims=True)
            cols = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
            idx = jnp.min(
                jnp.where(t == tmin, cols + b * block_size, jnp.int32(BIG_IDX)),
                axis=1,
                keepdims=True,
            )
            return tmin, idx

        if use_aabb:
            # skip blocks farther than every ray's current best hit
            hit = _block_aabb_hit(aabb_ref[b], o3, d, jnp.max(best_t))
            tmin, idx = jax.lax.cond(
                hit,
                compute,
                lambda _: (jnp.full((RT, 1), INF, jnp.float32),
                           jnp.full((RT, 1), BIG_IDX, jnp.int32)),
                0,
            )
        else:
            tmin, idx = compute(0)
        closer = tmin < best_t
        best_idx = jnp.where(closer, idx, best_idx)
        best_t = jnp.where(closer, tmin, best_t)

    t_out[:] = best_t
    idx_out[:] = best_idx


@functools.partial(
    jax.jit,
    static_argnames=("backface_culling", "ray_tile", "use_aabb", "interpret"),
)
def pallas_cast_triangles(
    tri_woop, tri_nsq, tri_valid, tri_httr, tri_normal3, tri_aabb,
    o, d, backface_culling=False, ray_tile=256, use_aabb=True, interpret=False,
):
    """Nearest triangle hit: (t (R,), local_tri_idx (R,)). The whole
    triangle SoA lives in VMEM; R must be a multiple of ray_tile."""
    R = o.shape[0]
    nb, _, B = tri_woop.shape
    assert R % ray_tile == 0, (R, ray_tile)
    o4 = jnp.concatenate([o, jnp.ones((R, 1), o.dtype)], axis=1)

    def full(s):
        return pl.BlockSpec(s, lambda i: tuple(0 for _ in s), memory_space=pltpu.VMEM)

    def ray(s):
        return pl.BlockSpec(s, lambda i: (i, 0), memory_space=pltpu.VMEM)

    t_out, idx_out = pl.pallas_call(
        functools.partial(
            _cast_kernel,
            nb=nb,
            block_size=B,
            backface_culling=backface_culling,
            use_aabb=use_aabb,
        ),
        grid=(R // ray_tile,),
        in_specs=[
            ray((ray_tile, 4)),
            ray((ray_tile, 3)),
            full((nb, 12, B)),
            full((nb, 1, B)),
            full((nb, 1, B)),
            full((nb, 1, B)),
            full((nb, 3, B)),
            full((nb, 8)),
        ],
        out_specs=[ray((ray_tile, 1)), ray((ray_tile, 1))],
        out_shape=[
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
            jax.ShapeDtypeStruct((R, 1), jnp.int32),
        ],
        interpret=interpret,
    )(o4, d, tri_woop, tri_nsq[:, None], tri_valid[:, None], tri_httr[:, None],
      tri_normal3, tri_aabb)
    return t_out[:, 0], idx_out[:, 0]


def _occlude_kernel(
    o4_ref, d_ref, maxd_ref, woop_ref, nsq_ref, valid_ref, httr_ref, tnorm_ref,
    ior_ref, op_ref, met_ref, colr_ref, absn_ref, aabb_ref,
    dec_out, opq_out, fsub_out, *, nb, backface_culling, use_aabb,
    block_has_trans,
):
    o4 = o4_ref[:]
    d = d_ref[:]
    o3 = o4[:, 0:3]
    maxd = maxd_ref[:]
    RT = o4.shape[0]
    dec = jnp.zeros((RT, 1), jnp.float32)
    opq = jnp.zeros((RT, 1), jnp.float32)
    fsub = jnp.zeros((RT, 3), jnp.float32)
    maxd_all = jnp.max(maxd)

    for b in range(nb):

        trans_block = block_has_trans[b] if block_has_trans else True

        def compute(_, b=b, trans_block=trans_block):
            woop = woop_ref[b]
            t, valid = _tri_validity(woop, nsq_ref[b, 0], valid_ref[b, 0], o4, d)
            httr = httr_ref[b, 0][None, :] != 0.0
            if backface_culling or trans_block:
                tn = tnorm_ref[b]
                cos_nv = -_cos_planes(d, tn)
            if backface_culling:
                valid &= (-cos_nv < 0.75) | httr
            hit = valid & (t <= maxd)

            if trans_block:
                # shadow Fresnel transmittance, red channel
                # (material.rs:467-525 with other_ior=1; raytracer.rs:57-74)
                ior = ior_ref[b, 0][None, :]
                met = met_ref[b, 0][None, :]
                col_r = colr_ref[b, 0][None, :]
                opv = op_ref[b, 0][None, :]
                cos_theta = jnp.abs(cos_nv)
                is_inside = cos_nv < 0.0
                eta_t = jnp.where(is_inside, ior, 1.0 / ior)
                sin2_t = eta_t * eta_t * (1.0 - cos_theta * cos_theta)
                is_refl = met > 0.0
                is_tir = (httr & is_inside & (sin2_t > 1.0)) | is_refl
                f0 = ((1.0 - ior) / (1.0 + ior)) ** 2
                f0r = f0 + (col_r - f0) * met
                omc = 1.0 - cos_theta
                fres_r = f0r + (1.0 - f0r) * omc * omc * omc * omc * omc
                f_r = jnp.where(is_tir, jnp.where(is_refl, met, 1.0), fres_r)
                t_red = jnp.where(httr, 1.0 - f_r, 0.0)
                io = jnp.where(httr, opv, 0.0) * t_red
            else:
                # all-opaque block: every hit decrements opacity fully
                io = jnp.float32(0.0)

            hit_f = jnp.where(hit, 1.0, 0.0)
            d_dec = jnp.sum(hit_f * (1.0 - io), axis=1, keepdims=True)
            d_opq = jnp.max(jnp.where(hit & ~httr, 1.0, 0.0), axis=1, keepdims=True)
            absn = absn_ref[b]
            fr = jnp.sum(hit_f * absn[0][None, :], axis=1, keepdims=True)
            fg = jnp.sum(hit_f * absn[1][None, :], axis=1, keepdims=True)
            fb = jnp.sum(hit_f * absn[2][None, :], axis=1, keepdims=True)
            return d_dec, d_opq, jnp.concatenate([fr, fg, fb], axis=1)

        if use_aabb:
            # skip when no ray reaches the block OR every ray is already
            # fully occluded by an opaque hit — the reference's early-exit
            # (raytracer.rs:94-96); outputs for occluded rays are unused
            # downstream (light_valid is false), so this is result-exact
            hit = _block_aabb_hit(aabb_ref[b], o3, d, maxd_all) & (jnp.min(opq) < 1.0)
            d_dec, d_opq, d_fsub = jax.lax.cond(
                hit,
                compute,
                lambda _: (jnp.zeros((RT, 1), jnp.float32),
                           jnp.zeros((RT, 1), jnp.float32),
                           jnp.zeros((RT, 3), jnp.float32)),
                0,
            )
        else:
            d_dec, d_opq, d_fsub = compute(0)
        dec = dec + d_dec
        opq = jnp.maximum(opq, d_opq)
        fsub = fsub + d_fsub

    dec_out[:] = dec
    opq_out[:] = opq
    fsub_out[:] = fsub


@functools.partial(
    jax.jit,
    static_argnames=(
        "backface_culling", "ray_tile", "use_aabb", "interpret", "block_has_trans",
    ),
)
def pallas_occlude_triangles(
    tri_woop, tri_nsq, tri_valid, tri_httr, tri_normal3,
    tri_ior, tri_op, tri_met, tri_colr, tri_absn, tri_aabb,
    o, d, max_distance, backface_culling=False, ray_tile=256, use_aabb=True,
    interpret=False, block_has_trans=(),
):
    """Shadow accumulators over triangle blocks: returns
    (opacity_decrement_sum (R,), any_opaque (R,) bool, filter_sub (R,3))."""
    R = o.shape[0]
    nb, _, B = tri_woop.shape
    assert R % ray_tile == 0, (R, ray_tile)
    o4 = jnp.concatenate([o, jnp.ones((R, 1), o.dtype)], axis=1)
    maxd = max_distance[:, None]

    def full(s):
        return pl.BlockSpec(s, lambda i: tuple(0 for _ in s), memory_space=pltpu.VMEM)

    def ray(s):
        return pl.BlockSpec(s, lambda i: (i, 0), memory_space=pltpu.VMEM)

    dec, opq, fsub = pl.pallas_call(
        functools.partial(
            _occlude_kernel,
            nb=nb,
            backface_culling=backface_culling,
            use_aabb=use_aabb,
            block_has_trans=block_has_trans,
        ),
        grid=(R // ray_tile,),
        in_specs=[
            ray((ray_tile, 4)),
            ray((ray_tile, 3)),
            ray((ray_tile, 1)),
            full((nb, 12, B)),
            full((nb, 1, B)),
            full((nb, 1, B)),
            full((nb, 1, B)),
            full((nb, 3, B)),
            full((nb, 1, B)),
            full((nb, 1, B)),
            full((nb, 1, B)),
            full((nb, 1, B)),
            full((nb, 3, B)),
            full((nb, 8)),
        ],
        out_specs=[
            ray((ray_tile, 1)),
            ray((ray_tile, 1)),
            ray((ray_tile, 3)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
            jax.ShapeDtypeStruct((R, 3), jnp.float32),
        ],
        interpret=interpret,
    )(
        o4, d, maxd, tri_woop, tri_nsq[:, None], tri_valid[:, None],
        tri_httr[:, None], tri_normal3,
        tri_ior[:, None], tri_op[:, None], tri_met[:, None], tri_colr[:, None],
        tri_absn, tri_aabb,
    )
    return dec[:, 0], opq[:, 0] > 0.0, fsub


# ---------------------------------------------------------------------------
# Fused direct-lighting kernel: for each ray, loop the lights in-kernel,
# run the full shadow-occlusion scan (spheres + triangle blocks) and the
# reference's shading math (ref raytracer_renderer.rs:731-874,
# light.rs:261-300, raytracer.rs:24-106), accumulating direct+specular —
# one launch instead of per-light occlusion launches plus XLA shading glue.
# ---------------------------------------------------------------------------


def _sphere_occl_planes(sph, o, d, maxd, backface_culling=False):
    """Sphere shadow accumulators from the packed (16,128) sphere planes.
    Returns (dec (RT,1), opq (RT,1), fsub (RT,3))."""
    cx = sph[0][None, :]
    cy = sph[1][None, :]
    cz = sph[2][None, :]
    rsq = sph[3][None, :]
    ior = sph[4][None, :]
    opv = sph[5][None, :]
    met = sph[6][None, :]
    colr = sph[7][None, :]
    httr = sph[8][None, :] != 0.0
    valid_s = sph[12][None, :] != 0.0

    ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]
    dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]
    vx, vy, vz = ox - cx, oy - cy, oz - cz  # (RT,S)
    b = 2.0 * (dx * vx + dy * vy + dz * vz)
    c = vx * vx + vy * vy + vz * vz - rsq
    disc = b * b - 4.0 * c
    disc_pos = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (-b - sq) * 0.5
    t1 = (-b + sq) * 0.5
    t0v = (t0 >= 0.0) & disc_pos
    t1v = (t1 >= 0.0) & disc_pos
    use0 = t0v & (~t1v | (t0 < t1))
    use1 = t1v & ~use0
    t = jnp.where(use0, t0, jnp.where(use1, t1, INF))
    sval = (use0 | use1) & valid_s

    # normal at hit for the shadow fresnel (raytracer.rs:57-74)
    t_safe = jnp.where(sval, t, 0.0)
    px, py_, pz = ox + dx * t_safe, oy + dy * t_safe, oz + dz * t_safe
    nx, ny, nz = px - cx, py_ - cy, pz - cz
    inv_n = 1.0 / jnp.sqrt(nx * nx + ny * ny + nz * nz)
    cos_nv = -(dx * nx + dy * ny + dz * nz) * inv_n
    if backface_culling:
        # ref sphere.rs:137-151 via the shared intersect impl
        sval &= (-cos_nv < 0.75) | httr
    hit = sval & (t <= maxd)

    cos_theta = jnp.abs(cos_nv)
    is_inside = cos_nv < 0.0
    eta_t = jnp.where(is_inside, ior, 1.0 / ior)
    sin2_t = eta_t * eta_t * (1.0 - cos_theta * cos_theta)
    is_refl = met > 0.0
    is_tir = (httr & is_inside & (sin2_t > 1.0)) | is_refl
    f0 = ((1.0 - ior) / (1.0 + ior)) ** 2
    f0r = f0 + (colr - f0) * met
    omc = 1.0 - cos_theta
    fres_r = f0r + (1.0 - f0r) * omc * omc * omc * omc * omc
    f_r = jnp.where(is_tir, jnp.where(is_refl, met, 1.0), fres_r)
    t_red = jnp.where(httr, 1.0 - f_r, 0.0)
    io = jnp.where(httr, opv, 0.0) * t_red

    hit_f = jnp.where(hit, 1.0, 0.0)
    dec = jnp.sum(hit_f * (1.0 - io), axis=1, keepdims=True)
    opq = jnp.max(jnp.where(hit & ~httr, 1.0, 0.0), axis=1, keepdims=True)
    fsub = jnp.concatenate(
        [
            jnp.sum(hit_f * sph[9][None, :], axis=1, keepdims=True),
            jnp.sum(hit_f * sph[10][None, :], axis=1, keepdims=True),
            jnp.sum(hit_f * sph[11][None, :], axis=1, keepdims=True),
        ],
        axis=1,
    )
    return dec, opq, fsub


def _tri_occl_unrolled(
    woop_ref, nsq_ref, valid_ref, httr_ref, tnorm_ref, ior_ref, op_ref, met_ref,
    colr_ref, absn_ref, aabb_ref, o4, d, maxd, dec, opq, fsub,
    *, nb, backface_culling, use_aabb, block_has_trans,
):
    o3 = o4[:, 0:3]
    maxd_all = jnp.max(maxd)
    RT = o4.shape[0]
    for b in range(nb):
        trans_block = block_has_trans[b] if block_has_trans else True

        def compute(_, b=b, trans_block=trans_block):
            woop = woop_ref[b]
            t, valid = _tri_validity(woop, nsq_ref[b, 0], valid_ref[b, 0], o4, d)
            httr = httr_ref[b, 0][None, :] != 0.0
            if backface_culling or trans_block:
                tn = tnorm_ref[b]
                cos_nv = -_cos_planes(d, tn)
            if backface_culling:
                valid &= (-cos_nv < 0.75) | httr
            hit = valid & (t <= maxd)
            if trans_block:
                ior = ior_ref[b, 0][None, :]
                met = met_ref[b, 0][None, :]
                col_r = colr_ref[b, 0][None, :]
                opv = op_ref[b, 0][None, :]
                cos_theta = jnp.abs(cos_nv)
                is_inside = cos_nv < 0.0
                eta_t = jnp.where(is_inside, ior, 1.0 / ior)
                sin2_t = eta_t * eta_t * (1.0 - cos_theta * cos_theta)
                is_refl = met > 0.0
                is_tir = (httr & is_inside & (sin2_t > 1.0)) | is_refl
                f0 = ((1.0 - ior) / (1.0 + ior)) ** 2
                f0r = f0 + (col_r - f0) * met
                omc = 1.0 - cos_theta
                fres_r = f0r + (1.0 - f0r) * omc * omc * omc * omc * omc
                f_r = jnp.where(is_tir, jnp.where(is_refl, met, 1.0), fres_r)
                t_red = jnp.where(httr, 1.0 - f_r, 0.0)
                io = jnp.where(httr, opv, 0.0) * t_red
            else:
                io = jnp.float32(0.0)
            hit_f = jnp.where(hit, 1.0, 0.0)
            d_dec = jnp.sum(hit_f * (1.0 - io), axis=1, keepdims=True)
            d_opq = jnp.max(jnp.where(hit & ~httr, 1.0, 0.0), axis=1, keepdims=True)
            absn = absn_ref[b]
            d_fsub = jnp.concatenate(
                [
                    jnp.sum(hit_f * absn[0][None, :], axis=1, keepdims=True),
                    jnp.sum(hit_f * absn[1][None, :], axis=1, keepdims=True),
                    jnp.sum(hit_f * absn[2][None, :], axis=1, keepdims=True),
                ],
                axis=1,
            )
            return d_dec, d_opq, d_fsub

        if use_aabb:
            hit_blk = _block_aabb_hit(aabb_ref[b], o3, d, maxd_all) & (jnp.min(opq) < 1.0)
            d_dec, d_opq, d_fsub = jax.lax.cond(
                hit_blk,
                compute,
                lambda _: (jnp.zeros((RT, 1), jnp.float32),
                           jnp.zeros((RT, 1), jnp.float32),
                           jnp.zeros((RT, 3), jnp.float32)),
                0,
            )
        else:
            d_dec, d_opq, d_fsub = compute(0)
        dec = dec + d_dec
        opq = jnp.maximum(opq, d_opq)
        fsub = fsub + d_fsub
    return dec, opq, fsub


def _light_shade_kernel(
    lights_ref, sph_ref,
    woop_ref, nsq_ref, valid_ref, httr_ref, tnorm_ref, ior_ref, op_ref, met_ref,
    colr_ref, absn_ref, aabb_ref,
    point_ref, normal_ref, view_ref, color_ref, met_r_ref, shin_ref, valid_r_ref,
    direct_out, spec_out,
    *, n_lights, nb, eps_dist, backface_culling, use_aabb, block_has_trans,
):
    point = point_ref[:]
    normal = normal_ref[:]
    view = view_ref[:]
    mat_color = color_ref[:]
    metallic = met_r_ref[:]  # (RT,1) — unused in lighting, kept for layout
    shininess = shin_ref[:]
    valid = valid_r_ref[:] != 0.0  # (RT,1)
    RT = point.shape[0]

    has_spec = shininess > 0.0
    spec_exp = jnp.maximum(shininess * 512.0, 1.0)

    def light_body(l, acc):
        direct, spec_acc = acc
        row = lights_ref[l]  # (8,)
        lpos = row[0:3]
        lcolor = row[3:6]
        lint = row[6]

        ltp = lpos[None, :] - point  # (RT,3)
        lt2 = jnp.sum(ltp * ltp, axis=1, keepdims=True)
        ldir = ltp * (1.0 / jnp.sqrt(lt2))
        so = point + ldir * eps_dist
        delta = lpos[None, :] - so
        # zero max-distance on invalid lanes so the per-tile segment prune
        # (maxd_all) isn't poisoned by parked rays
        maxd = jnp.where(valid, jnp.sqrt(jnp.sum(delta * delta, axis=1, keepdims=True)), 0.0)

        dec, opq, fsub = _sphere_occl_planes(sph_ref[:], so, ldir, maxd, backface_culling)
        o4 = jnp.concatenate([so, jnp.ones((RT, 1), so.dtype)], axis=1)
        dec, opq, fsub = _tri_occl_unrolled(
            woop_ref, nsq_ref, valid_ref, httr_ref, tnorm_ref, ior_ref, op_ref,
            met_ref, colr_ref, absn_ref, aabb_ref, o4, ldir, maxd,
            dec, opq, fsub,
            nb=nb, backface_culling=backface_culling, use_aabb=use_aabb,
            block_has_trans=block_has_trans,
        )
        combined_opacity = jnp.clip(1.0 - dec, 0.0, 1.0)
        color_filter = 1.0 - fsub
        can_reach = (opq < 1.0) & valid

        # PointLight::calculate_contribution_at (light.rs:261-300)
        light_distance = jnp.sqrt(lt2) + F32_EPSILON
        cos_in = jnp.sum(ltp * normal, axis=1, keepdims=True) / light_distance
        angle_pos = cos_in > 0.0
        att = 0.95 * (F32_EPSILON + light_distance + light_distance * light_distance)
        att_sig = (jnp.tanh(att) + 1.0) / 2.0
        ci = jnp.where(angle_pos, cos_in * lint * jnp.clip(att_sig, 0.0, 1.0), 0.0)
        ccol = jnp.where(angle_pos, mat_color * lcolor[None, :], 0.0)

        lcs = jnp.where(can_reach, ccol / color_filter, ccol)
        diffuse = jnp.maximum(jnp.sum(normal * ldir, axis=1, keepdims=True), 0.0)

        sr = ldir - 2.0 * jnp.sum(ldir * normal, axis=1, keepdims=True) * normal
        sr_n = sr * (1.0 / jnp.sqrt(jnp.sum(sr * sr, axis=1, keepdims=True)))
        spec_v = jnp.maximum(jnp.sum(sr_n * view, axis=1, keepdims=True), 0.0) ** spec_exp
        spec_f = jnp.where(has_spec, spec_v, 0.0)

        op_sel = jnp.where(can_reach, combined_opacity, 1.0)
        lf = diffuse * ci * op_sel
        sf = ci * op_sel * spec_f
        lvalid = (diffuse > 0.0) & can_reach

        direct = direct + jnp.where(lvalid & valid, mat_color * lcs * lf, 0.0)
        spec_acc = spec_acc + jnp.where(
            lvalid & valid & has_spec, lcolor[None, :] * sf, 0.0
        )
        return direct, spec_acc

    direct, spec_acc = jax.lax.fori_loop(
        0, n_lights, light_body,
        (jnp.zeros((RT, 3), jnp.float32), jnp.zeros((RT, 3), jnp.float32)),
    )
    direct_out[:] = direct
    spec_out[:] = spec_acc


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_lights", "eps_dist", "backface_culling", "ray_tile", "use_aabb",
        "interpret", "block_has_trans",
    ),
)
def pallas_light_shade(
    light_pack, sph_pack,
    tri_woop, tri_nsq, tri_valid, tri_httr, tri_normal3,
    tri_ior, tri_op, tri_met, tri_colr, tri_absn, tri_aabb,
    point, normal, view, color, metallic, shininess, valid,
    n_lights, eps_dist, backface_culling=False, ray_tile=256, use_aabb=True,
    interpret=False, block_has_trans=(),
):
    """Direct + specular lighting for R rays over n_lights point lights
    (shadow occlusion + shading fused). Returns (direct (R,3), spec (R,3))."""
    R = point.shape[0]
    nb, _, B = tri_woop.shape
    assert R % ray_tile == 0, (R, ray_tile)
    L_pad = light_pack.shape[0]

    def full(s):
        return pl.BlockSpec(s, lambda i: tuple(0 for _ in s), memory_space=pltpu.VMEM)

    def ray(s):
        return pl.BlockSpec(s, lambda i: (i, 0), memory_space=pltpu.VMEM)

    direct, spec = pl.pallas_call(
        functools.partial(
            _light_shade_kernel,
            n_lights=n_lights,
            nb=nb,
            eps_dist=eps_dist,
            backface_culling=backface_culling,
            use_aabb=use_aabb,
            block_has_trans=block_has_trans,
        ),
        grid=(R // ray_tile,),
        in_specs=[
            full((L_pad, 8)),
            full((16, 128)),
            full((nb, 12, B)),
            full((nb, 1, B)),
            full((nb, 1, B)),
            full((nb, 1, B)),
            full((nb, 3, B)),
            full((nb, 1, B)),
            full((nb, 1, B)),
            full((nb, 1, B)),
            full((nb, 1, B)),
            full((nb, 3, B)),
            full((nb, 8)),
            ray((ray_tile, 3)),
            ray((ray_tile, 3)),
            ray((ray_tile, 3)),
            ray((ray_tile, 3)),
            ray((ray_tile, 1)),
            ray((ray_tile, 1)),
            ray((ray_tile, 1)),
        ],
        out_specs=[ray((ray_tile, 3)), ray((ray_tile, 3))],
        out_shape=[
            jax.ShapeDtypeStruct((R, 3), jnp.float32),
            jax.ShapeDtypeStruct((R, 3), jnp.float32),
        ],
        interpret=interpret,
    )(
        light_pack, sph_pack,
        tri_woop, tri_nsq[:, None], tri_valid[:, None], tri_httr[:, None],
        tri_normal3, tri_ior[:, None], tri_op[:, None], tri_met[:, None],
        tri_colr[:, None], tri_absn, tri_aabb,
        point, normal, view, color, metallic, shininess, valid,
    )
    return direct, spec
