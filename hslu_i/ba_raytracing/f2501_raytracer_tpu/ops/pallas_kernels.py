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
(tile, block) cell. Each block carries a Morton-tight AABB; per-ray slab
gates skip blocks no ray in the tile still needs (`lax.cond`), the TPU
analogue of an acceleration structure's node rejection — the reference
itself scans every object for every ray (SURVEY.md §3.4).

Shape discipline: the VPU operates on (8, 128) register tiles, so an op on
an (RT, 1) or (RT, 3) array costs as much as one on (RT, 128) — 97% of the
lanes idle. All per-ray quantities in the occlusion/lighting path therefore
live as FLAT (RT,) component vectors ("component-planar" form), and the
per-(ray, block) AABB gates for ALL blocks are computed in one wide
(RT, n_blocks) pass per light instead of per-block (RT, 3) slab tests.

Semantics are identical to ops/intersect.py (same reference citations).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .vecmath import F32_EPSILON


def _vmem_params(ray_tile):
    """Mosaic compiler params for the ray-tile kernels: tiles past 256 rays
    overflow the default 16 MiB scoped-vmem budget (the flipped (B, RT)
    pair tiles and the unrolled per-light carries are all live at once), so
    raise the cap toward the chip's 128 MiB VMEM. Measured: RT=1024 was
    411 KiB over the 16 MiB default (PERF.md round 3)."""
    if ray_tile <= 256:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)

# plain python literals: jnp constants would be captured tracers
INF = float("inf")
BIG_IDX = 2**31 - 1


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


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


def _pair_tuv_comp(woop, ox, oy, oz, dx, dy, dz):
    """_pair_tuv with the ray origin/direction as flat (RT,) components
    (the homogeneous 1-coordinate folds into adding the b-row directly)."""

    def tfo(k0):
        return (
            ox[:, None] * woop[k0][None, :]
            + oy[:, None] * woop[k0 + 3][None, :]
            + oz[:, None] * woop[k0 + 6][None, :]
            + woop[k0 + 9][None, :]
        )

    def tfd(k0):
        return (
            dx[:, None] * woop[k0][None, :]
            + dy[:, None] * woop[k0 + 3][None, :]
            + dz[:, None] * woop[k0 + 6][None, :]
        )

    u_o, v_o, w_o = tfo(0), tfo(1), tfo(2)
    u_d, v_d, w_d = tfd(0), tfd(1), tfd(2)
    t = -w_o / w_d
    u = u_o + t * u_d
    v = v_o + t * v_d
    return t, u, v, w_d


def _block_gate(aabb_row, o, d, t_limit):
    """Per-ray AABB gate: does each ray's segment [0, t_limit] cross this
    block's AABB? `t_limit` is per-ray (RT,) (or scalar); rays whose limit
    excludes the box (occluded / light reached first / parked lanes) drop
    out individually, so a coherent tile can skip the whole block.
    aabb_row: (8,) = [min xyz | max xyz | pad]. NaN-robust slab test: a zero
    direction component with the origin exactly on that slab plane yields
    0*inf=NaN; mapping NaN lo/hi to -inf/+inf treats that degenerate lane as
    inside the slab, so the cull stays conservative (never a wrong miss)."""
    inv = 1.0 / d  # (RT,3); ±inf on zero components
    t1 = (aabb_row[0:3][None, :] - o) * inv
    t2 = (aabb_row[3:6][None, :] - o) * inv
    lo = jnp.minimum(t1, t2)
    hi = jnp.maximum(t1, t2)
    lo = jnp.where(jnp.isnan(lo), -INF, lo)
    hi = jnp.where(jnp.isnan(hi), INF, hi)
    tnear = jnp.max(lo, axis=1)
    tfar = jnp.min(hi, axis=1)
    return (tfar >= jnp.maximum(tnear, 0.0)) & (tnear <= t_limit)


def _block_aabb_hit(aabb_row, o, d, t_limit):
    """Tile-level cull: ANY ray's segment crosses this block's AABB."""
    return jnp.any(_block_gate(aabb_row, o, d, t_limit))


def _gate_flat(box_ref, b, ox, oy, oz, invx, invy, invz, t_limit):
    """Per-ray gate for ONE block, flat (RT,) form: box_ref is an SMEM
    (n, 8) AABB table (scalar reads), b a python int. ~25 flat VPU ops.
    Same NaN-robust slab semantics as `_block_gate`."""
    tn, tf = None, None
    for c, (oc, ic) in enumerate(((ox, invx), (oy, invy), (oz, invz))):
        t1 = (box_ref[b, c] - oc) * ic
        t2 = (box_ref[b, c + 3] - oc) * ic
        lo = jnp.minimum(t1, t2)
        hi = jnp.maximum(t1, t2)
        lo = jnp.where(jnp.isnan(lo), -INF, lo)
        hi = jnp.where(jnp.isnan(hi), INF, hi)
        tn = lo if tn is None else jnp.maximum(tn, lo)
        tf = hi if tf is None else jnp.minimum(tf, hi)
    return (tf >= jnp.maximum(tn, 0.0)) & (tn <= t_limit)


def _superblock_groups(nb, sb_sizes):
    """Static superblock partition: group g covers sb_sizes[g] consecutive
    blocks (matches tri_saabb rows, scene/device.py). Empty sb_sizes means
    no hierarchy info: every block is its own (ungated) group."""
    if not sb_sizes:
        return [range(b, b + 1) for b in range(nb)]
    assert sum(sb_sizes) == nb, (sb_sizes, nb)
    out, s = [], 0
    for n in sb_sizes:
        out.append(range(s, s + n))
        s += n
    return out


def _tri_validity(woop, nsq, tval, o4, d):
    t, u, v, w_d = _pair_tuv(woop, o4, d)
    return t, _tri_valid_mask(t, u, v, w_d, nsq, tval)


def _tri_validity_comp(woop, nsq, tval, ox, oy, oz, dx, dy, dz):
    t, u, v, w_d = _pair_tuv_comp(woop, ox, oy, oz, dx, dy, dz)
    return t, _tri_valid_mask(t, u, v, w_d, nsq, tval)


def _tri_valid_mask(t, u, v, w_d, nsq, tval):
    det = w_d * nsq[None, :]
    return (
        (t > F32_EPSILON)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v < 1.0)
        & (jnp.abs(det) > F32_EPSILON)
        & (tval[None, :] != 0.0)
    )


def _cos_planes(d, tn):
    return (
        d[:, 0:1] * tn[0][None, :]
        + d[:, 1:2] * tn[1][None, :]
        + d[:, 2:3] * tn[2][None, :]
    )


def _cos_planes_comp(dx, dy, dz, tn):
    return (
        dx[:, None] * tn[0][None, :]
        + dy[:, None] * tn[1][None, :]
        + dz[:, None] * tn[2][None, :]
    )


# ---------------------------------------------------------------------------
# Big-primitive sublane pack: walls/floors with room-sized AABBs can never
# be culled, so packing P of them onto the SUBLANE axis (trb_pack (P_pad,32),
# scene/device.py) makes their unconditional pair math cost ceil(P/8)
# sublane rows per VPU op instead of a full B-lane Morton block.
# ---------------------------------------------------------------------------


def _bigtri_tuv(trb, sox, soy, soz, dx, dy, dz):
    """Woop transform on the (P, RT) pack tile: coefficient columns (P,1)
    against flat (RT,) ray components. Lane layout: 3k+c, b at 9-11."""

    def col(i):
        return trb[:, i : i + 1]

    def tfo(c):
        return (
            sox[None, :] * col(c)
            + soy[None, :] * col(3 + c)
            + soz[None, :] * col(6 + c)
            + col(9 + c)
        )

    def tfd(c):
        return dx[None, :] * col(c) + dy[None, :] * col(3 + c) + dz[None, :] * col(6 + c)

    u_o, v_o, w_o = tfo(0), tfo(1), tfo(2)
    u_d, v_d, w_d = tfd(0), tfd(1), tfd(2)
    t = -w_o / w_d
    u = u_o + t * u_d
    v = v_o + t * v_d
    return t, u, v, w_d


def _bigtri_validity(trb, sox, soy, soz, dx, dy, dz):
    """(t, valid, httr) on the (P, RT) pack tile (no backface term)."""
    t, u, v, w_d = _bigtri_tuv(trb, sox, soy, soz, dx, dy, dz)
    det = w_d * trb[:, 12:13]
    valid = (
        (t > F32_EPSILON)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v < 1.0)
        & (jnp.abs(det) > F32_EPSILON)
        & (trb[:, 13:14] != 0.0)
    )
    return t, valid, trb[:, 14:15] != 0.0


def _bigtri_occl_comp(trb, sox, soy, soz, dx, dy, dz, maxd, backface_culling, with_trans):
    """Shadow accumulators from the big-primitive pack; same semantics as
    `_tri_occl_comp`'s per-block compute (raytracer.rs:24-106). Returns
    (dec, opq, fr, fg, fb), all (RT,)."""
    t, valid, httr = _bigtri_validity(trb, sox, soy, soz, dx, dy, dz)
    if backface_culling or with_trans:
        cos_nv = -(
            dx[None, :] * trb[:, 15:16]
            + dy[None, :] * trb[:, 16:17]
            + dz[None, :] * trb[:, 17:18]
        )
    if backface_culling:
        valid &= (-cos_nv < 0.75) | httr
    hit = valid & (t <= maxd[None, :])
    if with_trans:
        # shadow Fresnel transmittance, red channel (material.rs:467-525
        # with other_ior=1; raytracer.rs:57-74)
        ior = trb[:, 18:19]
        opv = trb[:, 19:20]
        met = trb[:, 20:21]
        col_r = trb[:, 21:22]
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
    return (
        jnp.sum(hit_f * (1.0 - io), axis=0),
        jnp.max(jnp.where(hit & ~httr, 1.0, 0.0), axis=0),
        jnp.sum(hit_f * trb[:, 22:23], axis=0),
        jnp.sum(hit_f * trb[:, 23:24], axis=0),
        jnp.sum(hit_f * trb[:, 24:25], axis=0),
    )


# ---------------------------------------------------------------------------
# Nearest-hit cast kernel
# ---------------------------------------------------------------------------


def _cast_kernel(
    op_ref, dp_ref, trb_ref, pack_ref, aabb_ref, saabb_ref, t_out, idx_out,
    *, nb, block_size, bigtri_slots, backface_culling, use_aabb, sb_sizes,
):
    # ---- big-primitive pack: nearest hit on the (P, RT) sublane tile ----
    # local index space: big primitive p -> p, Morton block b column c ->
    # bigtri_slots + b*B + c (the caller adds the sphere offset). All math
    # runs from the PLANAR (3, RT) ray inputs in the flipped (prims, RT)
    # orientation — triangles/primitives on sublanes, rays on lanes.
    trb = trb_ref[:]
    sox, soy, soz = op_ref[0], op_ref[1], op_ref[2]
    dlx, dly, dlz = dp_ref[0], dp_ref[1], dp_ref[2]
    bt, bvalid, bhttr = _bigtri_validity(trb, sox, soy, soz, dlx, dly, dlz)
    if backface_culling:
        cos_dn = (
            dlx[None, :] * trb[:, 15:16]
            + dly[None, :] * trb[:, 16:17]
            + dlz[None, :] * trb[:, 17:18]
        )
        bvalid &= (cos_dn < 0.75) | bhttr
    bt = jnp.where(bvalid, bt, INF)
    bt_min = jnp.min(bt, axis=0)  # (RT,)
    rows = jax.lax.broadcasted_iota(jnp.int32, bt.shape, 0)
    bidx = jnp.min(
        jnp.where(bt == bt_min[None, :], rows, jnp.int32(BIG_IDX)), axis=0
    )

    # running minimum carried in registers as flat (RT,) lane vectors;
    # outputs written once at the end (read-modify-write of output VMEM per
    # block serialized the kernel ~1000x, PERF.md)
    carry = (
        bt_min,                                         # best_t (RT,)
        jnp.where(jnp.isfinite(bt_min), bidx, BIG_IDX),  # best_idx (RT,)
    )
    if use_aabb:
        invx, invy, invz = 1.0 / dlx, 1.0 / dly, 1.0 / dlz

    # ---- Morton blocks: ROLLED fori over the (nb, B, 32) cast pack in the
    # flipped (B, RT) layout — one loop body serves every block (the
    # unrolled per-block form thrashed instruction memory; the planar
    # (RT, B=64) tiles ran half-width — PERF.md round 3)
    def compute(b, c):
        best_t, best_idx = c
        blk = pack_ref[b]  # (B, 32) dynamic block read
        t, valid, httr = _bigtri_validity(blk, sox, soy, soz, dlx, dly, dlz)
        if backface_culling:
            cos_dn = (
                dlx[None, :] * blk[:, 15:16]
                + dly[None, :] * blk[:, 16:17]
                + dlz[None, :] * blk[:, 17:18]
            )
            valid &= (cos_dn < 0.75) | httr
        t = jnp.where(valid, t, INF)
        tmin = jnp.min(t, axis=0)  # (RT,)
        trows = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
        idx = jnp.min(
            jnp.where(
                t == tmin[None, :],
                trows + (bigtri_slots + b * block_size),
                jnp.int32(BIG_IDX),
            ),
            axis=0,
        )
        closer = tmin < best_t
        return jnp.where(closer, tmin, best_t), jnp.where(closer, idx, best_idx)

    def run_block(b, c):
        if not use_aabb:
            return compute(b, c)
        # per-ray t-limit: a block farther than THIS ray's current best hit
        # can't improve it; blocks are stored front-to-back so best_t
        # tightens early (scene/device.py)
        gate = jnp.any(
            _gate_flat(aabb_ref, b, sox, soy, soz, invx, invy, invz, c[0])
        )
        return jax.lax.cond(gate, lambda cc: compute(b, cc), lambda cc: cc, c)

    groups = _superblock_groups(nb, sb_sizes)
    for gi, grp in enumerate(groups):

        def run_group(c, grp=grp):
            return jax.lax.fori_loop(grp.start, grp.stop, run_block, c)

        if use_aabb and len(grp) > 1:
            # two-level cull: one slab test skips the whole superblock
            gate = jnp.any(
                _gate_flat(
                    saabb_ref, gi, sox, soy, soz, invx, invy, invz, carry[0]
                )
            )
            carry = jax.lax.cond(gate, run_group, lambda c: c, carry)
        else:
            carry = run_group(carry)

    t_out[:] = carry[0][None, :]
    idx_out[:] = carry[1][None, :]


@functools.partial(
    jax.jit,
    static_argnames=(
        "backface_culling", "ray_tile", "use_aabb", "interpret", "sb_sizes",
    ),
)
def pallas_cast_triangles(
    trb_pack, tri_cast_pack, tri_aabb, tri_saabb, o, d,
    backface_culling=False, ray_tile=256, use_aabb=True,
    interpret=False, sb_sizes=(),
):
    """Nearest triangle hit over the big-primitive pack + Morton blocks:
    (t (R,), local_tri_idx (R,)) where big primitive p -> p and Morton slot
    s -> P_pad + s. The whole triangle SoA lives in VMEM; R must be a
    multiple of ray_tile."""
    R = o.shape[0]
    nb, B, _ = tri_cast_pack.shape
    P_pad = trb_pack.shape[0]
    assert R % ray_tile == 0, (R, ray_tile)

    def full(s):
        return pl.BlockSpec(s, lambda i: tuple(0 for _ in s), memory_space=pltpu.VMEM)

    def smem(s):
        return pl.BlockSpec(s, lambda i: tuple(0 for _ in s), memory_space=pltpu.SMEM)

    def rayt(s):  # per-ray planes: rays on the LANE axis
        return pl.BlockSpec(s, lambda i: (0, i), memory_space=pltpu.VMEM)

    t_out, idx_out = pl.pallas_call(
        functools.partial(
            _cast_kernel,
            nb=nb,
            block_size=B,
            bigtri_slots=P_pad,
            backface_culling=backface_culling,
            use_aabb=use_aabb,
            sb_sizes=sb_sizes,
        ),
        grid=(R // ray_tile,),
        in_specs=[
            rayt((3, ray_tile)),
            rayt((3, ray_tile)),
            full(trb_pack.shape),
            full((nb, B, 32)),
            smem(tri_aabb.shape),
            smem(tri_saabb.shape),
        ],
        out_specs=[rayt((1, ray_tile)), rayt((1, ray_tile))],
        out_shape=[
            jax.ShapeDtypeStruct((1, R), jnp.float32),
            jax.ShapeDtypeStruct((1, R), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=_vmem_params(ray_tile),
    )(o.T, d.T, trb_pack, tri_cast_pack, tri_aabb, tri_saabb)
    return t_out[0], idx_out[0]


# ---------------------------------------------------------------------------
# Streaming variants: scenes past the VMEM-residency ceiling (~80k
# triangles) stream their Morton blocks from HBM instead. The grid is 2-D
# (block OUTER, ray tile inner): each block's SoA planes are DMA'd exactly
# once (the window index only moves when `b` does, and Mosaic double-buffers
# the next block while the current one computes), while per-ray running
# state for the WHOLE wavefront persists in VMEM scratch across grid steps.
# Outputs are written on the last block. Spheres and the big-primitive pack
# stay on the XLA path (they are small); these kernels cover Morton slots
# only. Per-block compute gates still skip the math (not the DMA) when no
# ray's segment crosses the block AABB. Parity: same per-block math and
# same front-to-back strict-min combine as the resident kernels.
# ---------------------------------------------------------------------------


def _cast_stream_kernel(
    o4_ref, d_ref, op_ref, dp_ref, woop_ref, nsq_ref, valid_ref, httr_ref,
    tnorm_ref, aabb_ref, t_out, idx_out, bt_scr, bi_scr,
    *, nb, block_size, backface_culling, use_aabb, ray_tile,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    o4 = o4_ref[:]
    d = d_ref[:]
    RT = o4.shape[0]

    # scratch rows are lane-major (n_rt, RT) — a (R, 1) scratch would pad
    # its lane dim to 128 in the (8,128) tiled layout, 128x the VMEM —
    # so the (RT, 1) running minima relayout at the read/write boundary
    @pl.when(b == 0)
    def _init():
        bt_scr[pl.ds(i, 1), :] = jnp.full((1, RT), INF, jnp.float32)
        bi_scr[pl.ds(i, 1), :] = jnp.full((1, RT), BIG_IDX, jnp.int32)

    carry = (
        bt_scr[pl.ds(i, 1), :].reshape(RT, 1),
        bi_scr[pl.ds(i, 1), :].reshape(RT, 1),
    )

    def compute(c):
        best_t, best_idx = c
        woop = woop_ref[0]
        t, valid = _tri_validity(woop, nsq_ref[0, 0], valid_ref[0, 0], o4, d)
        if backface_culling:
            cos_dn = _cos_planes(d, tnorm_ref[0])
            valid &= (cos_dn < 0.75) | (httr_ref[0, 0][None, :] != 0.0)
        t = jnp.where(valid, t, INF)
        tmin = jnp.min(t, axis=1, keepdims=True)
        cols = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
        idx = jnp.min(
            jnp.where(t == tmin, cols + b * block_size, jnp.int32(BIG_IDX)),
            axis=1,
            keepdims=True,
        )
        closer = tmin < best_t
        return jnp.where(closer, tmin, best_t), jnp.where(closer, idx, best_idx)

    if use_aabb:
        sox, soy, soz = op_ref[0], op_ref[1], op_ref[2]
        dx, dy, dz = dp_ref[0], dp_ref[1], dp_ref[2]
        gate = _gate_flat(
            aabb_ref, b, sox, soy, soz, 1.0 / dx, 1.0 / dy, 1.0 / dz,
            carry[0][:, 0],
        )
        carry = jax.lax.cond(jnp.any(gate), compute, lambda c: c, carry)
    else:
        carry = compute(carry)

    bt_scr[pl.ds(i, 1), :] = carry[0].reshape(1, RT)
    bi_scr[pl.ds(i, 1), :] = carry[1].reshape(1, RT)

    @pl.when(b == nb - 1)
    def _fin():
        t_out[:] = carry[0]
        idx_out[:] = carry[1]


@functools.partial(
    jax.jit,
    static_argnames=("backface_culling", "ray_tile", "use_aabb", "interpret"),
)
def pallas_cast_triangles_stream(
    tri_woop, tri_nsq, tri_valid, tri_httr, tri_normal3, tri_aabb,
    o, d, backface_culling=False, ray_tile=256, use_aabb=True, interpret=False,
):
    """Nearest Morton-slot hit with HBM-streamed blocks: (t (R,),
    local_slot_idx (R,)). The caller folds spheres and big primitives."""
    R = o.shape[0]
    nb, _, B = tri_woop.shape
    assert R % ray_tile == 0, (R, ray_tile)
    o4 = jnp.concatenate([o, jnp.ones((R, 1), o.dtype)], axis=1)

    def ray(s):
        return pl.BlockSpec(s, lambda b, i: (i, 0), memory_space=pltpu.VMEM)

    def rayt(s):
        return pl.BlockSpec(s, lambda b, i: (0, i), memory_space=pltpu.VMEM)

    def blk(s):
        return pl.BlockSpec(
            (1,) + s, lambda b, i: (b,) + tuple(0 for _ in s),
            memory_space=pltpu.VMEM,
        )

    t_out, idx_out = pl.pallas_call(
        functools.partial(
            _cast_stream_kernel,
            nb=nb,
            block_size=B,
            backface_culling=backface_culling,
            use_aabb=use_aabb,
            ray_tile=ray_tile,
        ),
        grid=(nb, R // ray_tile),
        in_specs=[
            ray((ray_tile, 4)),
            ray((ray_tile, 3)),
            rayt((3, ray_tile)),
            rayt((3, ray_tile)),
            blk((12, B)),
            blk((1, B)),
            blk((1, B)),
            blk((1, B)),
            blk((3, B)),
            pl.BlockSpec(
                tri_aabb.shape, lambda b, i: (0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((ray_tile, 1), lambda b, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ray_tile, 1), lambda b, i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
            jax.ShapeDtypeStruct((R, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R // ray_tile, ray_tile), jnp.float32),
            pltpu.VMEM((R // ray_tile, ray_tile), jnp.int32),
        ],
        interpret=interpret,
    )(o4, d, o.T, d.T, tri_woop, tri_nsq[:, None], tri_valid[:, None],
      tri_httr[:, None], tri_normal3, tri_aabb)
    return t_out[:, 0], idx_out[:, 0]


def _occl_stream_kernel(
    o_ref, d_ref, maxd_ref, woop_ref, nsq_ref, valid_ref, httr_ref, tnorm_ref,
    ior_ref, op_ref, met_ref, colr_ref, absn_ref, aabb_ref, httbl_ref,
    dec_out, opq_out, fsub_out,
    dec_scr, opq_scr, fr_scr, fg_scr, fb_scr,
    *, nb, backface_culling, use_aabb, trans_blocks, ray_tile,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    sox, soy, soz = o_ref[0], o_ref[1], o_ref[2]
    dx, dy, dz = d_ref[0], d_ref[1], d_ref[2]
    maxd = maxd_ref[0]
    RT = sox.shape[0]
    zrow = jnp.zeros((1, RT), jnp.float32)

    @pl.when(b == 0)
    def _init():
        dec_scr[pl.ds(i, 1), :] = zrow
        opq_scr[pl.ds(i, 1), :] = zrow
        fr_scr[pl.ds(i, 1), :] = zrow
        fg_scr[pl.ds(i, 1), :] = zrow
        fb_scr[pl.ds(i, 1), :] = zrow

    carry = (
        dec_scr[pl.ds(i, 1), :][0],
        opq_scr[pl.ds(i, 1), :][0],
        fr_scr[pl.ds(i, 1), :][0],
        fg_scr[pl.ds(i, 1), :][0],
        fb_scr[pl.ds(i, 1), :][0],
    )

    def compute(c, trans_block):
        dec, opq, fr, fg, fb = c
        woop = woop_ref[0]
        t, valid = _tri_validity_comp(
            woop, nsq_ref[0, 0], valid_ref[0, 0], sox, soy, soz, dx, dy, dz
        )
        httr = httr_ref[0, 0][None, :] != 0.0
        if backface_culling or trans_block:
            cos_nv = -_cos_planes_comp(dx, dy, dz, tnorm_ref[0])
        if backface_culling:
            valid &= (-cos_nv < 0.75) | httr
        hit = valid & (t <= maxd[:, None])
        if trans_block:
            ior = ior_ref[0, 0][None, :]
            met = met_ref[0, 0][None, :]
            col_r = colr_ref[0, 0][None, :]
            opv = op_ref[0, 0][None, :]
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
        absn = absn_ref[0]
        return (
            dec + jnp.sum(hit_f * (1.0 - io), axis=1),
            jnp.maximum(opq, jnp.max(jnp.where(hit & ~httr, 1.0, 0.0), axis=1)),
            fr + jnp.sum(hit_f * absn[0][None, :], axis=1),
            fg + jnp.sum(hit_f * absn[1][None, :], axis=1),
            fb + jnp.sum(hit_f * absn[2][None, :], axis=1),
        )

    # mixed-transparency scenes: one traced body serves every streamed
    # block, so the Fresnel branch is selected per block at RUNTIME via a
    # scalar cond on the static (nb,) trans table — all-opaque blocks take
    # the cheap body (exact: io = 0 for opaque triangles in either body)
    def run(c):
        if not trans_blocks:
            return compute(c, False)
        return jax.lax.cond(
            httbl_ref[b] != 0.0,
            lambda cc: compute(cc, True),
            lambda cc: compute(cc, False),
            c,
        )

    if use_aabb:
        gate = _gate_flat(
            aabb_ref, b, sox, soy, soz, 1.0 / dx, 1.0 / dy, 1.0 / dz, maxd
        )
        alive = gate & (maxd > 0.0) & (carry[1] < 1.0)
        carry = jax.lax.cond(jnp.any(alive), run, lambda c: c, carry)
    else:
        carry = run(carry)

    dec_scr[pl.ds(i, 1), :] = carry[0][None, :]
    opq_scr[pl.ds(i, 1), :] = carry[1][None, :]
    fr_scr[pl.ds(i, 1), :] = carry[2][None, :]
    fg_scr[pl.ds(i, 1), :] = carry[3][None, :]
    fb_scr[pl.ds(i, 1), :] = carry[4][None, :]

    @pl.when(b == nb - 1)
    def _fin():
        dec_out[:] = carry[0][None, :]
        opq_out[:] = carry[1][None, :]
        fsub_out[:] = jnp.stack([carry[2], carry[3], carry[4]])


@functools.partial(
    jax.jit,
    static_argnames=(
        "backface_culling", "ray_tile", "use_aabb", "interpret", "trans_blocks",
    ),
)
def pallas_occlude_triangles_stream(
    tri_woop, tri_nsq, tri_valid, tri_httr, tri_normal3,
    tri_ior, tri_op, tri_met, tri_colr, tri_absn, tri_aabb, block_httr,
    o, d, max_distance, backface_culling=False, ray_tile=256, use_aabb=True,
    interpret=False, trans_blocks=True,
):
    """Shadow accumulators over HBM-streamed Morton blocks: returns
    (opacity_decrement_sum (R,), any_opaque (R,) bool, filter_sub (R,3)).
    The caller folds spheres and big primitives. `block_httr` is the (nb,)
    f32 per-block any-transmissive table the kernel conds on so all-opaque
    blocks skip the shadow-Fresnel body (ADVICE r2: with a single any()
    bool, opaque blocks paid the Fresnel math whenever any block was
    transmissive)."""
    R = o.shape[0]
    nb, _, B = tri_woop.shape
    assert R % ray_tile == 0, (R, ray_tile)
    n_rt = R // ray_tile

    def rayt(s):
        return pl.BlockSpec(s, lambda b, i: (0, i), memory_space=pltpu.VMEM)

    def blk(s):
        return pl.BlockSpec(
            (1,) + s, lambda b, i: (b,) + tuple(0 for _ in s),
            memory_space=pltpu.VMEM,
        )

    def scr():
        return pltpu.VMEM((n_rt, ray_tile), jnp.float32)

    dec, opq, fsub = pl.pallas_call(
        functools.partial(
            _occl_stream_kernel,
            nb=nb,
            backface_culling=backface_culling,
            use_aabb=use_aabb,
            trans_blocks=trans_blocks,
            ray_tile=ray_tile,
        ),
        grid=(nb, n_rt),
        in_specs=[
            rayt((3, ray_tile)),
            rayt((3, ray_tile)),
            rayt((1, ray_tile)),
            blk((12, B)),
            blk((1, B)),
            blk((1, B)),
            blk((1, B)),
            blk((3, B)),
            blk((1, B)),
            blk((1, B)),
            blk((1, B)),
            blk((1, B)),
            blk((3, B)),
            pl.BlockSpec(
                tri_aabb.shape, lambda b, i: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                block_httr.shape, lambda b, i: (0,), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=[rayt((1, ray_tile)), rayt((1, ray_tile)), rayt((3, ray_tile))],
        out_shape=[
            jax.ShapeDtypeStruct((1, R), jnp.float32),
            jax.ShapeDtypeStruct((1, R), jnp.float32),
            jax.ShapeDtypeStruct((3, R), jnp.float32),
        ],
        scratch_shapes=[scr(), scr(), scr(), scr(), scr()],
        interpret=interpret,
    )(
        o.T, d.T, max_distance[None, :], tri_woop, tri_nsq[:, None],
        tri_valid[:, None], tri_httr[:, None], tri_normal3,
        tri_ior[:, None], tri_op[:, None], tri_met[:, None], tri_colr[:, None],
        tri_absn, tri_aabb, block_httr,
    )
    return dec[0], opq[0] > 0.0, fsub.T


# ---------------------------------------------------------------------------
# Shadow occlusion (component-planar): shared by the standalone occlusion
# kernel and the fused direct-lighting kernel.
# ---------------------------------------------------------------------------


def _sphere_occl_comp(sph, sox, soy, soz, dx, dy, dz, maxd, backface_culling=False):
    """Sphere shadow accumulators from the packed (S_pad, 16) sphere table
    (spheres on sublanes). Flat (RT,) ray components; returns
    (dec, opq, fr, fg, fb), all (RT,)."""
    cx = sph[:, 0:1]
    cy = sph[:, 1:2]
    cz = sph[:, 2:3]
    rsq = sph[:, 3:4]
    ior = sph[:, 4:5]
    opv = sph[:, 5:6]
    met = sph[:, 6:7]
    colr = sph[:, 7:8]
    httr = sph[:, 8:9] != 0.0
    valid_s = sph[:, 12:13] != 0.0

    vx = sox[None, :] - cx
    vy = soy[None, :] - cy
    vz = soz[None, :] - cz  # (S, RT)
    b = 2.0 * (dx[None, :] * vx + dy[None, :] * vy + dz[None, :] * vz)
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
    px = sox[None, :] + dx[None, :] * t_safe
    py_ = soy[None, :] + dy[None, :] * t_safe
    pz = soz[None, :] + dz[None, :] * t_safe
    nx, ny, nz = px - cx, py_ - cy, pz - cz
    inv_n = 1.0 / jnp.sqrt(nx * nx + ny * ny + nz * nz)
    cos_nv = -(dx[None, :] * nx + dy[None, :] * ny + dz[None, :] * nz) * inv_n
    if backface_culling:
        # ref sphere.rs:137-151 via the shared intersect impl
        sval &= (-cos_nv < 0.75) | httr
    hit = sval & (t <= maxd[None, :])

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
    dec = jnp.sum(hit_f * (1.0 - io), axis=0)
    opq = jnp.max(jnp.where(hit & ~httr, 1.0, 0.0), axis=0)
    fr = jnp.sum(hit_f * sph[:, 9:10], axis=0)
    fg = jnp.sum(hit_f * sph[:, 10:11], axis=0)
    fb = jnp.sum(hit_f * sph[:, 11:12], axis=0)
    return dec, opq, fr, fg, fb


def _tri_occl_comp(
    woop_ref, nsq_ref, valid_ref, httr_ref, tnorm_ref, ior_ref, op_ref, met_ref,
    colr_ref, absn_ref, aabb_ref, saabb_ref, sox, soy, soz, dx, dy, dz, maxd,
    dec, opq, fr, fg, fb,
    *, nb, backface_culling, use_aabb, block_has_trans, sb_sizes,
):
    """Shadow accumulation over triangle blocks with two-level per-ray
    culling. aabb_ref/saabb_ref are SMEM AABB tables; per-block flat gates
    test whether each ray's segment [0, maxd] crosses the box (maxd is
    0 for parked lanes, unreachable lights and light-behind-surface lanes).
    A block is skipped when NO ray both crosses it AND is still unoccluded —
    the reference's opaque early-exit (raytracer.rs:94-96; outputs of
    fully-occluded rays are unused downstream, so skipping is result-exact).
    All per-ray accumulators are flat (RT,)."""
    invx, invy, invz = 1.0 / dx, 1.0 / dy, 1.0 / dz
    reachable = maxd > 0.0

    def compute(b, carry, trans_block):
        dec, opq, fr, fg, fb = carry
        woop = woop_ref[b]
        t, valid = _tri_validity_comp(
            woop, nsq_ref[b, 0], valid_ref[b, 0], sox, soy, soz, dx, dy, dz
        )
        httr = httr_ref[b, 0][None, :] != 0.0
        if backface_culling or trans_block:
            cos_nv = -_cos_planes_comp(dx, dy, dz, tnorm_ref[b])
        if backface_culling:
            valid &= (-cos_nv < 0.75) | httr
        hit = valid & (t <= maxd[:, None])
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
        absn = absn_ref[b]
        return (
            dec + jnp.sum(hit_f * (1.0 - io), axis=1),
            jnp.maximum(opq, jnp.max(jnp.where(hit & ~httr, 1.0, 0.0), axis=1)),
            fr + jnp.sum(hit_f * absn[0][None, :], axis=1),
            fg + jnp.sum(hit_f * absn[1][None, :], axis=1),
            fb + jnp.sum(hit_f * absn[2][None, :], axis=1),
        )

    def run_block(b, carry):
        trans_block = block_has_trans[b] if block_has_trans else True
        if not use_aabb:
            return compute(b, carry, trans_block)
        gate = _gate_flat(aabb_ref, b, sox, soy, soz, invx, invy, invz, maxd)
        alive = gate & reachable & (carry[1] < 1.0)
        return jax.lax.cond(
            jnp.any(alive), lambda c: compute(b, c, trans_block), lambda c: c, carry
        )

    carry = (dec, opq, fr, fg, fb)
    groups = _superblock_groups(nb, sb_sizes)
    for gi, grp in enumerate(groups):

        def run_group(c, grp=grp):
            for b in grp:
                c = run_block(b, c)
            return c

        if use_aabb and len(grp) > 1:
            # two-level cull: one superblock slab test skips the whole group
            gate = _gate_flat(
                saabb_ref, gi, sox, soy, soz, invx, invy, invz, maxd
            )
            alive = gate & reachable & (carry[1] < 1.0)
            carry = jax.lax.cond(jnp.any(alive), run_group, lambda c: c, carry)
        else:
            carry = run_group(carry)
    return carry


def _occlude_kernel(
    o_ref, d_ref, maxd_ref, trb_ref, woop_ref, nsq_ref, valid_ref, httr_ref,
    tnorm_ref, ior_ref, op_ref, met_ref, colr_ref, absn_ref, aabb_ref,
    saabb_ref, dec_out, opq_out, fsub_out, *, nb, backface_culling, use_aabb,
    bigtri_trans, block_has_trans, sb_sizes,
):
    ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]
    dx, dy, dz = d_ref[0], d_ref[1], d_ref[2]
    maxd = maxd_ref[0]
    dec, opq, fr, fg, fb = _bigtri_occl_comp(
        trb_ref[:], ox, oy, oz, dx, dy, dz, maxd, backface_culling, bigtri_trans
    )
    dec, opq, fr, fg, fb = _tri_occl_comp(
        woop_ref, nsq_ref, valid_ref, httr_ref, tnorm_ref, ior_ref, op_ref,
        met_ref, colr_ref, absn_ref, aabb_ref, saabb_ref,
        ox, oy, oz, dx, dy, dz, maxd,
        dec, opq, fr, fg, fb,
        nb=nb, backface_culling=backface_culling, use_aabb=use_aabb,
        block_has_trans=block_has_trans, sb_sizes=sb_sizes,
    )
    dec_out[:] = dec[None, :]
    opq_out[:] = opq[None, :]
    fsub_out[:] = jnp.stack([fr, fg, fb])


@functools.partial(
    jax.jit,
    static_argnames=(
        "backface_culling", "ray_tile", "use_aabb", "interpret",
        "bigtri_trans", "block_has_trans", "sb_sizes",
    ),
)
def pallas_occlude_triangles(
    trb_pack, tri_woop, tri_nsq, tri_valid, tri_httr, tri_normal3,
    tri_ior, tri_op, tri_met, tri_colr, tri_absn, tri_aabb, tri_saabb,
    o, d, max_distance, backface_culling=False, ray_tile=256, use_aabb=True,
    interpret=False, bigtri_trans=True, block_has_trans=(), sb_sizes=(),
):
    """Shadow accumulators over the big-primitive pack + triangle blocks:
    returns (opacity_decrement_sum (R,), any_opaque (R,) bool,
    filter_sub (R,3))."""
    R = o.shape[0]
    nb, _, B = tri_woop.shape
    assert R % ray_tile == 0, (R, ray_tile)

    def full(s):
        return pl.BlockSpec(s, lambda i: tuple(0 for _ in s), memory_space=pltpu.VMEM)

    def smem(s):
        return pl.BlockSpec(s, lambda i: tuple(0 for _ in s), memory_space=pltpu.SMEM)

    def rayt(s):  # per-ray planes: rays on the LANE axis
        return pl.BlockSpec(s, lambda i: (0, i), memory_space=pltpu.VMEM)

    dec, opq, fsub = pl.pallas_call(
        functools.partial(
            _occlude_kernel,
            nb=nb,
            backface_culling=backface_culling,
            use_aabb=use_aabb,
            bigtri_trans=bigtri_trans,
            block_has_trans=block_has_trans,
            sb_sizes=sb_sizes,
        ),
        grid=(R // ray_tile,),
        in_specs=[
            rayt((3, ray_tile)),
            rayt((3, ray_tile)),
            rayt((1, ray_tile)),
            full(trb_pack.shape),
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
            smem(tri_aabb.shape),
            smem(tri_saabb.shape),
        ],
        out_specs=[
            rayt((1, ray_tile)),
            rayt((1, ray_tile)),
            rayt((3, ray_tile)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, R), jnp.float32),
            jax.ShapeDtypeStruct((1, R), jnp.float32),
            jax.ShapeDtypeStruct((3, R), jnp.float32),
        ],
        interpret=interpret,
    )(
        o.T, d.T, max_distance[None, :], trb_pack, tri_woop, tri_nsq[:, None],
        tri_valid[:, None], tri_httr[:, None], tri_normal3,
        tri_ior[:, None], tri_op[:, None], tri_met[:, None], tri_colr[:, None],
        tri_absn, tri_aabb, tri_saabb,
    )
    return dec[0], opq[0] > 0.0, fsub.T


# ---------------------------------------------------------------------------
# Fused direct-lighting kernel: for each ray, loop the lights in-kernel,
# run the full shadow-occlusion scan (spheres + triangle blocks) and the
# reference's shading math (ref raytracer_renderer.rs:731-874,
# light.rs:261-300, raytracer.rs:24-106), accumulating direct+specular —
# one launch instead of per-light occlusion launches plus XLA shading glue.
#
# Affine shadow factorization: a shadow ray's origin/direction are affine in
# (hit_point, light_pos) — origin = p + ε·l̂, direction l̂ ∝ (l - p) — and the
# Woop transform T(x) = A·x + b is affine too, so the per-(ray, light, tri)
# transform collapses to differences of two cheaper transforms:
#     A·(l - p)        = T(l) - T(p)            (per-light  × per-ray terms)
#     T(p + ε·l̂)       = T(p) + (ε/|l-p|)·(T(l) - T(p))
# T(p) is hoisted out of the light loop (once per (ray, tri) block) and T(l)
# costs O(B) per light. The pair math then runs in the UNNORMALIZED
# parameterization τ = t/|l-p| (same ray, scaled parameter): the reference's
# comparisons are preserved exactly by rescaling their thresholds per
# (ray, light):  t > ε         ⇔ τ > ε/|l-p|
#                t ≤ maxd      ⇔ τ ≤ maxd/|l-p|
#                |w_d·ñ²| > ε  ⇔ |Δw·ñ²| > ε·|l-p|
# and cos(n̂, l̂) = (n̂·l - n̂·p)/|l-p| reuses the same trick. This cuts the
# per-pair VPU op count ~1.5-2x (the transform was over half the ops).
# ---------------------------------------------------------------------------


# lights are processed in chunks of up to this size: per-(light, ray) shading
# runs on (C, RT) SUBLANE-stacked tiles (one VPU op covers the whole chunk,
# amortizing the ~15-cycle issue overhead that dominates flat (RT,) math) and
# per-ray point transforms are shared across the chunk's shadow scans
MAX_UNROLL_LIGHTS = 8

# fold per-ray opaque occlusion from the sphere/big-primitive pre-pass into
# the Morton block gates (exact; see the comment at the fold site). Module
# flag (env-overridable) so the ablation harness and bench can time the
# fold off for an A/B.
OPQ_GATE = os.environ.get("RT_OPQ_GATE", "1") != "0"

# per-lane evolving-opacity block gating: keep the per-(light, ray) crossing
# masks resident in VMEM instead of reducing them to per-(block, light)
# scalars up front, and gate each block on `any(cross & opq < 1)` with the
# CURRENT opq carry. A lane whose opq has reached 1 mid-scan contributes
# nothing downstream (can_reach=False discards dec/fr/fg/fb — see
# `_light_sums`), so blocks whose crossing lanes are all occluded are
# skipped; kernel OUTPUTS are bit-identical (skipped pair math could only
# have changed discarded lanes). This generalizes both the rank-0
# all-lane done flag and the OPQ_GATE pre-pass fold (the opq carry is
# seeded from the sphere/big-primitive pre-pass). Module flag for A/B.
LANE_GATE = os.environ.get("RT_LANE_GATE", "1") != "0"

# dominant-occluder prime (two-pass shadow evaluation, VERDICT r3 items
# 2/4): multi-chunk light loops (soft-shadow clouds, light.rs:183-226)
# pick, per chunk, the opaque Morton block whose AABB is crossed by the
# most still-live (light, lane) pairs — read straight off the LANE_GATE
# cross masks — and run JUST that block's opacity update before the scan.
# Cloud lights of one source share occluders, so umbra lanes saturate
# before block 0 and LANE_GATE drops them from the entire scan instead of
# only the blocks after the occluder's Morton slot. Exact: the prime only
# raises the opq carry (max of opaque-hit indicators) of lanes the scan
# would have saturated anyway at the same block, and every downstream term
# of a saturated lane is discarded (can_reach = opq < 1 in `_light_sums`);
# kernel outputs are bit-identical (tests/test_prime_gate.py). Active only
# when LANE_GATE is on and the light pack spans >1 chunk (single-chunk
# configs compile the exact round-3 program).
#
# DEFAULT OFF — measured NEGATIVE on the representative extreme tile
# (scripts/tpu_prime_ab.py, 131k mid-frame rays, 97.3% hit, 140 lights,
# B=256/RT=512): +15.0% (carry-free per-chunk selection) and +15.9% (an
# earlier cross-chunk newly-saturated argmax carry). Per-LANE saturation
# cannot empty a whole block's crossing set at RT=512, so the scan skips
# almost no additional (block, light) pairs while the prime pays one extra
# block per chunk plus selection; same block-granularity wall as OPQ_GATE
# at RT=512 and the pool_ray_tile sweep (PERF.md round 4).
PRIME_GATE = os.environ.get("RT_PRIME_GATE", "0") != "0"

# distance-sorted opaque block order (the "Known gaps" lever, VERDICT r4
# item 6): iterate the opaque Morton blocks nearest-the-light-chunk FIRST
# instead of in Morton slot order. An occluder close to the light subtends
# a large solid angle and shadows many rays at once, so per-lane opq
# saturates in the first few blocks and LANE_GATE drops the saturated
# lanes from the whole remaining scan. STATIC per (scene, light chunk):
# the order table is computed once from the block-AABB centers and the
# chunk's light centroid (`_chunk_block_order`) and read from SMEM — no
# per-call selection work (the dynamic variant of this idea, PRIME_GATE,
# measured +15% from exactly that overhead). Exact/bit-identical by the
# same argument as the prime: an opaque block's updates either contribute
# exactly 0.0 (no hit: dec/fr/fb sums add 0.0, which is exact in any
# order) or saturate the lane's opq (whose downstream sums are then
# discarded by can_reach); opq itself is a max — order-free. Gated by
# tests/test_sort_gate.py at kernel shapes.
#
# DEFAULT OFF — measured NEGATIVE on the representative extreme tile
# (scripts/tpu_sortgate_ab.py, 131k mid-frame rays, 97.3% hit, 140
# lights, B=256/RT=512, interleaved paired rounds): +29.4 ms median
# (+5.3%), all 5 rounds positive. Same block-granularity wall as
# PRIME_GATE: a block still executes if ANY of its 512 crossing lanes is
# unsaturated, so early saturation rarely empties a whole crossing set,
# while the permuted block order breaks the sequential pack access
# pattern (~5% overhead even with zero selection work). Per-lane
# two-pass resolution would need per-lane DMA/compute divergence the VPU
# does not offer. RT_SORT_GATE=1 re-enables for experiments.
SORT_GATE = os.environ.get("RT_SORT_GATE", "0") != "0"


def _chunk_block_order(light_pack, tri_blk_aabb, n_lights, nb_trans):
    """(n_chunks, nb - nb_trans) int32 order table: for each light chunk
    (MAX_UNROLL_LIGHTS rows of the pack), the OPAQUE Morton block indices
    sorted nearest-first by distance from the chunk's light centroid to
    the block-AABB center. Cloud-light chunks hold samples of one source
    light (scene/lighting.py), so the centroid is representative."""
    C = MAX_UNROLL_LIGHTS
    n_chunks = -(-int(n_lights) // C)
    lp = light_pack[: n_chunks * C, 0:3].reshape(n_chunks, C, 3)
    en = (jnp.arange(n_chunks * C) < n_lights).reshape(n_chunks, C)
    cen = jnp.sum(jnp.where(en[..., None], lp, 0.0), axis=1) / jnp.maximum(
        jnp.sum(en, axis=1, keepdims=True).astype(jnp.float32), 1.0
    )
    bc = (tri_blk_aabb[:, 0:3] + tri_blk_aabb[:, 3:6]) * 0.5
    d2 = jnp.sum((bc[nb_trans:][None, :, :] - cen[:, None, :]) ** 2, axis=-1)
    return jnp.argsort(d2, axis=1).astype(jnp.int32) + jnp.int32(nb_trans)


def _bigtri_occl_split(trb, sox, soy, soz, dx, dy, dz, maxd,
                       backface_culling, trans_rows):
    """`_bigtri_occl_comp` with the pack split at `trans_rows`: transmissive
    bigtris are packed into the leading sublane rows (scene/device.py), so
    the shadow-Fresnel math runs only there and the opaque remainder takes
    the cheap path. Returns (dec, opq, fr, fg, fb), each (RT,)."""
    P = trb.shape[0]
    parts = []
    if trans_rows > 0:
        parts.append(
            _bigtri_occl_comp(
                trb[:trans_rows], sox, soy, soz, dx, dy, dz, maxd,
                backface_culling, True,
            )
        )
    if trans_rows < P:
        parts.append(
            _bigtri_occl_comp(
                trb[trans_rows:], sox, soy, soz, dx, dy, dz, maxd,
                backface_culling, False,
            )
        )
    out = parts[0]
    for a in parts[1:]:
        out = (
            out[0] + a[0], jnp.maximum(out[1], a[1]),
            out[2] + a[2], out[3] + a[3], out[4] + a[4],
        )
    return out



def _pt_transforms_flip(blk, ptx, pty, ptz, need_n):
    """Hoisted per-(tri, ray) Woop transforms of the hit point for one
    pack block (B, 32): returns (T_u(p), T_v(p), T_w(p), ñ·p), each
    (B, RT) — triangles on sublanes, rays on lanes. This is the layout the
    big-primitive scan already uses (`_bigtri_tuv`): coefficient columns
    (B, 1) lane-broadcast against flat (RT,) rays fill every vreg, where
    the planar (RT, B=64) form ran half-width (PERF.md round 3)."""

    def col(i):
        return blk[:, i : i + 1]

    def pf(c):
        return (
            ptx[None, :] * col(c)
            + pty[None, :] * col(3 + c)
            + ptz[None, :] * col(6 + c)
            + col(9 + c)
        )

    Pn = None
    if need_n:
        Pn = (
            ptx[None, :] * col(15)
            + pty[None, :] * col(16)
            + ptz[None, :] * col(17)
        )
    return pf(0), pf(1), pf(2), Pn


def _pair_flip_update(blk, carry, lj, P, trans_block, backface_culling):
    """Shadow accumulation for ONE (light, block) pair tile in the flipped
    (B, RT) layout from hoisted point transforms (affine factorization).
    Semantics identical to `_tri_occl_comp`'s per-block compute
    (raytracer.rs:24-106). `blk` is a (B, 32) pack block (trb lane map).

    NOTE: `_pair_flip_opq` (below) hand-slices this function's valid/hit
    computation for the opacity-only all-opaque path — any change to the
    intersection predicate here MUST be mirrored there, and
    tests/test_prime_gate.py + test_opq_gate.py re-run (ADVICE r4)."""
    dec, opq, fr, fg, fb = carry
    Pu, Pv, Pw, Pn = P
    lpx, lpy, lpz = lj["lpx"], lj["lpy"], lj["lpz"]  # (1, 1) scalars

    def col(i):
        return blk[:, i : i + 1]

    def lf(c):  # light-point Woop transform, (B, 1)
        return lpx * col(c) + lpy * col(3 + c) + lpz * col(6 + c) + col(9 + c)

    Du = lf(0) - Pu
    Dv = lf(1) - Pv
    Dw = lf(2) - Pw
    el = lj["el"][None, :]  # (1, RT) = ε/|l-p|
    u_o = Pu + el * Du
    v_o = Pv + el * Dv
    w_o = Pw + el * Dw
    t = -w_o / Dw  # τ-parameterization (t/|l-p|)
    u = u_o + t * Du
    v = v_o + t * Dv
    det = Dw * col(12)
    httr = col(14) != 0.0
    valid = (
        (t > lj["epsT"][None, :])
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v < 1.0)
        & (jnp.abs(det) > lj["epsD"][None, :])
        & (col(13) != 0.0)
    )
    if backface_culling or trans_block:
        Ln = lpx * col(15) + lpy * col(16) + lpz * col(17)  # (B, 1)
        cos_nv = (Pn - Ln) * lj["inv_lt"][None, :]  # = -(l̂·n̂), true cosine
    if backface_culling:
        valid &= (-cos_nv < 0.75) | httr
    hit = valid & (t <= lj["maxdp"][None, :])
    if trans_block:
        # shadow Fresnel transmittance, red channel (material.rs:467-525
        # with other_ior=1; raytracer.rs:57-74)
        ior = col(18)
        met = col(20)
        col_r = col(21)
        opv = col(19)
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
    return (
        dec + jnp.sum(hit_f * (1.0 - io), axis=0),
        jnp.maximum(opq, jnp.max(jnp.where(hit & ~httr, 1.0, 0.0), axis=0)),
        fr + jnp.sum(hit_f * col(22), axis=0),
        fg + jnp.sum(hit_f * col(23), axis=0),
        fb + jnp.sum(hit_f * col(24), axis=0),
    )


def _pair_flip_opq(blk, opq, lj, P, backface_culling):
    """Opacity-only slice of `_pair_flip_update` for an all-opaque block:
    the dominant-occluder prime (PRIME_GATE). Raises `opq` exactly where
    the full scan would when it reaches this block; dec/fr/fg/fb are left
    untouched (they are discarded downstream whenever opq >= 1 —
    `_light_sums` can_reach). Same validity math as `_pair_flip_update`
    (raytracer.rs:24-106)."""
    Pu, Pv, Pw, Pn = P
    lpx, lpy, lpz = lj["lpx"], lj["lpy"], lj["lpz"]

    def col(i):
        return blk[:, i : i + 1]

    def lf(c):
        return lpx * col(c) + lpy * col(3 + c) + lpz * col(6 + c) + col(9 + c)

    Du = lf(0) - Pu
    Dv = lf(1) - Pv
    Dw = lf(2) - Pw
    el = lj["el"][None, :]
    t = -(Pw + el * Dw) / Dw
    u = (Pu + el * Du) + t * Du
    v = (Pv + el * Dv) + t * Dv
    det = Dw * col(12)
    httr = col(14) != 0.0
    valid = (
        (t > lj["epsT"][None, :])
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v < 1.0)
        & (jnp.abs(det) > lj["epsD"][None, :])
        & (col(13) != 0.0)
    )
    if backface_culling:
        Ln = lpx * col(15) + lpy * col(16) + lpz * col(17)
        cos_nv = (Pn - Ln) * lj["inv_lt"][None, :]
        valid &= (-cos_nv < 0.75) | httr
    hit = valid & (t <= lj["maxdp"][None, :])
    return jnp.maximum(
        opq, jnp.max(jnp.where(hit & ~httr, 1.0, 0.0), axis=0)
    )


def _tri_occl_lights_lanegate(
    pack_ref, baabb_ref, ptx, pty, ptz, lights, carries,
    *, nb, nb_trans, backface_culling, prime=False, order_ref=None,
    chunk_idx=0,
):
    """`_tri_occl_lights` with per-lane evolving-opacity gating (LANE_GATE):
    one (nb, RT) crossing-mask scratch per light (written by the same slab
    pass that previously any-reduced into the SMEM gate table); the rolled
    block loop gates each (block, light) pair on
    `any(cross_row & (opq < 1))` against the CURRENT opq carry, so a
    (light, ray) pair that became fully occluded earlier in the scan drops
    out of every later block's gate — per-lane early-out instead of the
    rank-0 all-lane done flag. Outputs bit-identical (see LANE_GATE
    comment); semantics raytracer.rs:24-106."""
    C = len(lights)
    RT = ptx.shape[0]

    def body(b, cs, trans_block):
        need_n = backface_culling or trans_block

        def gate(cross_refs):
            alive = [
                jnp.any((cross_refs[j][b] != 0.0) & (cs[j][1] < 1.0))
                for j in range(C)
            ]
            anyb = alive[0]
            for a in alive[1:]:
                anyb = anyb | a

            def do(cs):
                blk = pack_ref[b]
                P = _pt_transforms_flip(blk, ptx, pty, ptz, need_n)
                return tuple(
                    jax.lax.cond(
                        alive[j],
                        lambda c, j=j: _pair_flip_update(
                            blk, c, lights[j], P,
                            trans_block, backface_culling,
                        ),
                        lambda c: c,
                        cs[j],
                    )
                    for j in range(C)
                )

            return jax.lax.cond(anyb, do, lambda cs: cs, cs)

        return gate

    def with_cross(*cross_refs):
        # one vectorized slab pass per light over ALL block AABBs (same
        # math as the SMEM-gate path), kept at full (nb, RT) rank
        for j in range(C):
            lj = lights[j]
            so = (lj["sox"][None, :], lj["soy"][None, :], lj["soz"][None, :])
            inv = (lj["invx"][None, :], lj["invy"][None, :], lj["invz"][None, :])
            tn, tf = None, None
            for c in range(3):
                t1 = (baabb_ref[:, c : c + 1] - so[c]) * inv[c]
                t2 = (baabb_ref[:, c + 3 : c + 4] - so[c]) * inv[c]
                lo = jnp.minimum(t1, t2)
                hi = jnp.maximum(t1, t2)
                lo = jnp.where(jnp.isnan(lo), -INF, lo)
                hi = jnp.where(jnp.isnan(hi), INF, hi)
                tn = lo if tn is None else jnp.maximum(tn, lo)
                tf = hi if tf is None else jnp.minimum(tf, hi)
            cross = (
                (tf >= jnp.maximum(tn, 0.0))
                & (tn <= lj["maxd"][None, :])
                & (lj["maxd"][None, :] > 0.0)
            )
            cross_refs[j][:] = jnp.where(cross, 1.0, 0.0)

        cs = carries
        if prime and nb_trans < nb:
            # dominant-occluder prime (PRIME_GATE): pick the opaque block
            # whose AABB is crossed by the most still-live (light, lane)
            # pairs — the cross masks are already resident at full
            # (nb, RT) rank — and run JUST its opq update first, so umbra
            # lanes drop out of every block's per-lane gate below. A
            # carry-free per-chunk selection: an earlier cross-chunk
            # newly-saturated argmax carried through the fori was measured
            # +15.9% on the extreme tile (the tracking restructured the
            # hot loop); this form leaves the scan loops untouched.
            score = None
            for j in range(C):
                s = jnp.sum(
                    jnp.where(
                        (cross_refs[j][:] != 0.0)
                        & (cs[j][1] < 1.0)[None, :],
                        1.0, 0.0,
                    ),
                    axis=1,
                )  # (nb,)
                score = s if score is None else score + s
            if nb_trans:
                score = score.at[:nb_trans].set(-1.0)
            b_dom = jnp.argmax(score).astype(jnp.int32)

            def do_prime(cs):
                blk = pack_ref[b_dom]
                P = _pt_transforms_flip(blk, ptx, pty, ptz, backface_culling)
                out = []
                for j in range(C):
                    aj = jnp.any(
                        (cross_refs[j][b_dom] != 0.0) & (cs[j][1] < 1.0)
                    )
                    opq = jax.lax.cond(
                        aj,
                        lambda o, j=j: _pair_flip_opq(
                            blk, o, lights[j], P, backface_culling
                        ),
                        lambda o: o,
                        cs[j][1],
                    )
                    out.append((cs[j][0], opq) + tuple(cs[j][2:]))
                return tuple(out)

            cs = jax.lax.cond(jnp.max(score) > 0.0, do_prime, lambda c: c, cs)
        if nb_trans:
            cs = jax.lax.fori_loop(
                0, nb_trans, lambda b, cc: body(b, cc, True)(cross_refs), cs
            )
        if nb_trans < nb:
            if order_ref is not None:
                # SORT_GATE: nearest-the-light opaque blocks first (static
                # SMEM order table per light chunk) — saturation-driven
                # LANE_GATE drops umbra lanes from the rest of the scan.
                # Bit-exact under any opaque-block permutation (see the
                # SORT_GATE module comment).
                cs = jax.lax.fori_loop(
                    0, nb - nb_trans,
                    lambda k, cc: body(
                        order_ref[chunk_idx, k], cc, False
                    )(cross_refs),
                    cs,
                )
            else:
                cs = jax.lax.fori_loop(
                    nb_trans, nb,
                    lambda b, cc: body(b, cc, False)(cross_refs), cs,
                )
        return cs

    return pl.run_scoped(
        with_cross, *[pltpu.VMEM((nb, RT), jnp.float32) for _ in range(C)]
    )


def _tri_occl_lights(
    pack_ref, baabb_ref, ptx, pty, ptz, lights, carries,
    *, nb, nb_trans, backface_culling, use_aabb, prime=False,
    order_ref=None, chunk_idx=0,
):
    """Shadow accumulation over the (nb, B, 32) Morton pack for a CHUNK of
    lights: a ROLLED fori_loop over blocks (two bodies total — transmissive
    blocks first, then opaque; the pack orders them that way) in the flipped
    (B, RT) layout, block-outer / light-inner so the per-(tri, ray) point
    transforms are computed once per block and shared by every light's scan.
    Per-(block, light) alive gates (segment-AABB + opaque early-out,
    raytracer.rs:94-96) skip a block's pair math via lax.cond. The previous
    design unrolled all nb blocks x C lights into straight-line code; at 26
    blocks that thrashed the core's instruction memory — conditional
    skipping ran 20x slower than the ~3% executed-pair rate warranted
    (PERF.md round 3, scripts/tpu_shade_ablate.py).

    Gates are PRECOMPUTED, vectorized over blocks: the in-loop per-(block,
    light) flat slab tests were ~60% of the kernel's device time (the gate
    machinery cost more than the pair math it skips). One (nb, RT) slab
    pass per light + nb static any-reduces fills an SMEM gate table the
    rolled loop reads as scalars; the opaque early-out becomes a rank-0
    `done` flag per light updated only inside executed pair bodies."""
    if use_aabb and LANE_GATE:
        return _tri_occl_lights_lanegate(
            pack_ref, baabb_ref, ptx, pty, ptz, lights, carries,
            nb=nb, nb_trans=nb_trans, backface_culling=backface_culling,
            prime=prime, order_ref=order_ref, chunk_idx=chunk_idx,
        )
    C = len(lights)

    def body(b, carries, trans_block):
        blk = pack_ref[b]  # (B, 32) dynamic block read
        need_n = backface_culling or trans_block

        def pair(c, j, P):
            dec, opq, fr, fg, fb, done = c
            dec, opq, fr, fg, fb = _pair_flip_update(
                blk, (dec, opq, fr, fg, fb), lights[j], P,
                trans_block, backface_culling,
            )
            # opaque early-out (raytracer.rs:94-96): all lanes fully
            # occluded -> skip every later block for this light
            return (dec, opq, fr, fg, fb, ~jnp.any(opq < 1.0))

        def run(gates_scr):
            if not use_aabb:
                def nb_body(b_, cs):
                    blk_ = pack_ref[b_]
                    P = _pt_transforms_flip(blk_, ptx, pty, ptz, need_n)
                    return tuple(
                        _pair_flip_update(
                            blk_, cs[j][:5], lights[j], P,
                            trans_block, backface_culling,
                        ) + (cs[j][5],)
                        for j in range(C)
                    )
                return nb_body(b, carries)

            alive = [
                (gates_scr[b, j] != 0.0) & ~carries[j][5] for j in range(C)
            ]
            anyb = alive[0]
            for a in alive[1:]:
                anyb = anyb | a

            def do(cs):
                P = _pt_transforms_flip(blk, ptx, pty, ptz, need_n)
                return tuple(
                    jax.lax.cond(
                        alive[j],
                        lambda c, j=j: pair(c, j, P),
                        lambda c: c,
                        cs[j],
                    )
                    for j in range(C)
                )

            return jax.lax.cond(anyb, do, lambda cs: cs, carries)

        return run

    # rank-0 done flag appended to each light's carry, seeded from the
    # sphere/big-primitive pre-pass (a light already fully occluded on
    # every lane skips the whole Morton scan, as the old per-block
    # carry-dependent gate did)
    carries = tuple(c + (~jnp.any(c[1] < 1.0),) for c in carries)

    def scan(gates_scr):
        cs = carries
        if nb_trans:
            cs = jax.lax.fori_loop(
                0, nb_trans, lambda b, cc: body(b, cc, True)(gates_scr), cs
            )
        if nb_trans < nb:
            cs = jax.lax.fori_loop(
                nb_trans, nb, lambda b, cc: body(b, cc, False)(gates_scr), cs
            )
        return tuple(c[:5] for c in cs)

    if not use_aabb:
        return scan(None)

    def with_gates(gates_scr):
        # one vectorized slab pass per light over ALL block AABBs:
        # (nb, RT) per component from (nb, 1) box columns x (1, RT) rays;
        # per-ray reach (maxd > 0, zeroed lanes carry no occlusion work)
        # folds into the mask before the row-wise any-reduce
        for j in range(C):
            lj = lights[j]
            so = (lj["sox"][None, :], lj["soy"][None, :], lj["soz"][None, :])
            inv = (lj["invx"][None, :], lj["invy"][None, :], lj["invz"][None, :])
            tn, tf = None, None
            for c in range(3):
                t1 = (baabb_ref[:, c : c + 1] - so[c]) * inv[c]
                t2 = (baabb_ref[:, c + 3 : c + 4] - so[c]) * inv[c]
                lo = jnp.minimum(t1, t2)
                hi = jnp.maximum(t1, t2)
                lo = jnp.where(jnp.isnan(lo), -INF, lo)
                hi = jnp.where(jnp.isnan(hi), INF, hi)
                tn = lo if tn is None else jnp.maximum(tn, lo)
                tf = hi if tf is None else jnp.minimum(tf, hi)
            cross = (
                (tf >= jnp.maximum(tn, 0.0))
                & (tn <= lj["maxd"][None, :])
                & (lj["maxd"][None, :] > 0.0)
            )
            if OPQ_GATE:
                # per-ray refinement of the rank-0 done flag: a lane already
                # fully occluded by the sphere/big-primitive pre-pass
                # contributes nothing downstream (can_reach=False masks every
                # term using dec/fr/fg/fb — raytracer.rs:94-96 semantics), so
                # it drops out of the block gates exactly like maxd=0 lanes
                cross &= (carries[j][1] < 1.0)[None, :]
            for b in range(nb):  # static rows -> rank-0 any -> SMEM scalar
                gates_scr[b, j] = jnp.where(
                    jnp.any(cross[b]), jnp.float32(1.0), jnp.float32(0.0)
                )
        return scan(gates_scr)

    return pl.run_scoped(with_gates, pltpu.SMEM((nb, C), jnp.float32))


def _light_sums(
    lights_ref, sph_ref, trb_ref, pack_ref, baabb_ref,
    ptx, pty, ptz, nx, ny, nz, vwx, vwy, vwz, mcr, mcg, mcb, shin, valid,
    *, n_lights, nb, nb_trans, eps_dist, backface_culling, use_aabb,
    bigtri_trans_rows, order_ref=None,
):
    """Direct + specular light sums for one ray tile (flat lane fields):
    the shared shading core of `_light_shade_kernel` and the fused
    shade+eval kernel. Returns (dr, dg, db, spr, spg, spb), each (RT,)."""
    RT = ptx.shape[0]

    has_spec = shin > 0.0
    spec_exp = jnp.maximum(shin * 512.0, 1.0)
    zf = jnp.zeros((RT,), jnp.float32)

    C = min(n_lights, MAX_UNROLL_LIGHTS)
    n_chunks = -(-n_lights // C)
    # dominant-occluder prime across chunks (PRIME_GATE): only multi-chunk
    # light packs (soft-shadow clouds) benefit — single-chunk configs keep
    # the exact round-3 program
    prime = (
        PRIME_GATE and use_aabb and LANE_GATE
        and nb_trans < nb and n_chunks > 1
    )

    def chunk_sums(lv, l0, ci=0):
        """Direct+specular partial sums for one chunk of C lights. `lv` is
        the chunk's (C, 8) light rows, `l0` its base index (traced for the
        fori path), `ci` the chunk index (selects the SORT_GATE order row);
        lights past n_lights are disabled via `en`."""
        lpx, lpy, lpz = lv[:, 0:1], lv[:, 1:2], lv[:, 2:3]  # (C, 1)
        lcr, lcg, lcb = lv[:, 3:4], lv[:, 4:5], lv[:, 5:6]
        lint = lv[:, 6:7]

        ltpx, ltpy, ltpz = lpx - ptx[None, :], lpy - pty[None, :], lpz - ptz[None, :]
        lt2 = ltpx * ltpx + ltpy * ltpy + ltpz * ltpz
        lt = jnp.sqrt(lt2)
        inv_lt = 1.0 / lt
        ldx, ldy, ldz = ltpx * inv_lt, ltpy * inv_lt, ltpz * inv_lt
        sox = ptx[None, :] + ldx * eps_dist
        soy = pty[None, :] + ldy * eps_dist
        soz = ptz[None, :] + ldz * eps_dist
        dex, dey, dez = lpx - sox, lpy - soy, lpz - soz

        # PointLight::calculate_contribution_at (light.rs:261-300)
        light_distance = lt + F32_EPSILON
        cos_in = (
            ltpx * nx[None, :] + ltpy * ny[None, :] + ltpz * nz[None, :]
        ) / light_distance
        angle_pos = cos_in > 0.0
        en = (
            l0 + jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
        ) < n_lights  # (C, 1): tail-chunk lights past n_lights are inert
        # zero max-distance on lanes whose occlusion result is provably
        # unused: parked/invalid rays AND light-behind-surface lanes (every
        # downstream term multiplies by ci=0/ccol=0 there) — zeroed lanes
        # drop out of the per-ray block gates, so back-facing tiles skip the
        # whole shadow scan for this light
        occl_lane = valid[None, :] & angle_pos & en
        maxd = jnp.where(
            occl_lane, jnp.sqrt(dex * dex + dey * dey + dez * dez), 0.0
        )
        # per-light rescaled thresholds for the τ-parameterized pair math
        # (affine factorization, see module comment above)
        invx, invy, invz = 1.0 / ldx, 1.0 / ldy, 1.0 / ldz
        maxdp = maxd * inv_lt
        epsT = F32_EPSILON * inv_lt
        epsD = F32_EPSILON * lt
        el = eps_dist * inv_lt

        lights, carries = [], []
        for j in range(C):
            lights.append(
                dict(
                    lpx=lpx[j : j + 1], lpy=lpy[j : j + 1], lpz=lpz[j : j + 1],
                    sox=sox[j], soy=soy[j], soz=soz[j],
                    invx=invx[j], invy=invy[j], invz=invz[j],
                    maxd=maxd[j], reach=maxd[j] > 0.0,
                    maxdp=maxdp[j], epsT=epsT[j],
                    epsD=epsD[j], el=el[j],
                    inv_lt=inv_lt[j],
                )
            )

            def sb_occl(_, j=j):
                d_, q_, r_, g_, b_ = _sphere_occl_comp(
                    sph_ref[:], sox[j], soy[j], soz[j],
                    ldx[j], ldy[j], ldz[j], maxd[j], backface_culling,
                )
                bd, bq, br, bg, bb = _bigtri_occl_split(
                    trb_ref[:], sox[j], soy[j], soz[j],
                    ldx[j], ldy[j], ldz[j], maxd[j],
                    backface_culling, bigtri_trans_rows,
                )
                return d_ + bd, jnp.maximum(q_, bq), r_ + br, g_ + bg, b_ + bb

            if use_aabb:
                carries.append(
                    jax.lax.cond(
                        jnp.any(occl_lane[j]), sb_occl,
                        lambda _: (zf, zf, zf, zf, zf), 0,
                    )
                )
            else:
                carries.append(sb_occl(0))

        carries = _tri_occl_lights(
            pack_ref, baabb_ref,
            ptx, pty, ptz, lights, tuple(carries),
            nb=nb, nb_trans=nb_trans, backface_culling=backface_culling,
            use_aabb=use_aabb, prime=prime, order_ref=order_ref,
            chunk_idx=ci,
        )
        dec = jnp.stack([c[0] for c in carries])  # (C, RT)
        opq = jnp.stack([c[1] for c in carries])
        fr = jnp.stack([c[2] for c in carries])
        fg = jnp.stack([c[3] for c in carries])
        fb = jnp.stack([c[4] for c in carries])

        combined_opacity = jnp.clip(1.0 - dec, 0.0, 1.0)
        can_reach = (opq < 1.0) & valid[None, :]
        att = 0.95 * (F32_EPSILON + light_distance + light_distance * light_distance)
        att_sig = (jnp.tanh(att) + 1.0) / 2.0
        ci = jnp.where(angle_pos, cos_in * lint * jnp.clip(att_sig, 0.0, 1.0), 0.0)
        ccr = jnp.where(angle_pos, mcr[None, :] * lcr, 0.0)
        ccg = jnp.where(angle_pos, mcg[None, :] * lcg, 0.0)
        ccb = jnp.where(angle_pos, mcb[None, :] * lcb, 0.0)
        # color_filter = 1 - absorption sums; division per channel
        lcsr = jnp.where(can_reach, ccr / (1.0 - fr), ccr)
        lcsg = jnp.where(can_reach, ccg / (1.0 - fg), ccg)
        lcsb = jnp.where(can_reach, ccb / (1.0 - fb), ccb)

        dot_ln = nx[None, :] * ldx + ny[None, :] * ldy + nz[None, :] * ldz
        diffuse = jnp.maximum(dot_ln, 0.0)
        srx = ldx - 2.0 * dot_ln * nx[None, :]
        sry = ldy - 2.0 * dot_ln * ny[None, :]
        srz = ldz - 2.0 * dot_ln * nz[None, :]
        inv_sr = 1.0 / jnp.sqrt(srx * srx + sry * sry + srz * srz)
        spec_dot = jnp.maximum(
            srx * inv_sr * vwx[None, :]
            + sry * inv_sr * vwy[None, :]
            + srz * inv_sr * vwz[None, :],
            0.0,
        )
        spec_f = jnp.where(has_spec[None, :], spec_dot ** spec_exp[None, :], 0.0)

        op_sel = jnp.where(can_reach, combined_opacity, 1.0)
        lf = diffuse * ci * op_sel
        sf = ci * op_sel * spec_f
        m = (diffuse > 0.0) & can_reach & valid[None, :] & en
        dr = jnp.sum(jnp.where(m, mcr[None, :] * lcsr * lf, 0.0), axis=0)
        dg = jnp.sum(jnp.where(m, mcg[None, :] * lcsg * lf, 0.0), axis=0)
        db = jnp.sum(jnp.where(m, mcb[None, :] * lcsb * lf, 0.0), axis=0)
        ms = m & has_spec[None, :]
        spr = jnp.sum(jnp.where(ms, lcr * sf, 0.0), axis=0)
        spg = jnp.sum(jnp.where(ms, lcg * sf, 0.0), axis=0)
        spb = jnp.sum(jnp.where(ms, lcb * sf, 0.0), axis=0)
        return dr, dg, db, spr, spg, spb

    if n_chunks == 1:
        return chunk_sums(lights_ref[0:C, :], 0, 0)
    # many lights (soft-shadow clouds): fori over C-sized chunks; the
    # light pack is padded to a multiple of 8 rows (scene/device.py) so
    # the dynamic row slice is always in bounds
    def body(ci, acc):
        l0 = ci * C
        s = chunk_sums(lights_ref[pl.ds(l0, C), :], l0, ci)
        return tuple(a + b for a, b in zip(acc, s))

    return jax.lax.fori_loop(0, n_chunks, body, (zf,) * 6)


def _light_shade_kernel(
    lights_ref, sph_ref, trb_ref, pack_ref, baabb_ref,
    *args,
    n_lights, nb, nb_trans, eps_dist, backface_culling, use_aabb,
    bigtri_trans_rows, sorted_gate=False,
):
    order_ref = args[0] if sorted_gate else None
    (pt_ref, nrm_ref, view_ref, col_ref, shin_ref, valid_r_ref,
     direct_out, spec_out) = args[1:] if sorted_gate else args
    sums = _light_sums(
        lights_ref, sph_ref, trb_ref, pack_ref, baabb_ref,
        pt_ref[0], pt_ref[1], pt_ref[2],
        nrm_ref[0], nrm_ref[1], nrm_ref[2],
        view_ref[0], view_ref[1], view_ref[2],
        col_ref[0], col_ref[1], col_ref[2],
        shin_ref[0], valid_r_ref[0] != 0.0,
        n_lights=n_lights, nb=nb, nb_trans=nb_trans, eps_dist=eps_dist,
        backface_culling=backface_culling, use_aabb=use_aabb,
        bigtri_trans_rows=bigtri_trans_rows, order_ref=order_ref,
    )
    direct_out[:] = jnp.stack(sums[0:3])
    spec_out[:] = jnp.stack(sums[3:6])


def _shade_eval_kernel(
    lights_ref, sph_ref, trb_ref, pack_ref, baabb_ref,
    *args,
    n_lights, nb, nb_trans, eps_dist, backface_culling, use_aabb,
    bigtri_trans_rows, reflections, refractions, refl_max, refr_max,
    weight_cutoff, air, sorted_gate=False, packed_rows=False,
):
    order_ref = args[0] if sorted_gate else None
    args = args[1:] if sorted_gate else args
    if packed_rows:
        # packed pool-row epilogue (round 5): the kernel writes the
        # (16, RT) POOL_COLS staging rows for each child directly —
        # [o|d|w|ior|budget|from_refl|pix|pad] (ops/trace.py layout) —
        # replacing the XLA-side per-field transposes + _pack_entry
        # concats between the kernel and the staging scatter
        (pt_ref, nrm_ref, view_ref, col_ref, shin_ref, valid_r_ref,
         t_ref, w_ref, rior_ref, budget_ref, frefl_ref,
         httr_r_ref, met_r_ref, hior_r_ref, opac_r_ref, boost_r_ref,
         pix_ref,
         contrib_out,
         rows_rfl_out, rfl_m_out, rows_rfr_out, rfr_m_out,
         ) = args
        rfl_o_out = rfl_d_out = rfl_w_out = rfl_b_out = None
        rfr_o_out = rfr_d_out = rfr_w_out = rfr_b_out = rfr_i_out = None
    else:
        (pt_ref, nrm_ref, view_ref, col_ref, shin_ref, valid_r_ref,
         t_ref, w_ref, rior_ref, budget_ref, frefl_ref,
         httr_r_ref, met_r_ref, hior_r_ref, opac_r_ref, boost_r_ref,
         contrib_out,
         rfl_o_out, rfl_d_out, rfl_w_out, rfl_b_out, rfl_m_out,
         rfr_o_out, rfr_d_out, rfr_w_out, rfr_b_out, rfr_i_out, rfr_m_out,
         ) = args
    """Fused shading + shading-tree node evaluation: the light scan plus
    everything `ops/trace.py:_eval_node` computes after it — distance
    attenuation, the transmissive combine rule, and the reflection /
    refraction child entries (Fresnel weights, directions, adaptive depth
    budgets, spawn masks; ref raytracer_renderer.rs:279-729) — in ONE
    kernel, eliminating the per-iteration XLA fusion glue of the wavefront
    loop. Per-lane scalar semantics identical to the XLA path (same
    formulas; non-packet mode only)."""
    ptx, pty, ptz = pt_ref[0], pt_ref[1], pt_ref[2]
    nx, ny, nz = nrm_ref[0], nrm_ref[1], nrm_ref[2]
    vwx, vwy, vwz = view_ref[0], view_ref[1], view_ref[2]
    mcr, mcg, mcb = col_ref[0], col_ref[1], col_ref[2]
    shin = shin_ref[0]
    hval = valid_r_ref[0] != 0.0
    RT = ptx.shape[0]

    dr, dg, db, spr, spg, spb = _light_sums(
        lights_ref, sph_ref, trb_ref, pack_ref, baabb_ref,
        ptx, pty, ptz, nx, ny, nz, vwx, vwy, vwz, mcr, mcg, mcb, shin, hval,
        n_lights=n_lights, nb=nb, nb_trans=nb_trans, eps_dist=eps_dist,
        backface_culling=backface_culling, use_aabb=use_aabb,
        bigtri_trans_rows=bigtri_trans_rows, order_ref=order_ref,
    )

    t = t_ref[0]
    wr, wg, wb = w_ref[0], w_ref[1], w_ref[2]
    rior = rior_ref[0]
    budget = budget_ref[0]
    from_refl = frefl_ref[0] != 0.0
    httr_r = httr_r_ref[0] != 0.0
    met_r = met_r_ref[0]
    hior = hior_r_ref[0]
    opac = opac_r_ref[0]
    boost = boost_r_ref[0]
    dx, dy, dz = vwx, vwy, vwz  # the kernel's "view" IS d (shading.py quirk)
    zf = jnp.zeros((RT,), jnp.float32)
    zi = jnp.zeros((RT,), jnp.int32)

    # ambient folds into direct (shading.py calculate_lighting)
    amb = jnp.where(hval, 0.08, 0.0)
    dirr = amb * mcr + dr
    dirg = amb * mcg + dg
    dirb = amb * mcb + db

    # node contribution (trace.py:74-84; dist att ref rs:266-277)
    ta = jnp.abs(t)
    dist_f = jnp.clip(1.0 / (1.0 + ta + 0.1 * ta * ta), 0.0, 1.0)
    dist_f = jnp.where(hval, dist_f, 0.0)
    wer = wr * jnp.where(from_refl, dist_f, 1.0)
    weg = wg * jnp.where(from_refl, dist_f, 1.0)
    web = wb * jnp.where(from_refl, dist_f, 1.0)
    ncr = (jnp.where(httr_r, 0.0, dirr) + spr) * dist_f
    ncg = (jnp.where(httr_r, 0.0, dirg) + spg) * dist_f
    ncb = (jnp.where(httr_r, 0.0, dirb) + spb) * dist_f
    contrib_out[:] = jnp.stack([
        jnp.where(hval, wer * ncr, 0.0),
        jnp.where(hval, weg * ncg, 0.0),
        jnp.where(hval, web * ncb, 0.0),
    ])

    cos_theta = dx * nx + dy * ny + dz * nz

    def fresnel(inx, iny, inz, vx, vy, vz, other_ior):
        """compute_fresnel (shading.py:37-58; ref material.rs:467-525):
        returns per-channel reflectance F."""
        ndv = inx * vx + iny * vy + inz * vz
        cos_f = jnp.abs(ndv)
        is_in = ndv < 0.0
        eta_t = jnp.where(is_in, hior / other_ior, other_ior / hior)
        sin2 = eta_t * eta_t * (1.0 - cos_f * cos_f)
        is_tir = (httr_r & is_in & (sin2 > 1.0)) | (met_r > 0.0)
        f0 = ((other_ior - hior) / (other_ior + hior)) ** 2
        omc = 1.0 - cos_f
        omc5 = omc * omc * omc * omc * omc
        refl_amt = jnp.where(met_r > 0.0, met_r, 1.0)

        def chan(mc):
            f0c = f0 + (mc - f0) * met_r
            fres = f0c + (1.0 - f0c) * omc5
            f = jnp.where(is_tir, refl_amt, fres)
            return jnp.where(httr_r, f, met_r)

        return chan(mcr), chan(mcg), chan(mcb)

    # ---- reflection child (trace.py:100-145; ref rs:526-729) ----
    if reflections:
        is_inside = cos_theta < 0.0
        inx = jnp.where(is_inside, -nx, nx)
        iny = jnp.where(is_inside, -ny, ny)
        inz = jnp.where(is_inside, -nz, nz)
        new_ior = jnp.where(is_inside, hior, air)
        eta = jnp.where(is_inside, new_ior / rior, rior / new_ior)
        cos_i = jnp.abs(cos_theta)
        sin2_t = eta * eta * (1.0 - cos_i * cos_i)
        tir = sin2_t >= 1.0
        reflective = (met_r > 0.0) | (httr_r & tir)
        c2 = 2.0 * cos_theta
        rrx, rry, rrz = dx - c2 * nx, dy - c2 * ny, dz - c2 * nz
        inv_mag = jnp.reciprocal(jnp.sqrt(rrx * rrx + rry * rry + rrz * rrz))
        rdx, rdy, rdz = rrx * inv_mag, rry * inv_mag, rrz * inv_mag
        # compute_fresnel(inormal, -d, ...) (trace.py reflection child)
        Fr, Fg, Fb = fresnel(inx, iny, inz, -dx, -dy, -dz, rior)
        child_b = jnp.where(
            budget < 0, jnp.int32(refl_max), jnp.maximum(budget - 1, 0)
        )
        rwr, rwg, rwb = wer * Fr, weg * Fg, web * Fb
        mask = hval & reflective & (child_b > 0)
        if weight_cutoff > 0.0:
            mask &= jnp.maximum(rwr, jnp.maximum(rwg, rwb)) > weight_cutoff
        if packed_rows:
            rows_rfl_out[:] = jnp.stack([
                ptx + rdx * eps_dist, pty + rdy * eps_dist,
                ptz + rdz * eps_dist,
                rdx, rdy, rdz,
                rwr, rwg, rwb,
                rior,  # reflection keeps the current medium (rs:703)
                child_b.astype(jnp.float32),
                jnp.ones_like(rior),  # from_refl
                pix_ref[0],
                zf, zf, zf,
            ])
        else:
            rfl_o_out[:] = jnp.stack([
                ptx + rdx * eps_dist, pty + rdy * eps_dist,
                ptz + rdz * eps_dist
            ])
            rfl_d_out[:] = jnp.stack([rdx, rdy, rdz])
            rfl_w_out[:] = jnp.stack([rwr, rwg, rwb])
            rfl_b_out[:] = child_b[None, :]
        rfl_m_out[:] = jnp.where(mask, 1.0, 0.0)[None, :]
    elif packed_rows:
        rows_rfl_out[:] = jnp.zeros_like(rows_rfl_out)
        rfl_m_out[:] = zf[None, :]
    else:
        rfl_o_out[:] = jnp.stack([zf, zf, zf])
        rfl_d_out[:] = jnp.stack([zf, zf, zf])
        rfl_w_out[:] = jnp.stack([zf, zf, zf])
        rfl_b_out[:] = zi[None, :]
        rfl_m_out[:] = zf[None, :]

    # ---- refraction child (trace.py:147-198; ref rs:279-524) ----
    if refractions:
        is_in2 = cos_theta <= 0.0
        inx2 = jnp.where(is_in2, -nx, nx)
        iny2 = jnp.where(is_in2, -ny, ny)
        inz2 = jnp.where(is_in2, -nz, nz)
        new_ior2 = jnp.where(is_in2, hior, air)
        eta2 = jnp.where(is_in2, new_ior2 / rior, rior / new_ior2)
        inv_eta = 1.0 / eta2
        # view_dir = d here (trace.py:155-157)
        Fr2, Fg2, Fb2 = fresnel(inx2, iny2, inz2, dx, dy, dz, inv_eta)
        Tr, Tg, Tb = 1.0 - Fr2, 1.0 - Fg2, 1.0 - Fb2
        # refracted(d, -inormal, inv_eta) (vecmath.py:42-54)
        mnx, mny, mnz = -inx2, -iny2, -inz2
        ndi = mnx * dx + mny * dy + mnz * dz
        k = 1.0 - inv_eta * inv_eta * (1.0 - ndi * ndi)
        k_pos = k >= 0.0
        coef = inv_eta * ndi + jnp.sqrt(jnp.maximum(k, 0.0))
        qx = jnp.where(k_pos, dx * inv_eta - coef * mnx, 0.0)
        qy = jnp.where(k_pos, dy * inv_eta - coef * mny, 0.0)
        qz = jnp.where(k_pos, dz * inv_eta - coef * mnz, 0.0)
        inv_mag2 = jnp.reciprocal(jnp.sqrt(qx * qx + qy * qy + qz * qz))
        tdx = jnp.where(k_pos, qx * inv_mag2, 0.0)
        tdy = jnp.where(k_pos, qy * inv_mag2, 0.0)
        tdz = jnp.where(k_pos, qz * inv_mag2, 0.0)
        op = jnp.where(httr_r, opac, 0.0)
        step = jnp.where(op < 0.5, 2, 1).astype(jnp.int32)
        divisor = jnp.where(
            op <= 0.3, 3, jnp.where(op < 0.5, 2, 1)
        ).astype(jnp.int32)
        child_b2 = jnp.where(
            budget < 0,
            jnp.int32(refr_max) // divisor,
            jnp.maximum(budget - step, 0),
        )
        boost_f = jnp.where(httr_r, boost, 0.0) + 1.0
        twr = wer * Tr * boost_f
        twg = weg * Tg * boost_f
        twb = web * Tb * boost_f
        mask2 = hval & httr_r & (child_b2 > 0) & k_pos
        if weight_cutoff > 0.0:
            mask2 &= jnp.maximum(twr, jnp.maximum(twg, twb)) > weight_cutoff
        if packed_rows:
            rows_rfr_out[:] = jnp.stack([
                ptx + tdx * eps_dist, pty + tdy * eps_dist,
                ptz + tdz * eps_dist,
                tdx, tdy, tdz,
                twr, twg, twb,
                new_ior2,  # entering the new medium (rs:497)
                child_b2.astype(jnp.float32),
                zf,  # from_refl
                pix_ref[0],
                zf, zf, zf,
            ])
        else:
            rfr_o_out[:] = jnp.stack([
                ptx + tdx * eps_dist, pty + tdy * eps_dist,
                ptz + tdz * eps_dist
            ])
            rfr_d_out[:] = jnp.stack([tdx, tdy, tdz])
            rfr_w_out[:] = jnp.stack([twr, twg, twb])
            rfr_b_out[:] = child_b2[None, :]
            rfr_i_out[:] = new_ior2[None, :]
        rfr_m_out[:] = jnp.where(mask2, 1.0, 0.0)[None, :]
    elif packed_rows:
        rows_rfr_out[:] = jnp.zeros_like(rows_rfr_out)
        rfr_m_out[:] = zf[None, :]
    else:
        rfr_o_out[:] = jnp.stack([zf, zf, zf])
        rfr_d_out[:] = jnp.stack([zf, zf, zf])
        rfr_w_out[:] = jnp.stack([zf, zf, zf])
        rfr_b_out[:] = zi[None, :]
        rfr_i_out[:] = jnp.full((1, RT), 1.0, jnp.float32)
        rfr_m_out[:] = zf[None, :]


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_lights", "n_trans_blocks", "eps_dist", "backface_culling",
        "ray_tile", "use_aabb", "interpret", "bigtri_trans_rows",
        "reflections", "refractions", "refl_max", "refr_max", "weight_cutoff",
        "air",
    ),
)
def pallas_shade_eval(
    light_pack, sph_pack, trb_pack, tri_blk_pack, tri_blk_aabb,
    point, normal, view, color, shininess, valid,
    t, w, rior, budget, from_refl, h_httr, h_met, h_ior, h_opac, h_boost,
    n_lights, eps_dist, n_trans_blocks=0, backface_culling=False,
    ray_tile=256, use_aabb=True,
    interpret=False, bigtri_trans_rows=8,
    reflections=True, refractions=True, refl_max=5, refr_max=10,
    weight_cutoff=0.0, air=1.000293,
):
    """Fused lighting + node evaluation for R rays (see _shade_eval_kernel).

    Returns (contrib (R,3),
             refl: (o, d, w (R,3); budget (R,) i32; mask (R,) bool),
             refr: (o, d, w (R,3); budget (R,) i32; ior (R,); mask (R,))).
    """
    R = point.shape[0]
    nb, B, _ = tri_blk_pack.shape
    assert R % ray_tile == 0, (R, ray_tile)
    L_pad = light_pack.shape[0]

    def full(s):
        return pl.BlockSpec(s, lambda i: tuple(0 for _ in s), memory_space=pltpu.VMEM)

    def smem(s):
        return pl.BlockSpec(s, lambda i: tuple(0 for _ in s), memory_space=pltpu.SMEM)

    def rayt(s):
        return pl.BlockSpec(s, lambda i: (0, i), memory_space=pltpu.VMEM)

    sorted_gate = (
        SORT_GATE and use_aabb and LANE_GATE and n_trans_blocks < nb
        and nb > 1
    )
    order_args, order_specs = (), ()
    if sorted_gate:
        order = _chunk_block_order(
            light_pack, tri_blk_aabb, n_lights, n_trans_blocks
        )
        order_args = (order,)
        order_specs = (smem(order.shape),)
    outs = pl.pallas_call(
        functools.partial(
            _shade_eval_kernel,
            n_lights=n_lights,
            nb=nb,
            nb_trans=n_trans_blocks,
            eps_dist=eps_dist,
            backface_culling=backface_culling,
            use_aabb=use_aabb,
            bigtri_trans_rows=bigtri_trans_rows,
            reflections=reflections,
            refractions=refractions,
            refl_max=refl_max,
            refr_max=refr_max,
            weight_cutoff=weight_cutoff,
            air=air,
            sorted_gate=sorted_gate,
        ),
        grid=(R // ray_tile,),
        in_specs=[
            full((L_pad, 8)),
            full(sph_pack.shape),
            full(trb_pack.shape),
            full((nb, B, 32)),
            full(tri_blk_aabb.shape),  # VMEM: vectorized gate pass
            *order_specs,  # SORT_GATE per-chunk opaque block order (SMEM)
            rayt((3, ray_tile)),
            rayt((3, ray_tile)),
            rayt((3, ray_tile)),
            rayt((3, ray_tile)),
            rayt((1, ray_tile)),
            rayt((1, ray_tile)),
            rayt((1, ray_tile)),
            rayt((3, ray_tile)),
            rayt((1, ray_tile)),
            rayt((1, ray_tile)),
            rayt((1, ray_tile)),
            rayt((1, ray_tile)),
            rayt((1, ray_tile)),
            rayt((1, ray_tile)),
            rayt((1, ray_tile)),
            rayt((1, ray_tile)),
        ],
        out_specs=[
            rayt((3, ray_tile)),
            rayt((3, ray_tile)), rayt((3, ray_tile)), rayt((3, ray_tile)),
            rayt((1, ray_tile)), rayt((1, ray_tile)),
            rayt((3, ray_tile)), rayt((3, ray_tile)), rayt((3, ray_tile)),
            rayt((1, ray_tile)), rayt((1, ray_tile)), rayt((1, ray_tile)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, R), jnp.float32),
            jax.ShapeDtypeStruct((3, R), jnp.float32),
            jax.ShapeDtypeStruct((3, R), jnp.float32),
            jax.ShapeDtypeStruct((3, R), jnp.float32),
            jax.ShapeDtypeStruct((1, R), jnp.int32),
            jax.ShapeDtypeStruct((1, R), jnp.float32),
            jax.ShapeDtypeStruct((3, R), jnp.float32),
            jax.ShapeDtypeStruct((3, R), jnp.float32),
            jax.ShapeDtypeStruct((3, R), jnp.float32),
            jax.ShapeDtypeStruct((1, R), jnp.int32),
            jax.ShapeDtypeStruct((1, R), jnp.float32),
            jax.ShapeDtypeStruct((1, R), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_vmem_params(ray_tile),
    )(
        light_pack, sph_pack, trb_pack, tri_blk_pack, tri_blk_aabb,
        *order_args,
        point.T, normal.T, view.T, color.T, shininess[None, :], valid[None, :],
        t[None, :], w.T, rior[None, :], budget[None, :], from_refl[None, :],
        h_httr[None, :], h_met[None, :], h_ior[None, :], h_opac[None, :],
        h_boost[None, :],
    )
    (contrib, rfl_o, rfl_d, rfl_w, rfl_b, rfl_m,
     rfr_o, rfr_d, rfr_w, rfr_b, rfr_i, rfr_m) = outs
    return (
        contrib.T,
        dict(o=rfl_o.T, d=rfl_d.T, w=rfl_w.T, budget=rfl_b[0],
             mask=rfl_m[0] > 0.0),
        dict(o=rfr_o.T, d=rfr_d.T, w=rfr_w.T, budget=rfr_b[0],
             ior=rfr_i[0], mask=rfr_m[0] > 0.0),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_lights", "n_trans_blocks", "eps_dist", "backface_culling",
        "ray_tile", "use_aabb", "interpret", "bigtri_trans_rows",
        "reflections", "refractions", "refl_max", "refr_max", "weight_cutoff",
        "air",
    ),
)
def pallas_shade_eval_rows(
    light_pack, sph_pack, trb_pack, tri_blk_pack, tri_blk_aabb,
    point, normal, view, color, shininess, valid,
    t, w, rior, budget, from_refl, h_httr, h_met, h_ior, h_opac, h_boost,
    pix,
    n_lights, eps_dist, n_trans_blocks=0, backface_culling=False,
    ray_tile=256, use_aabb=True,
    interpret=False, bigtri_trans_rows=8,
    reflections=True, refractions=True, refl_max=5, refr_max=10,
    weight_cutoff=0.0, air=1.000293,
):
    """`pallas_shade_eval` with the PACKED pool-row epilogue (round 5):
    the kernel writes each child's (16, R) POOL_COLS staging rows
    (ops/trace.py layout: o|d|w|ior|budget|from_refl|pix|pad) directly,
    replacing the per-field transposes and `_pack_entry` concats between
    the kernel and the staging scatter. `pix` is the (R,) int32 pixel
    index of each ray. Row VALUES are bit-identical to the _pack_entry
    construction (same f32 ops on the same kernel locals —
    tests/test_packed_rows.py).

    Returns (contrib (R,3), rfl_rows (R,16), rfl_mask (R,) bool,
             rfr_rows (R,16), rfr_mask (R,) bool); rows/masks for a
    disabled child are zeros/False."""
    R = point.shape[0]
    nb, B, _ = tri_blk_pack.shape
    assert R % ray_tile == 0, (R, ray_tile)
    L_pad = light_pack.shape[0]

    def full(s):
        return pl.BlockSpec(s, lambda i: tuple(0 for _ in s), memory_space=pltpu.VMEM)

    def smem(s):
        return pl.BlockSpec(s, lambda i: tuple(0 for _ in s), memory_space=pltpu.SMEM)

    def rayt(s):
        return pl.BlockSpec(s, lambda i: (0, i), memory_space=pltpu.VMEM)

    sorted_gate = (
        SORT_GATE and use_aabb and LANE_GATE and n_trans_blocks < nb
        and nb > 1
    )
    order_args, order_specs = (), ()
    if sorted_gate:
        order = _chunk_block_order(
            light_pack, tri_blk_aabb, n_lights, n_trans_blocks
        )
        order_args = (order,)
        order_specs = (smem(order.shape),)
    outs = pl.pallas_call(
        functools.partial(
            _shade_eval_kernel,
            n_lights=n_lights,
            nb=nb,
            nb_trans=n_trans_blocks,
            eps_dist=eps_dist,
            backface_culling=backface_culling,
            use_aabb=use_aabb,
            bigtri_trans_rows=bigtri_trans_rows,
            reflections=reflections,
            refractions=refractions,
            refl_max=refl_max,
            refr_max=refr_max,
            weight_cutoff=weight_cutoff,
            air=air,
            sorted_gate=sorted_gate,
            packed_rows=True,
        ),
        grid=(R // ray_tile,),
        in_specs=[
            full((L_pad, 8)),
            full(sph_pack.shape),
            full(trb_pack.shape),
            full((nb, B, 32)),
            full(tri_blk_aabb.shape),
            *order_specs,
            *([rayt((3, ray_tile))] * 4),
            *([rayt((1, ray_tile))] * 3),
            rayt((3, ray_tile)),
            *([rayt((1, ray_tile))] * 9),
        ],
        out_specs=[
            rayt((3, ray_tile)),
            rayt((16, ray_tile)), rayt((1, ray_tile)),
            rayt((16, ray_tile)), rayt((1, ray_tile)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, R), jnp.float32),
            jax.ShapeDtypeStruct((16, R), jnp.float32),
            jax.ShapeDtypeStruct((1, R), jnp.float32),
            jax.ShapeDtypeStruct((16, R), jnp.float32),
            jax.ShapeDtypeStruct((1, R), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_vmem_params(ray_tile),
    )(
        light_pack, sph_pack, trb_pack, tri_blk_pack, tri_blk_aabb,
        *order_args,
        point.T, normal.T, view.T, color.T, shininess[None, :], valid[None, :],
        t[None, :], w.T, rior[None, :], budget[None, :], from_refl[None, :],
        h_httr[None, :], h_met[None, :], h_ior[None, :], h_opac[None, :],
        h_boost[None, :],
        pix.astype(jnp.float32)[None, :],
    )
    contrib, rfl_rows, rfl_m, rfr_rows, rfr_m = outs
    return (
        contrib.T,
        rfl_rows.T, rfl_m[0] > 0.0,
        rfr_rows.T, rfr_m[0] > 0.0,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_lights", "n_trans_blocks", "eps_dist", "backface_culling",
        "ray_tile", "use_aabb", "interpret", "bigtri_trans_rows",
    ),
)
def pallas_light_shade(
    light_pack, sph_pack, trb_pack, tri_blk_pack, tri_blk_aabb,
    point, normal, view, color, shininess, valid,
    n_lights, eps_dist, n_trans_blocks=0, backface_culling=False,
    ray_tile=256, use_aabb=True, interpret=False, bigtri_trans_rows=8,
):
    """Direct + specular lighting for R rays over n_lights point lights
    (shadow occlusion + shading fused). Returns (direct (R,3), spec (R,3)).
    `shininess`/`valid` are flat (R,); per-ray vectors are (R,3)."""
    R = point.shape[0]
    nb, B, _ = tri_blk_pack.shape
    assert R % ray_tile == 0, (R, ray_tile)
    L_pad = light_pack.shape[0]

    def full(s):
        return pl.BlockSpec(s, lambda i: tuple(0 for _ in s), memory_space=pltpu.VMEM)

    def smem(s):
        return pl.BlockSpec(s, lambda i: tuple(0 for _ in s), memory_space=pltpu.SMEM)

    def rayt(s):  # per-ray planes: rays on the LANE axis
        return pl.BlockSpec(s, lambda i: (0, i), memory_space=pltpu.VMEM)

    sorted_gate = (
        SORT_GATE and use_aabb and LANE_GATE and n_trans_blocks < nb
        and nb > 1
    )
    order_args, order_specs = (), ()
    if sorted_gate:
        order = _chunk_block_order(
            light_pack, tri_blk_aabb, n_lights, n_trans_blocks
        )
        order_args = (order,)
        order_specs = (smem(order.shape),)
    direct, spec = pl.pallas_call(
        functools.partial(
            _light_shade_kernel,
            n_lights=n_lights,
            nb=nb,
            nb_trans=n_trans_blocks,
            eps_dist=eps_dist,
            backface_culling=backface_culling,
            use_aabb=use_aabb,
            bigtri_trans_rows=bigtri_trans_rows,
            sorted_gate=sorted_gate,
        ),
        grid=(R // ray_tile,),
        in_specs=[
            # light rows live in VMEM: chunks of 8 are row-sliced (dynamic
            # sublane offset) and broadcast against the ray lanes
            full((L_pad, 8)),
            full(sph_pack.shape),
            full(trb_pack.shape),
            full((nb, B, 32)),
            full(tri_blk_aabb.shape),  # VMEM: vectorized gate pass
            *order_specs,  # SORT_GATE per-chunk opaque block order (SMEM)
            rayt((3, ray_tile)),
            rayt((3, ray_tile)),
            rayt((3, ray_tile)),
            rayt((3, ray_tile)),
            rayt((1, ray_tile)),
            rayt((1, ray_tile)),
        ],
        out_specs=[rayt((3, ray_tile)), rayt((3, ray_tile))],
        out_shape=[
            jax.ShapeDtypeStruct((3, R), jnp.float32),
            jax.ShapeDtypeStruct((3, R), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_vmem_params(ray_tile),
    )(
        light_pack, sph_pack, trb_pack, tri_blk_pack, tri_blk_aabb,
        *order_args,
        point.T, normal.T, view.T, color.T, shininess[None, :], valid[None, :],
    )
    return direct.T, spec.T
