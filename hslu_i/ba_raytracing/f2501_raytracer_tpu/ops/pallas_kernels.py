"""Pallas TPU kernels for the two hot scans: nearest-hit cast and shadow
occlusion over triangle blocks.

Why Pallas: the per-(ray, triangle) work is ~35-60 VPU ops on a (RT, B) pair
tile followed by a lane reduction. Left to XLA the chain materializes many
(R, B) intermediates in HBM; here the whole pipeline — Woop transform,
t/u/v validity, the reference's quirky Fresnel shadow transmittance, and the
running min / accumulate — stays in VMEM and registers, with triangle blocks
streamed through the grid's minor dimension.

Layout: rays along sublanes (RT rows), triangles along lanes (B = 128·k
columns). Grid = (R/RT, nb); outputs are revisited across the minor (block)
axis and initialized at block 0, the standard Pallas accumulation pattern.

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


def _pair_tuv(woop, o4_ref, d_ref):
    """Woop transform on a (RT, B) pair tile. woop: (12, B) rows =
    [A^T | b] coefficient planes; returns t, u, v, w_d."""
    o4 = o4_ref[:]  # (RT, 4)
    d = d_ref[:]  # (RT, 3)

    def tf(vec, k0, nk):
        # Σ_k vec[:, k] * woop[k0 + 3k] -> (RT, B)
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


def _cast_kernel(
    o4_ref, d_ref, woop_ref, nsq_ref, valid_ref, httr_ref, tnorm_ref,
    t_out, idx_out, *, block_size, backface_culling,
):
    j = pl.program_id(1)
    woop = woop_ref[0]  # (12, B)
    t, u, v, w_d = _pair_tuv(woop, o4_ref, d_ref)
    det = w_d * nsq_ref[0, 0][None, :]
    valid = (
        (t > F32_EPSILON)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v < 1.0)
        & (jnp.abs(det) > F32_EPSILON)
        & (valid_ref[0, 0][None, :] != 0)
    )
    if backface_culling:
        tn = tnorm_ref[0]  # (3, B)
        d = d_ref[:]
        cos_dn = (
            d[:, 0:1] * tn[0][None, :]
            + d[:, 1:2] * tn[1][None, :]
            + d[:, 2:3] * tn[2][None, :]
        )
        valid &= (cos_dn < 0.75) | (httr_ref[0, 0][None, :] != 0)

    t = jnp.where(valid, t, INF)
    tmin = jnp.min(t, axis=1, keepdims=True)  # (RT, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
    idx = jnp.min(
        jnp.where((t == tmin) & valid, cols + j * block_size, jnp.int32(BIG_IDX)),
        axis=1,
        keepdims=True,
    )

    @pl.when(j == 0)
    def _():
        t_out[:] = tmin
        idx_out[:] = idx

    @pl.when(j > 0)
    def _():
        closer = tmin < t_out[:]
        idx_out[:] = jnp.where(closer, idx, idx_out[:])
        t_out[:] = jnp.where(closer, tmin, t_out[:])


@functools.partial(
    jax.jit, static_argnames=("backface_culling", "ray_tile", "interpret")
)
def pallas_cast_triangles(
    tri_woop, tri_nsq, tri_valid, tri_httr, tri_normal3,
    o, d, backface_culling=False, ray_tile=256, interpret=False,
):
    """Nearest triangle hit: returns (t (R,), local_tri_idx (R,)).

    tri_woop (nb, 12, B); tri_nsq/tri_valid/tri_httr (nb, B);
    tri_normal3 (nb, 3, B). R must be a multiple of ray_tile.
    """
    R = o.shape[0]
    nb, _, B = tri_woop.shape
    assert R % ray_tile == 0, (R, ray_tile)
    o4 = jnp.concatenate([o, jnp.ones((R, 1), o.dtype)], axis=1)

    grid = (R // ray_tile, nb)
    t_out, idx_out = pl.pallas_call(
        functools.partial(
            _cast_kernel, block_size=B, backface_culling=backface_culling
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ray_tile, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ray_tile, 3), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 12, B), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, B), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ray_tile, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ray_tile, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
            jax.ShapeDtypeStruct((R, 1), jnp.int32),
        ],
        interpret=interpret,
    )(o4, d, tri_woop, tri_nsq[:, None], tri_valid[:, None], tri_httr[:, None], tri_normal3)
    return t_out[:, 0], idx_out[:, 0]


def _occlude_kernel(
    o4_ref, d_ref, maxd_ref, woop_ref, nsq_ref, valid_ref, httr_ref, tnorm_ref,
    ior_ref, op_ref, met_ref, colr_ref, absn_ref,
    dec_out, opq_out, fsub_out, *, backface_culling,
):
    j = pl.program_id(1)
    woop = woop_ref[0]
    t, u, v, w_d = _pair_tuv(woop, o4_ref, d_ref)
    det = w_d * nsq_ref[0, 0][None, :]
    valid = (
        (t > F32_EPSILON)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v < 1.0)
        & (jnp.abs(det) > F32_EPSILON)
        & (valid_ref[0, 0][None, :] != 0)
    )
    d = d_ref[:]
    tn = tnorm_ref[0]
    # cos(normal, -d) with the (possibly non-unit) shading normal
    cos_nv = -(
        d[:, 0:1] * tn[0][None, :]
        + d[:, 1:2] * tn[1][None, :]
        + d[:, 2:3] * tn[2][None, :]
    )
    httr = httr_ref[0, 0][None, :] != 0
    if backface_culling:
        valid &= (-cos_nv < 0.75) | httr

    hit = valid & (t <= maxd_ref[:])

    # shadow Fresnel transmittance, red channel (material.rs:467-525 with
    # other_ior=1; raytracer.rs:57-74)
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
    om_cos = 1.0 - cos_theta
    fres_r = f0r + (1.0 - f0r) * om_cos * om_cos * om_cos * om_cos * om_cos
    f_r = jnp.where(is_tir, jnp.where(is_refl, met, 1.0), fres_r)
    t_red = jnp.where(httr, 1.0 - f_r, 0.0)
    io = jnp.where(httr, opv, 0.0) * t_red

    hit_f = jnp.where(hit, 1.0, 0.0)
    dec = jnp.sum(hit_f * (1.0 - io), axis=1, keepdims=True)  # (RT,1)
    opq = jnp.max(jnp.where(hit & ~httr, 1.0, 0.0), axis=1, keepdims=True)
    absn = absn_ref[0]  # (3, B)
    fr = jnp.sum(hit_f * absn[0][None, :], axis=1, keepdims=True)
    fg = jnp.sum(hit_f * absn[1][None, :], axis=1, keepdims=True)
    fb = jnp.sum(hit_f * absn[2][None, :], axis=1, keepdims=True)
    fsub = jnp.concatenate([fr, fg, fb], axis=1)  # (RT,3)

    @pl.when(j == 0)
    def _():
        dec_out[:] = dec
        opq_out[:] = opq
        fsub_out[:] = fsub

    @pl.when(j > 0)
    def _():
        dec_out[:] += dec
        opq_out[:] = jnp.maximum(opq_out[:], opq)
        fsub_out[:] += fsub


@functools.partial(
    jax.jit, static_argnames=("backface_culling", "ray_tile", "interpret")
)
def pallas_occlude_triangles(
    tri_woop, tri_nsq, tri_valid, tri_httr, tri_normal3,
    tri_ior, tri_op, tri_met, tri_colr, tri_absn,
    o, d, max_distance, backface_culling=False, ray_tile=256, interpret=False,
):
    """Shadow accumulators over triangle blocks: returns
    (opacity_decrement_sum (R,), any_opaque (R,) bool, filter_sub (R,3))."""
    R = o.shape[0]
    nb, _, B = tri_woop.shape
    assert R % ray_tile == 0, (R, ray_tile)
    o4 = jnp.concatenate([o, jnp.ones((R, 1), o.dtype)], axis=1)
    maxd = max_distance[:, None]

    grid = (R // ray_tile, nb)
    blk2 = lambda i, j: (j, 0, 0)
    ray1 = lambda i, j: (i, 0)
    dec, opq, fsub = pl.pallas_call(
        functools.partial(_occlude_kernel, backface_culling=backface_culling),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ray_tile, 4), ray1, memory_space=pltpu.VMEM),
            pl.BlockSpec((ray_tile, 3), ray1, memory_space=pltpu.VMEM),
            pl.BlockSpec((ray_tile, 1), ray1, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 12, B), blk2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), blk2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), blk2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), blk2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, B), blk2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), blk2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), blk2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), blk2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), blk2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, B), blk2, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ray_tile, 1), ray1, memory_space=pltpu.VMEM),
            pl.BlockSpec((ray_tile, 1), ray1, memory_space=pltpu.VMEM),
            pl.BlockSpec((ray_tile, 3), ray1, memory_space=pltpu.VMEM),
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
        tri_absn,
    )
    return dec[:, 0], opq[:, 0] > 0.0, fsub
