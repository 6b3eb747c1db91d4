"""Multi-chip rendering over a `jax.sharding.Mesh`.

The reference's only scale-out axes are SIMD lanes and rayon threads on one
machine (SURVEY.md §2.2/§2.3 — no distributed backend exists). The TPU-native
scale-out maps the same two axes onto a device mesh:

* `rays` axis (data parallel): the pixel/ray wavefront is sharded across
  devices; the scene SoA is replicated; no communication is needed until the
  final tile gather, which is an `all_gather` over ICI (or simply the
  sharded->host transfer when only the host needs the frame).
* `objs` axis (tensor parallel over the scene): triangle blocks are sharded;
  each device computes its local nearest hit and the global argmin-reduce is
  an ICI collective (`pmin` on distance, then `pmin` on the indices of
  distance-winners) — the mesh-level analogue of the reference's lane-masked
  `SurfaceInteraction::blend` chain (raytracer.rs:190-215).

Shadow/occlusion accumulators (opacity decrement sums, opaque-hit ORs,
absorption sums — raytracer.rs:43-98) are associative-commutative and would
`psum`-combine the same way.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import RenderConfig
from ..ops.trace import trace_rays
from ..scene.device import DeviceScene


def make_mesh(n_devices: Optional[int] = None, axis: str = "rays") -> Mesh:
    devs = np.array(jax.devices()[: n_devices or len(jax.devices())])
    return Mesh(devs, (axis,))


def shard_scene(scene: DeviceScene, mesh: Mesh) -> DeviceScene:
    """Replicate the scene SoA on every device of the mesh."""
    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, rep), scene)


def render_image_sharded(scene: DeviceScene, cfg: RenderConfig, origins, directions, mesh: Mesh):
    """One multi-chip render step: rays sharded over the mesh, scene
    replicated, trace locally, `all_gather` the finished tiles over ICI so
    every chip holds the frame (SURVEY.md §2.3). R must divide the mesh size
    (the renderer pads tiles)."""
    axis = mesh.axis_names[0]

    def local(scene_rep, o_shard, d_shard):
        color, valid = trace_rays.__wrapped__(scene_rep, cfg, o_shard, d_shard)
        color = jax.lax.all_gather(color, axis, tiled=True)
        valid = jax.lax.all_gather(valid, axis, tiled=True)
        return color, valid

    mapped = jax.shard_map(
        local, mesh=mesh, in_specs=(P(), P(axis), P(axis)), out_specs=(P(), P()),
        check_vma=False,  # all_gather(tiled) outputs are replicated
    )
    return jax.jit(mapped)(scene, origins, directions)


def trace_tiles_sharded(scene: DeviceScene, cfg: RenderConfig, o_tiles, d_tiles, mesh: Mesh):
    """Shard a fused whole-frame render's TILE axis across the mesh: each
    device `lax.map`s its local (n_tiles/ndev, T, 3) tiles through the full
    wavefront tracer — the compacted-pool path engages per tile exactly as on
    one device (trace_rays, ops/trace.py) — and outputs stay device-sharded
    for host assembly (the renderer's producer side). This is the renderer's
    multi-chip mode (`cfg.devices`): scene replicated, rays data-parallel
    (SURVEY.md §2.3); no collective is needed because the host consumes the
    frame."""
    axis = mesh.axis_names[0]
    assert o_tiles.shape[0] % mesh.devices.size == 0, (
        o_tiles.shape, mesh.devices.size,
    )

    def local(scene_rep, o_sh, d_sh):
        def per_tile(od):
            o, d = od
            return trace_rays.__wrapped__(scene_rep, cfg, o, d)

        return jax.lax.map(per_tile, (o_sh, d_sh))

    shd = NamedSharding(mesh, P(axis))
    mapped = jax.shard_map(
        local, mesh=mesh, in_specs=(P(), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
        # loop carries mix unvarying inits with tile-varying bodies; there is
        # no cross-device communication in this map, so vma checking is moot
        check_vma=False,
    )
    return jax.jit(mapped)(
        shard_scene(scene, mesh),
        jax.device_put(o_tiles, shd),
        jax.device_put(d_tiles, shd),
    )


def trace_tiles_sharded_u32(
    scene: DeviceScene, cfg: RenderConfig, o_tiles, d_tiles, aa_weights,
    mesh: Mesh,
):
    """`trace_tiles_sharded` with the AA reduction + 0xFFRRGGBB pixel encode
    fused on-device (ops/trace.py::encode_pixels_u32): each chip outputs
    4 bytes per LOCAL pixel instead of 12·aa, so the sharded->host transfer
    shrinks identically to the single-chip u32 path (a measured share of
    frame latency through a relay, PERF.md round 3). Outputs stay
    device-sharded (n_tiles, pixels_per_tile) for host assembly.

    Returns (u32 (n_tiles, P), dropped (n_tiles,) int32) exactly like
    trace_rays_tiled_u32 — the pool-saturation drop counter is surfaced in
    the mesh path too (the reference recursion never drops subtrees,
    raytracer_renderer.rs:216-248)."""
    from ..ops.trace import encode_pixels_u32

    axis = mesh.axis_names[0]
    assert o_tiles.shape[0] % mesh.devices.size == 0, (
        o_tiles.shape, mesh.devices.size,
    )

    def local(scene_rep, w_rep, o_sh, d_sh):
        def per_tile(od):
            o, d = od
            color, valid, stats = trace_rays.__wrapped__(
                scene_rep, cfg, o, d, with_stats=True
            )
            return encode_pixels_u32(color, valid, w_rep), stats["dropped"]

        return jax.lax.map(per_tile, (o_sh, d_sh))

    shd = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    mapped = jax.shard_map(
        local, mesh=mesh, in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
        check_vma=False,  # no cross-device communication in this map
    )
    return jax.jit(mapped)(
        shard_scene(scene, mesh),
        jax.device_put(jnp.asarray(aa_weights), rep),
        jax.device_put(o_tiles, shd),
        jax.device_put(d_tiles, shd),
    )


@partial(jax.jit, static_argnames=("cfg", "n_tiles", "pix_t", "mesh"))
def _sharded_u32_gen(scene, offsets, aa_weights, order_2d, *, cfg, n_tiles,
                     pix_t, mesh):
    from ..ops.trace import make_raygen_per_tile

    axis = mesh.axis_names[0]

    def local(scene_rep, offs_rep, w_rep, og_sh):
        per_tile = make_raygen_per_tile(scene_rep, cfg, offs_rep, w_rep, pix_t)
        return jax.lax.map(per_tile, og_sh)

    mapped = jax.shard_map(
        local, mesh=mesh, in_specs=(P(), P(), P(), P(axis)),
        out_specs=(P(axis), P(axis)),
        check_vma=False,  # no cross-device communication in this map
    )
    return mapped(scene, offsets, aa_weights, order_2d)


def trace_tiles_sharded_u32_gen(
    scene: DeviceScene, cfg: RenderConfig, order_group, offsets, aa_weights,
    mesh: Mesh, n_tiles: int,
):
    """`trace_rays_tiled_u32_gen` sharded over the mesh's tile axis: the
    wall-optimized production pipeline (device-side ray generation from the
    4 B/pixel tile-major permutation + fused u32 pixel encode + per-tile
    drop counter) on every chip. Each device lax.maps the SAME per-tile body
    as the single-chip path over its local n_tiles/ndev tiles, so outputs
    are bit-identical to single-chip (tests/test_multichip.py) and the
    renderer's overlapped/tapered fetch groups can dispatch several of these
    programs back to back (SURVEY.md §2.3; the reference's image-plane
    scale-out obligation)."""
    ndev = mesh.devices.size
    assert n_tiles % ndev == 0, (n_tiles, ndev)
    pix_t = order_group.shape[0] // n_tiles
    shd = NamedSharding(mesh, P(mesh.axis_names[0]))
    rep = NamedSharding(mesh, P())
    return _sharded_u32_gen(
        shard_scene(scene, mesh),
        jax.device_put(jnp.asarray(offsets), rep),
        jax.device_put(jnp.asarray(aa_weights), rep),
        jax.device_put(order_group.reshape(n_tiles, pix_t), shd),
        cfg=cfg, n_tiles=n_tiles, pix_t=pix_t, mesh=mesh,
    )


def trace_rays_sharded(scene: DeviceScene, cfg: RenderConfig, origins, directions, mesh: Mesh):
    """Data-parallel trace with sharded outputs (no gather): the natural mode
    when the host assembles tiles."""
    axis = mesh.axis_names[0]
    ray_sh = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    fn = jax.jit(
        lambda scn, o, d: trace_rays.__wrapped__(scn, cfg, o, d),
        in_shardings=(rep, ray_sh, ray_sh),
        out_shardings=(ray_sh, ray_sh),
    )
    return fn(shard_scene(scene, mesh), origins, directions)


def cast_nearest_objsharded(
    scene: DeviceScene, o, d, mesh: Mesh, backface_culling: bool = False
):
    """Tensor-parallel nearest-hit cast: triangle blocks sharded over the
    mesh axis, rays replicated, global nearest combined with `pmin`
    collectives. Returns (t (R,), obj_idx (R,), valid (R,)), replicated.

    Demonstrates the scene-sharded axis for scenes too large to replicate;
    the data-parallel path above is the default for replicable scenes.
    """
    from ..ops.intersect import (
        INF,
        _backface_mask,
        _bigtri_nearest_xla,
        _dot3_planes,
        _sphere_cos,
        _sphere_ts,
        _tri_block_ts,
    )

    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    nb = scene.triangle_blocks
    assert nb % ndev == 0, f"triangle blocks ({nb}) must divide the mesh ({ndev})"
    S = scene.sphere_slots
    B = scene.tri_block
    tri_httr_full = scene.tri_httr_f

    def local(tri_stack, httr_shard, scene_rep, o_rep, d_rep):
        woop4s, nsqs, tnorms, tvals = tri_stack
        local_nb = woop4s.shape[0]
        shard_i = jax.lax.axis_index(axis)
        base = (
            S
            + scene_rep.n_bigtris
            + B * (shard_i * local_nb + jnp.arange(local_nb, dtype=jnp.int32))
        )

        R = o_rep.shape[0]
        st, s_valid = _sphere_ts(scene_rep, o_rep, d_rep)
        if backface_culling:
            cos = _sphere_cos(scene_rep, o_rep, d_rep, jnp.where(s_valid, st, 0.0))
            s_valid &= _backface_mask(cos, scene_rep.mat_has_trans[None, :S])
        st = jnp.where(s_valid, st, INF)
        best_t = jnp.min(st, axis=1)
        best_idx = jnp.argmin(st, axis=1).astype(jnp.int32)

        o4 = jnp.concatenate([o_rep, jnp.ones((R, 1), o_rep.dtype)], axis=1)
        # the big-primitive pack is small: computed replicated on every
        # device (like the spheres); the pmin combine below is idempotent
        bt, bidx = _bigtri_nearest_xla(scene_rep, o4, d_rep, backface_culling)
        closer = bt < best_t
        best_t = jnp.where(closer, bt, best_t)
        best_idx = jnp.where(closer, S + bidx, best_idx)

        def body(carry, blk):
            bt, bi = carry
            woop4, nsq, tnorm, tval, httr, bs = blk
            t, valid = _tri_block_ts(woop4, nsq, tval, o4, d_rep)
            if backface_culling:
                cos_dn = _dot3_planes(d_rep, tnorm)
                valid &= _backface_mask(cos_dn, httr[None, :] != 0.0)
            t = jnp.where(valid, t, INF)
            tmin = jnp.min(t, axis=1)
            targ = jnp.argmin(t, axis=1).astype(jnp.int32)
            closer = tmin < bt
            return (jnp.where(closer, tmin, bt), jnp.where(closer, bs + targ, bi)), None

        (t_local, idx_local), _ = jax.lax.scan(
            body, (best_t, best_idx), (woop4s, nsqs, tnorms, tvals, httr_shard, base)
        )
        t_global = jax.lax.pmin(t_local, axis)
        idx_cand = jnp.where(t_local == t_global, idx_local, jnp.int32(2**31 - 1))
        idx_global = jax.lax.pmin(idx_cand, axis)
        return t_global, idx_global, jnp.isfinite(t_global)

    mapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=((P(axis), P(axis), P(axis), P(axis)), P(axis), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,  # pmin outputs are replicated
    )
    tri_stack = (scene.tri_woop, scene.tri_nsq, scene.tri_normal3, scene.tri_valid_f)
    return jax.jit(mapped)(tri_stack, tri_httr_full, scene, o, d)
