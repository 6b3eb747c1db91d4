"""Wavefront Whitted tracing: the reference's recursion tree as a masked loop.

The reference recursively branches into a reflection subtree and a refraction
subtree per hit, offloading top-level secondary rays to spawned threads
(ref raytracer_renderer.rs:147-264, 279-524, 526-729). On TPU that tree is
flattened into an iterative DFS over a fixed-size per-ray stack: every stack
entry is a pending ray with an accumulated *weight* (the product of Fresnel
reflectances / transmittances / boosts along its path), so contributions are
linear and can be summed into the framebuffer in any order.

Depth-budget semantics copied exactly (they shape the image):
* budget -1 encodes the reference's `None` (top level); the first reflection
  child then gets RAYTRACE_REFLECTION_MAX_DEPTH, the first refraction child
  RAYTRACE_REFRACTION_MAX_DEPTH / depth_factor  (raytracer_renderer.rs:364-375,
  684-695)
* refraction depth budgets shrink adaptively with opacity: step 2 below 0.5,
  initial divisor 3 below 0.3 / 2 below 0.5     (raytracer_renderer.rs:458-491,
  evaluated per ray like the reference's scalar path)
* a child whose budget reaches 0 is never spawned (it would return None at
  entry, raytracer_renderer.rs:174-178)
* the combine rule: transmissive surfaces drop direct light, keeping
  reflection+refraction+specular              (raytracer_renderer.rs:251-257)
* reflection contributions are attenuated by the *child's* first-hit distance
  (raytracer_renderer.rs:711-728) — tracked via the `from_refl` flag
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..config import DEFAULT_REFRACTION_INDEX, RenderConfig
from ..scene.device import DeviceScene
from .intersect import cast_rays
from .shading import (
    attenuation_factor_based_on_distance,
    calculate_lighting,
    compute_fresnel,
)
from .vecmath import F32_EPSILON, dot, normalized, reflected, refracted

AIR = float(DEFAULT_REFRACTION_INDEX)  # python scalar: no backend init at import
# |v|^2 threshold for `abs_diff_eq_default(zero)` on a direction vector
# (ref vector.rs componentwise F32_EPSILON check, used at rs:589-594)
F32_EPS_SQ = float(F32_EPSILON) ** 2
# out-of-range pixel index for dead staging rows: scatter mode="drop"
# discards them (any value >= the wavefront size works)
OOB_PIX = 2**30


def _eval_node(scene, cfg: RenderConfig, eps_dist, o, d, ior, weight, budget, from_refl, active, rt=0):
    """Evaluate one shading-tree node for the whole wavefront.

    Returns (contribution (R,3), primary_hit_valid (R,), refl_push, refr_push)
    where each push is a dict of per-ray child-entry fields + a `mask`.
    `rt` overrides cfg.kernel_ray_tile (cfg.pool_ray_tile plumbing — the
    pool's incoherent secondary wavefronts may want a different tile)."""
    rt = int(rt) or int(cfg.kernel_ray_tile)
    # park inactive lanes on a far-away miss ray: keeps the math finite and
    # lets the Pallas block-AABB cull skip tiles of dead rays for free
    o = jnp.where(active[:, None], o, jnp.float32(1e9))
    d = jnp.where(active[:, None], d, jnp.float32([0.0, 0.0, 1.0])[None, :])
    hit = cast_rays(
        scene, o, d, cfg.backface_culling, bool(cfg.use_pallas), cfg.interpret,
        rt,
    )
    hval = hit.valid & active
    # park missed lanes far away too: their (masked-out) shadow rays then
    # miss every block AABB, letting background tiles skip the whole scene
    hit = dataclasses.replace(
        hit,
        valid=hval,
        point=jnp.where(hval[:, None], hit.point, jnp.float32(1e9)),
    )

    # fused path: lighting + node evaluation (children math) in ONE Pallas
    # kernel. Packet mode keeps the XLA path (its reductions cross lanes);
    # streaming scenes route lighting through the occlusion kernels.
    if (
        cfg.use_pallas
        and not cfg.packet_mode
        and not scene.streaming
        and (cfg.reflections or cfg.refractions)
    ):
        return _eval_node_fused(
            scene, cfg, eps_dist, hit, d, ior, weight, budget, from_refl, hval,
            rt,
        )

    direct, spec = calculate_lighting(scene, cfg, hit, d, eps_dist)

    dist_f = attenuation_factor_based_on_distance(hit.t)
    dist_f = jnp.where(hval, dist_f, 0.0)
    direct = direct * dist_f[:, None]
    spec = spec * dist_f[:, None]

    w = weight * jnp.where(from_refl, dist_f, 1.0)[:, None]

    node_color = jnp.where(hit.has_trans[:, None], 0.0, direct) + spec
    contrib = jnp.where(hval[:, None], w * node_color, 0.0)

    cos_theta = dot(d, hit.normal)

    # ---- simd_render packet reductions (cfg.packet_mode) ----
    # the reference's SIMD build shares spawn decisions and depth budgets
    # across the 8 lanes of an AA packet (see config.py packet_mode); lanes
    # were laid out so packet p occupies rays [8p, 8p+8)
    PK = 8

    def pk_any(m):  # packet-wide .any() broadcast back to lanes
        return jnp.repeat(jnp.any(m.reshape(-1, PK), axis=1), PK)

    def pk_max(x):  # simd_horizontal_max broadcast back to lanes
        return jnp.repeat(jnp.max(x.reshape(-1, PK), axis=1), PK)

    # ---- reflection child (raytracer_renderer.rs:526-729) ----
    refl_push = None
    if cfg.reflections:
        is_inside = cos_theta < 0.0
        inormal = jnp.where(is_inside[:, None], -hit.normal, hit.normal)
        new_ior = jnp.where(is_inside, hit.ior, AIR)
        eta = jnp.where(is_inside, new_ior / ior, ior / new_ior)
        cos_i = jnp.abs(cos_theta)
        sin2_t = eta * eta * (1.0 - cos_i * cos_i)
        tir = sin2_t >= 1.0
        reflective = (hit.metallic > 0.0) | (hit.has_trans & tir)

        refl_dir = normalized(reflected(d, hit.normal))
        reflectance, _ = compute_fresnel(
            inormal, -d, ior, hit.color, hit.metallic, hit.ior, hit.has_trans
        )
        child_budget = jnp.where(
            budget < 0, cfg.reflection_max_depth, jnp.maximum(budget - 1, 0)
        ).astype(jnp.int32)
        refl_w = w * reflectance
        if cfg.packet_mode:
            # packet-wide recursion: trace iff any lane is reflective and no
            # lane's reflection direction degenerated (rs:584-594, rs:708-710
            # `if (reflection_is_none.none())`); non-reflective lanes ride
            # along with zero weight — the reference's final per-lane blend
            # (rs:712-729)
            refl_raw = reflected(d, hit.normal)
            degen = jnp.sum(refl_raw * refl_raw, axis=1) <= F32_EPS_SQ
            lane_ok = hval & reflective & ~degen
            mask = pk_any(hval & reflective) & ~pk_any(degen) & (child_budget > 0)
            refl_w = jnp.where(lane_ok[:, None], refl_w, 0.0)
            if cfg.weight_cutoff > 0.0:
                mask &= pk_max(jnp.max(refl_w, axis=1)) > cfg.weight_cutoff
        else:
            mask = hval & reflective & (child_budget > 0)
            if cfg.weight_cutoff > 0.0:
                mask &= jnp.max(refl_w, axis=1) > cfg.weight_cutoff
        refl_push = dict(
            o=hit.point + refl_dir * eps_dist,
            d=refl_dir,
            ior=ior,  # reflection keeps the current medium (rs:703)
            w=refl_w,
            budget=child_budget,
            from_refl=jnp.ones_like(mask),
            mask=mask,
        )

    # ---- refraction child (raytracer_renderer.rs:279-524) ----
    refr_push = None
    if cfg.refractions:
        is_inside = cos_theta <= 0.0
        inormal = jnp.where(is_inside[:, None], -hit.normal, hit.normal)
        new_ior = jnp.where(is_inside, hit.ior, AIR)
        eta = jnp.where(is_inside, new_ior / ior, ior / new_ior)
        inv_eta = 1.0 / eta
        _, transmittance = compute_fresnel(
            inormal, d, inv_eta, hit.color, hit.metallic, hit.ior, hit.has_trans
        )
        refr_raw, k_pos = refracted(d, -inormal, inv_eta)
        refr_dir = jnp.where(k_pos[:, None], normalized(refr_raw), 0.0)

        op = jnp.where(hit.has_trans, hit.opacity, 0.0)
        if cfg.packet_mode:
            # the SIMD build derives the adaptive depth step/divisor from the
            # packet-horizontal-max opacity (rs:458-491 simd_horizontal_max)
            op = pk_max(op)
        step = jnp.where(op < 0.5, 2, 1)
        divisor = jnp.where(op <= 0.3, 3, jnp.where(op < 0.5, 2, 1))
        child_budget = jnp.where(
            budget < 0,
            cfg.refraction_max_depth // divisor,
            jnp.maximum(budget - step, 0),
        ).astype(jnp.int32)
        boost = jnp.where(hit.has_trans, hit.boost, 0.0) + 1.0
        refr_w = w * transmittance * boost[:, None]
        if cfg.packet_mode:
            # packet-wide recursion iff any lane hit a refractive material
            # (rs:306-308 early return on .none()); per-lane contributions
            # keep the reference's final mask (rs:505-522) — TIR lanes
            # (k_pos false) carry a zero direction and can never produce a
            # valid child hit, matching `refraction_valid` semantics
            lane_ok = hval & hit.has_trans & k_pos
            mask = pk_any(hval & hit.has_trans) & (child_budget > 0)
            refr_w = jnp.where(lane_ok[:, None], refr_w, 0.0)
            if cfg.weight_cutoff > 0.0:
                mask &= pk_max(jnp.max(refr_w, axis=1)) > cfg.weight_cutoff
        else:
            mask = hval & hit.has_trans & (child_budget > 0) & k_pos
            if cfg.weight_cutoff > 0.0:
                mask &= jnp.max(refr_w, axis=1) > cfg.weight_cutoff
        refr_push = dict(
            o=hit.point + refr_dir * eps_dist,
            d=refr_dir,
            ior=new_ior,  # entering the new medium (rs:497)
            w=refr_w,
            budget=child_budget,
            from_refl=jnp.zeros_like(mask),
            mask=mask,
        )

    return contrib, hval, refl_push, refr_push


def _eval_node_rows(scene, cfg: RenderConfig, eps_dist, o, d, ior, weight,
                    budget, from_refl, active, pix, rt=0):
    """`_eval_node` with the PACKED pool-row epilogue (round 5): the fused
    kernel writes each child's (T, 16) POOL_COLS staging rows directly
    (pallas_shade_eval_rows), so the XLA glue between the kernel and the
    staging scatter shrinks to one transpose — no per-field transposes, no
    `_pack_entry` concat. Row values are bit-identical to the
    _pack_entry construction (tests/test_packed_rows.py).

    Only callable on the fused-eligible path (use_pallas, non-packet,
    resident scene, refl|refr). Returns (contrib, hval, rows (k*T, 16),
    masks (k*T,)) with children in the pool-append order [refr, refl]
    (k = number of enabled child types)."""
    from .intersect import _pad_rays
    from .pallas_kernels import pallas_shade_eval_rows

    rt = int(rt) or int(cfg.kernel_ray_tile)
    R = d.shape[0]
    o = jnp.where(active[:, None], o, jnp.float32(1e9))
    d = jnp.where(active[:, None], d, jnp.float32([0.0, 0.0, 1.0])[None, :])
    hit = cast_rays(
        scene, o, d, cfg.backface_culling, bool(cfg.use_pallas), cfg.interpret,
        rt,
    )
    hval = hit.valid & active
    hit = dataclasses.replace(
        hit,
        valid=hval,
        point=jnp.where(hval[:, None], hit.point, jnp.float32(1e9)),
    )
    args, _ = _pad_rays(
        (
            hit.point, hit.normal, d, hit.color, hit.shininess,
            hval.astype(jnp.float32), hit.t, weight, ior,
            budget.astype(jnp.int32), from_refl.astype(jnp.float32),
            hit.has_trans.astype(jnp.float32), hit.metallic, hit.ior,
            hit.opacity, hit.boost, pix.astype(jnp.int32),
        ),
        rt,
    )
    contrib, rfl_rows, rfl_m, rfr_rows, rfr_m = pallas_shade_eval_rows(
        scene.light_pack, scene.sph_pack, scene.trb_pack,
        scene.tri_blk_pack, scene.tri_blk_aabb,
        *args,
        n_lights=scene.n_lights,
        eps_dist=float(eps_dist),
        n_trans_blocks=scene.n_trans_blocks,
        backface_culling=cfg.backface_culling,
        ray_tile=rt,
        interpret=cfg.interpret,
        bigtri_trans_rows=scene.bigtri_trans_rows,
        reflections=cfg.reflections,
        refractions=cfg.refractions,
        refl_max=int(cfg.reflection_max_depth),
        refr_max=int(cfg.refraction_max_depth),
        weight_cutoff=float(cfg.weight_cutoff),
        air=float(DEFAULT_REFRACTION_INDEX),
    )
    rows, masks = [], []
    if cfg.refractions:  # pool-append order: refr first (matches the
        rows.append(rfr_rows[:R])  # (refr_push, refl_push) cands order)
        masks.append(rfr_m[:R])
    if cfg.reflections:
        rows.append(rfl_rows[:R])
        masks.append(rfl_m[:R])
    return (
        contrib[:R], hval,
        jnp.concatenate(rows, axis=0),
        jnp.concatenate(masks, axis=0),
    )


def _eval_node_fused(scene, cfg, eps_dist, hit, d, ior, weight, budget, from_refl, hval, rt=0):
    """_eval_node's lighting + children math via the fused Pallas kernel
    (pallas_shade_eval); semantics mirror the XLA path line for line."""
    from .intersect import _pad_rays
    from .pallas_kernels import pallas_shade_eval

    rt = int(rt) or int(cfg.kernel_ray_tile)
    R = d.shape[0]
    args, _ = _pad_rays(
        (
            hit.point,
            hit.normal,
            d,  # the reference's specular "view" points AT the surface
            hit.color,
            hit.shininess,
            hval.astype(jnp.float32),
            hit.t,
            weight,
            ior,
            budget.astype(jnp.int32),
            from_refl.astype(jnp.float32),
            hit.has_trans.astype(jnp.float32),
            hit.metallic,
            hit.ior,
            hit.opacity,
            hit.boost,
        ),
        rt,
    )
    contrib, refl, refr = pallas_shade_eval(
        scene.light_pack,
        scene.sph_pack,
        scene.trb_pack,
        scene.tri_blk_pack,
        scene.tri_blk_aabb,
        *args,
        n_lights=scene.n_lights,
        eps_dist=float(eps_dist),
        n_trans_blocks=scene.n_trans_blocks,
        backface_culling=cfg.backface_culling,
        ray_tile=rt,
        interpret=cfg.interpret,
        bigtri_trans_rows=scene.bigtri_trans_rows,
        reflections=cfg.reflections,
        refractions=cfg.refractions,
        refl_max=int(cfg.reflection_max_depth),
        refr_max=int(cfg.refraction_max_depth),
        weight_cutoff=float(cfg.weight_cutoff),
        air=float(DEFAULT_REFRACTION_INDEX),
    )
    contrib = contrib[:R]
    refl_push = None
    if cfg.reflections:
        refl_push = dict(
            o=refl["o"][:R],
            d=refl["d"][:R],
            ior=ior,  # reflection keeps the current medium (rs:703)
            w=refl["w"][:R],
            budget=refl["budget"][:R],
            from_refl=jnp.ones((R,), bool),
            mask=refl["mask"][:R],
        )
    refr_push = None
    if cfg.refractions:
        refr_push = dict(
            o=refr["o"][:R],
            d=refr["d"][:R],
            ior=refr["ior"][:R],
            w=refr["w"][:R],
            budget=refr["budget"][:R],
            from_refl=jnp.zeros((R,), bool),
            mask=refr["mask"][:R],
        )
    return contrib, hval, refl_push, refr_push


def _push(state, entry):
    """Masked per-ray stack push (one-hot over the slot axis). Pushes that
    would overflow the stack are counted in `dropped` (never silent)."""
    if entry is None:
        return state
    sp = state["sp"]
    K = state["st_o"].shape[0]
    mask = entry["mask"] & (sp < K)
    if "dropped" in state:
        state = dict(state)
        state["dropped"] = state["dropped"] + jnp.sum(
            (entry["mask"] & (sp >= K)).astype(jnp.int32)
        )
    slot = jnp.arange(K, dtype=jnp.int32)[:, None] == sp[None, :]  # (K,R)
    write = slot & mask[None, :]
    state = dict(state)
    state["st_o"] = jnp.where(write[..., None], entry["o"][None], state["st_o"])
    state["st_d"] = jnp.where(write[..., None], entry["d"][None], state["st_d"])
    state["st_w"] = jnp.where(write[..., None], entry["w"][None], state["st_w"])
    state["st_ior"] = jnp.where(write, entry["ior"][None], state["st_ior"])
    state["st_budget"] = jnp.where(write, entry["budget"][None], state["st_budget"])
    state["st_refl"] = jnp.where(write, entry["from_refl"][None], state["st_refl"])
    state["sp"] = sp + mask.astype(jnp.int32)
    return state


def _pop(state):
    sp = state["sp"]
    active = sp > 0
    idx = jnp.maximum(sp - 1, 0)[None, :]  # (1,R)

    def take(arr, vec):
        i = idx[..., None] if vec else idx
        return jnp.take_along_axis(arr, i, axis=0)[0]

    entry = dict(
        o=take(state["st_o"], True),
        d=take(state["st_d"], True),
        w=take(state["st_w"], True),
        ior=take(state["st_ior"], False),
        budget=take(state["st_budget"], False),
        from_refl=take(state["st_refl"], False),
    )
    state = dict(state)
    state["sp"] = jnp.where(active, sp - 1, 0)
    return state, entry, active


@partial(jax.jit, static_argnames=("cfg", "with_stats"))
def trace_rays_tiled(scene: DeviceScene, cfg: RenderConfig, o_tiles, d_tiles,
                     with_stats: bool = False):
    """Trace (n_tiles, T, 3) ray tiles inside ONE program (`lax.map`).

    Per-program dispatch is expensive on remote-attached TPUs; a full frame
    should be a single executable, not one launch per tile."""

    def per_tile(od):
        o, d = od
        return trace_rays.__wrapped__(scene, cfg, o, d, with_stats=with_stats)

    out = jax.lax.map(per_tile, (o_tiles, d_tiles))
    if with_stats:
        color, valid, stats = out
        return color, valid, {k: jnp.sum(v) for k, v in stats.items()}
    return out


@partial(jax.jit, static_argnames=("cfg",))
def trace_rays_tiled_u32(scene: DeviceScene, cfg: RenderConfig, o_tiles, d_tiles,
                         aa_weights):
    """`trace_rays_tiled` with the AA reduction + pixel encode fused into
    the program: returns (n_tiles, T // U) packed 0xFFRRGGBB uint32 pixels
    (the reference's framebuffer format, image_buffer.rs:10-15; u8
    conversion is round-half-up with NO gamma, output/file.rs:61-71).

    Each tile's T rays are U consecutive (possibly deduped, weighted) AA
    samples per pixel; `aa_weights` (U,) are the per-sample weights (uniform
    1/total without dedupe — ref rs:1001-1015 color_sum/total with misses
    adding black). Invalid pixels (no sample hit) encode as 0x00000000,
    exactly an untouched atomic in the reference's zeroed buffer.

    On remote-attached TPUs this also cuts the host fetch from 12·U to 4
    bytes per pixel — the f32 fetch was a measured share of frame latency
    (PERF.md round 3).

    Returns (u32 (n_tiles, P), dropped (n_tiles,) int32): the per-tile
    count of pending secondary rays truncated by pool/stack capacity. The
    counter is carried in the loop state anyway, so surfacing it is free —
    and the reference recursion never drops subtrees
    (raytracer_renderer.rs:216-248), so callers must warn on nonzero."""
    def per_tile(od):
        o, d = od
        color, valid, stats = trace_rays.__wrapped__(
            scene, cfg, o, d, with_stats=True
        )
        return encode_pixels_u32(color, valid, aa_weights), stats["dropped"]

    return jax.lax.map(per_tile, (o_tiles, d_tiles))


def make_raygen_per_tile(scene: DeviceScene, cfg: RenderConfig, offsets,
                         aa_weights, pix_t: int):
    """Per-tile body shared by the single-chip and mesh-sharded device-side
    ray-generation paths: (pix_t,) int32 tile-major pixel indices (-1 =
    padding) -> (u32 pixels (pix_t,), dropped int32). Bit-identical to the
    host ray build (tests/test_renderer_layout.py gen gate); under a mesh
    each device runs this same body over its local tiles, so mesh outputs
    are bit-identical to single-chip (tests/test_multichip.py)."""
    U = offsets.shape[0]
    cam = cfg.camera
    focus = jnp.asarray(cam.render_ray_focus, jnp.float32)
    zdir = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)

    def per_tile(og_t):
        pad = og_t < 0
        idx = jnp.maximum(og_t, 0)
        px = (idx % cfg.width).astype(jnp.float32) * jnp.float32(cam.w2s_width)
        py = (idx // cfg.width).astype(jnp.float32) * jnp.float32(cam.w2s_height)
        coords = jnp.stack([px, py, jnp.zeros_like(px)], axis=-1)  # (P, 3)
        dirs = coords - focus[None, :]
        o = coords[:, None, :] + offsets[None, :, :]  # (P, U, 3)
        d = jnp.broadcast_to(dirs[:, None, :], (pix_t, U, 3))
        o = jnp.where(pad[:, None, None], 0.0, o).reshape(pix_t * U, 3)
        d = jnp.where(
            pad[:, None, None], zdir[None, None, :], d
        ).reshape(pix_t * U, 3)
        color, valid, stats = trace_rays.__wrapped__(
            scene, cfg, o, d, with_stats=True
        )
        return encode_pixels_u32(color, valid, aa_weights), stats["dropped"]

    return per_tile


@partial(jax.jit, static_argnames=("cfg", "n_tiles"))
def trace_rays_tiled_u32_gen(scene: DeviceScene, cfg: RenderConfig,
                             order_group, offsets, aa_weights, n_tiles: int):
    """`trace_rays_tiled_u32` with DEVICE-SIDE ray generation: primary rays
    are an affine function of the pixel index (coords = px*w2s, dir =
    coords - focus, AA samples jitter the origin by a small table —
    ops/camera.py), so the frame program takes only the compact tile-major
    pixel permutation (4 bytes/pixel, uploaded once per plan) instead of
    host-built (o, d) ray buffers (24·U bytes/pixel — ~0.9 GB at extreme
    AA). Bit-identical to the host build: the same f32 ops in the same
    order (tests/test_renderer_layout.py gen gate).

    order_group: (n_tiles * P,) int32 row-major pixel indices in tile-major
    order, -1 marks padding slots beyond the frame (traced as harmless +z
    rays exactly like build_frame_rays' padding).

    Returns (u32 (n_tiles, P), dropped (n_tiles,) int32) like
    trace_rays_tiled_u32."""
    P = order_group.shape[0] // n_tiles
    per_tile = make_raygen_per_tile(scene, cfg, offsets, aa_weights, P)
    return jax.lax.map(per_tile, order_group.reshape(n_tiles, P))


def encode_pixels_u32(color, valid, aa_weights):
    """Fused AA reduction + pixel encode for one tile's (T, 3) colors and
    (T,) valid mask, T = pixels · U consecutive weighted AA samples:
    weighted sample sum (misses add black, ref rs:1001-1015), round-half-up
    u8 with NO gamma (output/file.rs:61-71), 0xFFRRGGBB pack
    (image_buffer.rs:10-15); all-miss pixels encode 0x00000000 like an
    untouched atomic. Shared by the single-chip and mesh tile paths."""
    U = aa_weights.shape[0]
    P = color.shape[0] // U
    c = color.reshape(P, U, 3)
    v = valid.reshape(P, U)
    px_c = jnp.sum(
        jnp.where(v[..., None], c, 0.0) * aa_weights[None, :, None], axis=1
    )
    px_v = jnp.any(v, axis=1)
    u8 = jnp.floor(jnp.clip(px_c, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint32)
    packed = (
        (jnp.uint32(0xFF) << 24)
        | (u8[:, 0] << 16)
        | (u8[:, 1] << 8)
        | u8[:, 2]
    )
    return jnp.where(px_v, packed, jnp.uint32(0))


@partial(jax.jit, static_argnames=("cfg", "with_stats"))
def trace_rays(scene: DeviceScene, cfg: RenderConfig, origins, directions,
               with_stats: bool = False):
    """Trace R rays to final linear-RGB colors.

    `directions` need not be normalized (Ray::new normalizes, ray.rs:54).
    Returns (color (R,3), valid (R,)) — `valid` is the primary-hit mask; the
    caller leaves the framebuffer untouched where it is False
    (ref raytracer_renderer.rs:1183-1187). With `with_stats=True` a third
    element is returned: {"dropped": int32} — the number of pending
    secondary rays truncated by pool/stack capacity (0 in healthy runs; the
    reference recursion never drops subtrees, so any nonzero value marks a
    divergence worth investigating).
    """
    R = origins.shape[0]
    if cfg.packet_mode:
        # packets are the 8 consecutive AA lanes of one pixel; the serviced
        # pool slices/pushes preserve packet contiguity (masks are
        # packet-uniform), but a Morton resort would scatter them
        assert R % 8 == 0, "packet_mode needs 8-lane-aligned wavefronts"
        assert not cfg.resort_secondary, "packet_mode forbids resort_secondary"
    eps_dist = float(cfg.camera.epsilon_distance)
    d0 = normalized(directions)

    def ret(accum, valid, dropped):
        if with_stats:
            return accum, valid, {"dropped": dropped}
        return accum, valid

    ratio = max(int(cfg.compaction_ratio), 1)
    # >=: a tile of exactly rt*ratio rays (e.g. 8192 at ratio 32) must also
    # take the pool path — the full-width stack path re-evaluates the whole
    # wavefront per pop and is ~ratio x slower; on the remote relay that can
    # stretch one program past the worker watchdog (see PERF.md)
    pool_path = (
        (cfg.reflections or cfg.refractions)
        and ratio > 1 and R >= cfg.kernel_ray_tile * ratio
    )
    # packed pool-row epilogue: the fused kernel writes staging rows
    # directly (bit-identical; cfg.packed_stage)
    rows_mode = (
        pool_path and cfg.packed_stage and cfg.use_pallas
        and not cfg.packet_mode and not scene.streaming
    )

    prim_args = (
        origins,
        d0,
        jnp.full((R,), AIR),
        jnp.ones((R, 3), jnp.float32),
        jnp.full((R,), -1, jnp.int32),
        jnp.zeros((R,), bool),
        jnp.ones((R,), bool),
    )
    if rows_mode:
        contrib, top_valid, rows0, masks0 = _eval_node_rows(
            scene, cfg, eps_dist, *prim_args,
            pix=jnp.arange(R, dtype=jnp.int32),
        )
        accum, dropped = _run_pool(
            scene, cfg, eps_dist, R, contrib, None, None,
            rows0=rows0, masks0=masks0,
        )
        return ret(accum, top_valid, dropped)

    # primary node: budget None (-1), weight 1, current medium = air
    contrib, top_valid, refl_push, refr_push = _eval_node(
        scene, cfg, eps_dist, *prim_args,
    )

    if not (cfg.reflections or cfg.refractions):
        return ret(contrib, top_valid, jnp.int32(0))

    if pool_path:
        accum, dropped = _run_pool(
            scene, cfg, eps_dist, R, contrib, refr_push, refl_push
        )
        return ret(accum, top_valid, dropped)

    K = cfg.stack_size
    state = dict(
        sp=jnp.zeros((R,), jnp.int32),
        st_o=jnp.zeros((K, R, 3), jnp.float32),
        st_d=jnp.zeros((K, R, 3), jnp.float32),
        st_w=jnp.zeros((K, R, 3), jnp.float32),
        st_ior=jnp.ones((K, R), jnp.float32),
        st_budget=jnp.zeros((K, R), jnp.int32),
        st_refl=jnp.zeros((K, R), bool),
        accum=contrib,
        it=jnp.int32(0),
        dropped=jnp.int32(0),
    )
    # refraction pushed first so reflection pops first (the reference
    # evaluates the reflection subtree before the refraction subtree)
    state = _push(state, refr_push)
    state = _push(state, refl_push)

    max_iters = cfg.max_nodes
    body_one = partial(_body_full, scene, cfg, eps_dist)

    # chunked loop: `loop_chunk` fixed iterations per while step — the
    # while cond syncs with the host on remote TPUs, so check it rarely;
    # an iteration with no pending rays is a masked no-op
    chunk = max(int(cfg.loop_chunk), 1)

    def cond(s):
        return (s["it"] < max_iters) & jnp.any(s["sp"] > 0)

    def guarded(st):
        # on-device guard: iterations after convergence are pass-throughs,
        # so overshooting the chunk costs ~nothing
        return jax.lax.cond(jnp.any(st["sp"] > 0), body_one, lambda s: s, st)

    def chunk_body(s):
        return jax.lax.fori_loop(0, chunk, lambda i, st: guarded(st), s)

    state = jax.lax.while_loop(cond, chunk_body, state)

    return ret(state["accum"], top_valid, state["dropped"])


# packed pool-entry layout: one (Q, 16) f32 row per pending ray. Scatter
# cost on TPU is ~per-ROW (measured: the per-field staging scatters were the
# dominant wavefront-loop glue), so the 7 logical fields ride one wide row:
#   [0:3] o | [3:6] d | [6:9] w | [9] ior | [10] budget | [11] from_refl |
#   [12] pix | [13:16] pad
# budget/pix live exactly in f32: pool rows only ever hold real pixel
# indices (< R < 2^24) and small depth budgets. The OOB_PIX staging sentinel
# (2^30, above) never enters the pool — it is only written to the separate
# int32 stage_pix buffer for scatter mode="drop".
PK_O, PK_D, PK_W = slice(0, 3), slice(3, 6), slice(6, 9)
PK_IOR, PK_BUD, PK_REFL, PK_PIX = 9, 10, 11, 12
POOL_COLS = 16


def _pack_entry(e, pix):
    """Entry dict -> packed (N, 16) f32 rows."""
    n = pix.shape[0]
    return jnp.concatenate(
        [
            e["o"], e["d"], e["w"],
            e["ior"][:, None],
            e["budget"].astype(jnp.float32)[:, None],
            e["from_refl"].astype(jnp.float32)[:, None],
            pix.astype(jnp.float32)[:, None],
            jnp.zeros((n, 3), jnp.float32),
        ],
        axis=1,
    )


def _unpack_entry(rows):
    """Packed rows -> entry dict (+ pix as int32)."""
    return dict(
        o=rows[:, PK_O],
        d=rows[:, PK_D],
        w=rows[:, PK_W],
        ior=rows[:, PK_IOR],
        budget=rows[:, PK_BUD].astype(jnp.int32),
        from_refl=rows[:, PK_REFL] != 0.0,
        pix=rows[:, PK_PIX].astype(jnp.int32),
    )


def _pool_append(pool, count, cands, masks, Q, mode="scatter"):
    """Compact packed candidate rows into the pool at `count` with ONE
    staging scatter. All work is O(total candidate width).

    `mode` selects the compaction machinery (outputs below `count` are
    identical; slots past count+n_push are dead either way):
      scatter — one row scatter; rejected rows collide on a drop slot
      gather  — inverse map via searchsorted(cumsum) + row gather (no
                scatter; rows past n_push hold an arbitrary trailing
                candidate instead of zeros — never read)
      unique  — like scatter but rejects go to distinct slots in a 2x
                staging buffer so the scatter can declare unique_indices
    """
    cand = jnp.concatenate(cands, axis=0)
    m = jnp.concatenate(masks, axis=0)
    n_cand = m.shape[0]
    # dense positions among accepted candidates; rejected go to a drop slot
    cum = jnp.cumsum(m.astype(jnp.int32))
    pos_in = cum - 1
    n_push = pos_in[-1] + 1
    if mode == "gather":
        src = jnp.searchsorted(
            cum, jnp.arange(1, n_cand + 1, dtype=jnp.int32)
        )
        staged = jnp.take(cand, jnp.minimum(src, n_cand - 1), axis=0)
    elif mode == "unique":
        rej = jnp.arange(n_cand, dtype=jnp.int32) - cum  # reject rank
        staging_pos = jnp.where(m, pos_in, n_cand + rej)
        staged = (
            jnp.zeros((2 * n_cand, POOL_COLS), jnp.float32)
            .at[staging_pos]
            .set(cand, unique_indices=True)[:n_cand]
        )
    else:
        staging_pos = jnp.where(m, pos_in, n_cand)  # n_cand = drop slot
        staged = (
            jnp.zeros((n_cand + 1, POOL_COLS), jnp.float32)
            .at[staging_pos]
            .set(cand)[:n_cand]
        )
    start = count  # count is pre-clamped so start + n_cand <= Q
    pool = jax.lax.dynamic_update_slice_in_dim(pool, staged, start, 0)
    return pool, count + n_push


def _run_pool(scene, cfg, eps_dist, R, contrib, refr_push, refl_push,
              rows0=None, masks0=None):
    """Compacted wavefront with a dense ray pool: pending rays are stored
    contiguously, so every iteration's cost scales with the service width W,
    not the wavefront size R. Exact: contributions carry path weights, so
    evaluation order is free. Returns (accum, dropped).

    `rows0`/`masks0` (packed-stage mode, cfg.packed_stage): the prologue's
    candidate rows arrive PRE-PACKED from the kernel epilogue
    (_eval_node_rows) instead of as push dicts, and the service loop uses
    the same packed evaluation. Bit-identical to the push-dict path.
    """
    rows_mode = rows0 is not None
    ratio = max(int(cfg.compaction_ratio), 1)
    rt = int(cfg.kernel_ray_tile)
    W = max((R // ratio) // rt * rt, rt)
    # Pool capacity: the prologue pushes at most 2R entries; the service loop
    # is LIFO (top-W pops = a W-wide DFS frontier), so each budget level adds
    # at most one net +W band of children on top before budgets decrement —
    # depth chains are bounded by the max depth budget D. 2W headroom keeps a
    # full append in bounds. Saturation is counted (`dropped`) and reported
    # loudly instead of silently losing reflection/refraction energy
    # (the reference recursion never drops subtrees, raytracer_renderer.rs).
    D = max(
        cfg.reflection_max_depth if cfg.reflections else 0,
        cfg.refraction_max_depth if cfg.refractions else 0,
        1,
    )
    Q = 2 * R + 2 * W * (D + 2)
    # Logical capacity vs physical size: the PHYSICAL pool must stay at the
    # auto bound (the prologue writes up to 2R candidate rows in one
    # static-size slice; in-loop appends write 2W rows), but the drop-audit
    # override (cfg.pool_capacity) caps the LOGICAL count — entries above
    # the cap are truncated from the LIFO top and counted in `dropped`,
    # exactly what a genuinely undersized pool would lose.
    Q_cap = Q
    if cfg.pool_capacity:
        Q_cap = min(max(int(cfg.pool_capacity), 2 * W), Q)

    pool = jnp.zeros((Q, POOL_COLS), jnp.float32)
    pix = jnp.arange(R, dtype=jnp.int32)
    count = jnp.int32(0)
    if rows_mode:
        cands, masks = [rows0], [masks0]
    else:
        cands, masks = [], []
        for p in (refr_push, refl_push):
            if p is None:
                continue
            cands.append(_pack_entry(p, pix))
            masks.append(p["mask"])
    if cands:
        pool, count = _pool_append(
            pool, count, cands, masks, Q, mode=cfg.stage_mode
        )
    dropped0 = jnp.maximum(count - Q_cap, 0)
    count = jnp.minimum(count, Q_cap)

    max_iters = cfg.max_nodes * ratio
    chunk = max(int(cfg.loop_chunk), 1)

    state = dict(
        pool=pool, count=count, accum=contrib, it=jnp.int32(0),
        dropped=dropped0,
        # per-chunk contribution staging: iteration i of a chunk writes its
        # (W,3) contributions contiguously at slot i (a dynamic_update_slice,
        # ~1 µs) and ONE scatter-add per chunk commits them to the pixel
        # accumulator — a per-iteration (R,3) scatter measured ~0.15 ms in
        # the loop, ~100x the staged form. Dead rows carry an out-of-range
        # pixel index and mode="drop" discards them.
        stage_pix=jnp.full((chunk * W,), jnp.int32(OOB_PIX)),
        stage_contrib=jnp.zeros((chunk * W, 3), jnp.float32),
    )

    def body_one(s, slot):
        pool, count = s["pool"], s["count"]
        start = jnp.maximum(count - W, 0)
        sel_active = start + jnp.arange(W, dtype=jnp.int32) < count

        rows = jax.lax.dynamic_slice_in_dim(pool, start, W, 0)

        if cfg.resort_secondary:
            # sort the serviced batch by origin Morton code: spatially
            # coherent 256-ray kernel tiles cull far more blocks. Order is
            # free (contributions are weight-linear), results are exact.
            oq = jnp.clip(rows[:, PK_O] * 64.0, 0.0, 63.0).astype(jnp.int32)

            def spread(v):  # interleave 6 bits -> 18-bit morton
                v = (v | (v << 8)) & 0x0300F
                v = (v | (v << 4)) & 0x030C3
                v = (v | (v << 2)) & 0x09249
                return v

            key = spread(oq[:, 0]) | (spread(oq[:, 1]) << 1) | (spread(oq[:, 2]) << 2)
            key = jnp.where(sel_active, key, jnp.int32(2**30))  # dead lanes last
            order = jnp.argsort(key)
            rows = jnp.take(rows, order, axis=0)
            sel_active = jnp.take(sel_active, order)
        e = _unpack_entry(rows)
        if rows_mode:
            contrib_w, _, rows_b, masks_b = _eval_node_rows(
                scene, cfg, eps_dist, e["o"], e["d"], e["ior"], e["w"],
                e["budget"], e["from_refl"], sel_active, pix=e["pix"],
                rt=int(cfg.pool_ray_tile),
            )
        else:
            contrib_w, _, refl_p, refr_p = _eval_node(
                scene, cfg, eps_dist, e["o"], e["d"], e["ior"], e["w"],
                e["budget"], e["from_refl"], sel_active,
                rt=int(cfg.pool_ray_tile),
            )
        s = dict(s)
        s["stage_pix"] = jax.lax.dynamic_update_slice_in_dim(
            s["stage_pix"],
            jnp.where(sel_active, e["pix"], jnp.int32(OOB_PIX)),
            slot * W,
            0,
        )
        s["stage_contrib"] = jax.lax.dynamic_update_slice_in_dim(
            s["stage_contrib"],
            jnp.where(sel_active[:, None], contrib_w, 0.0),
            slot * W,
            0,
        )
        # cap so a full append of 2W candidates stays within the logical
        # capacity; with Q_cap at the DFS depth bound this should never
        # engage — count any drop
        capped = jnp.minimum(start, Q_cap - 2 * W)
        s["dropped"] = s["dropped"] + (start - capped)
        count = capped
        if rows_mode:
            k = masks_b.shape[0] // W  # enabled child types (1 or 2)
            cands = [rows_b]
            masks = [masks_b & jnp.tile(sel_active, k)]
        else:
            cands, masks = [], []
            for p in (refr_p, refl_p):
                if p is None:
                    continue
                cands.append(_pack_entry(p, e["pix"]))
                masks.append(p["mask"] & sel_active)
        if cands:
            pool2, count = _pool_append(
                s["pool"], count, cands, masks, Q, mode=cfg.stage_mode
            )
            s["pool"] = pool2
        s["count"] = count
        s["it"] = s["it"] + 1
        return s

    def cond(s):
        return (s["it"] < max_iters) & (s["count"] > 0)

    def guarded(st, i):
        # on-device guard: iterations after convergence are pass-throughs
        # (cheaper than running the kernels on an empty pool, measured)
        return jax.lax.cond(
            st["count"] > 0, lambda s: body_one(s, i), lambda s: s, st
        )

    # the per-chunk contribution commit: scatter-add cost on TPU is ~per-ROW
    # (11 ns/row measured — fusion.47 in the HEAD tile profile), and the
    # staged buffer is sized for the full chunk while typical 1080p tiles
    # execute only ~66 of 128 iterations. commit_splits > 1 divides the
    # commit into cond-gated segments so the unexecuted SUFFIX of the chunk
    # (the pool stays drained once drained, so executed iterations form a
    # prefix) skips its scatter-add entirely. Exact: skipped segments hold
    # only rows the n_exec mask would discard anyway.
    splits = max(int(getattr(cfg, "commit_splits", 1)), 1)
    while chunk % splits:
        splits -= 1
    rows_per = (chunk // splits) * W

    def chunk_body(s):
        it0 = s["it"]
        s = jax.lax.fori_loop(0, chunk, lambda i, st: guarded(st, i), s)
        # executed iterations form a prefix of the chunk (once the pool
        # drains it stays drained); mask the rest so stale staging rows from
        # a previous chunk are never re-committed
        n_exec = s["it"] - it0
        if splits == 1:
            rows = jnp.arange(chunk * W, dtype=jnp.int32)
            pix = jnp.where(
                rows < n_exec * W, s["stage_pix"], jnp.int32(OOB_PIX)
            )
            s["accum"] = s["accum"].at[pix].add(s["stage_contrib"], mode="drop")
            return s
        for k in range(splits):
            def commit(acc, s=s, k=k, n_exec=n_exec):
                pix_k = jax.lax.dynamic_slice_in_dim(
                    s["stage_pix"], k * rows_per, rows_per
                )
                con_k = jax.lax.dynamic_slice_in_dim(
                    s["stage_contrib"], k * rows_per, rows_per
                )
                rows = (
                    jnp.arange(rows_per, dtype=jnp.int32) + k * rows_per
                )
                pix_k = jnp.where(
                    rows < n_exec * W, pix_k, jnp.int32(OOB_PIX)
                )
                return acc.at[pix_k].add(con_k, mode="drop")

            s["accum"] = jax.lax.cond(
                n_exec * W > k * rows_per, commit, lambda a: a, s["accum"]
            )
        return s

    state = jax.lax.while_loop(cond, chunk_body, state)
    return state["accum"], state["dropped"]


def _body_full(scene, cfg, eps_dist, s):
    """One pop per pixel per iteration (no compaction)."""
    s, e, active = _pop(s)
    contrib, _, refl_p, refr_p = _eval_node(
        scene, cfg, eps_dist, e["o"], e["d"], e["ior"], e["w"], e["budget"],
        e["from_refl"], active,
    )
    s = dict(s)
    s["accum"] = s["accum"] + contrib
    s["it"] = s["it"] + 1
    s = _push(s, refr_p)
    s = _push(s, refl_p)
    return s
