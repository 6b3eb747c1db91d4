"""Top-level renderer: tiling, AA sample expansion, host assembly.

When no progress callback is given the whole frame is traced as ONE
program (`lax.map` over tiles) — per-program dispatch is expensive on
remote-attached TPUs; with a callback, tiles launch individually and commit
progressively like the reference's producer/consumer window.

The analogue of the reference's `RaytracerRenderer` + `Renderer` trait
(ref renderer/raytracer_renderer.rs:1140-1379, renderer/mod.rs:80-210): the
reference chops the image into cache-line/SIMD-aligned RENDER_STRIDE tiles
and feeds them to rayon workers; here the image is chopped into ray
wavefronts sized for the TPU (`cfg.tile_rays`) and each wavefront runs one
jitted trace. Finished tiles are committed to the host framebuffer as they
arrive, so partial renders stay observable (the reference's producer/consumer
window behaviour).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import numpy as np

from .config import RenderConfig
from .framebuffer import ImageBuffer
from .ops.camera import (
    antialiasing_offsets,
    antialiasing_weighted_offsets,
    pixel_scene_coords,
    tile_major_order,
)
from .ops.trace import trace_rays, trace_rays_tiled, trace_rays_tiled_u32
from .scene.builder import Scene
from .scene.device import DeviceScene, build_device_scene
from .utils.timing import RenderTiming, TileStats


@dataclasses.dataclass(frozen=True)
class FramePlan:
    """One frame's ray layout, shared by the renderer AND bench.py so both
    hit the same kernel-tile culling behaviour (tile-major square patches
    keep each 256-ray Pallas tile spatially tight; with row-major order the
    per-ray block gates never agree to skip anything — see
    ops/camera.py:tile_major_order)."""

    order: np.ndarray  # tile-major position -> row-major pixel index
    offsets: np.ndarray  # (U, 3) AA origin offsets (deduped when configured)
    weights: np.ndarray  # (U,) per-sample weights, sum to 1
    pix_per_tile: int
    n_tiles: int

    @property
    def aa(self) -> int:  # samples actually traced per pixel
        return self.offsets.shape[0]


def fetch_schedule(n_tiles: int, max_groups: int = 8, align: int = 1) -> list:
    """Balanced front-loaded fetch-group sizes summing to `n_tiles`
    (cfg.fetch_taper): q+1-sized groups first, then q-sized, where
    q = n_tiles // groups. Properties that matter:

    - ANY n_tiles >= 1 splits (lifts the uniform split's divisibility
      requirement, so e.g. 7-tile frames still overlap);
    - the LAST group is the small size — the exposed wall tail is the last
      group's host fetch, so a smaller tail fetch hides better (the
      steeper 1,1,2,2,3,... taper measured a wash vs uniform once fetches
      stream async — scripts/tpu_taper_ab.py — so only the tail matters);
    - AT MOST 2 DISTINCT GROUP SIZES. Each distinct size is a separately
      compiled XLA executable of the whole frame program; the steep taper
      at 16 tiles produced sizes {4,3,2,1} = 4 cold compiles where the
      balanced schedule compiles 1 ([2]*8). BENCH_r03 session 1 paid
      264.8 s cold for exactly this.

    Group count is capped at max_groups — program-switch bubbles grow with
    group count (G=16 measured worse than G=8, scripts/tpu_overlap_bench.py).

    `align` > 1 schedules in units of `align` tiles (n_tiles must divide):
    under a device mesh every group must give each chip the same local tile
    count, so groups are multiples of the mesh size."""
    if align > 1:
        assert n_tiles % align == 0, (n_tiles, align)
        return [s * align for s in fetch_schedule(n_tiles // align, max_groups)]
    g = max(1, min(max_groups, n_tiles))
    q, r = divmod(n_tiles, g)
    return [q + 1] * r + [q] * (g - r)


def _warn_drops(n_dropped: int) -> None:
    """Loud pool/stack saturation warning, shared by every production path
    (the reference recursion never drops subtrees — any nonzero count means
    reflection/refraction energy was lost, raytracer_renderer.rs:216-248)."""
    if n_dropped:
        print(
            f"WARNING: ray pool/stack saturated — {n_dropped} pending "
            "secondary rays dropped (reflection/refraction energy lost)"
        )


def plan_frame(cfg: RenderConfig) -> FramePlan:
    H, W = cfg.height, cfg.width
    total_pixels = H * W
    if cfg.anti_aliasing:
        if cfg.dedupe_aa and not cfg.packet_mode:
            offsets, weights = antialiasing_weighted_offsets(cfg, cfg.aa_packet_lanes)
        else:
            offsets = antialiasing_offsets(cfg, cfg.aa_packet_lanes)
            weights = np.full(
                (offsets.shape[0],), 1.0 / cfg.total_aa_rays, np.float32
            )
    else:
        offsets = np.zeros((1, 3), np.float32)
        weights = np.ones((1,), np.float32)
    U = offsets.shape[0]
    # don't let tile padding exceed the frame: shrink the tile when the
    # image is smaller than one tile
    eff_tile = min(
        cfg.tile_rays, max(1024, ((total_pixels * U + 1023) // 1024) * 1024)
    )
    pix_per_tile = max(eff_tile // U, 1)
    n_tiles = (total_pixels + pix_per_tile - 1) // pix_per_tile
    return FramePlan(
        order=tile_major_order(W, H),
        offsets=offsets,
        weights=weights,
        pix_per_tile=pix_per_tile,
        n_tiles=n_tiles,
    )


def build_frame_rays(cfg: RenderConfig, plan: FramePlan):
    """(o_all, d_all) each (n_tiles, pix_per_tile * U, 3) float32, pixels in
    tile-major order, AA samples consecutive per pixel; padding rays beyond
    the frame get a harmless +z direction."""
    H, W = cfg.height, cfg.width
    total_pixels = H * W
    U = plan.aa
    focus = np.asarray(cfg.camera.render_ray_focus, np.float32)
    px, py = np.meshgrid(np.arange(W), np.arange(H))
    px = px.reshape(-1)[plan.order]
    py = py.reshape(-1)[plan.order]
    coords = pixel_scene_coords(cfg, px, py)
    dirs = (coords - focus[None, :]).astype(np.float32)

    n_rays = plan.n_tiles * plan.pix_per_tile * U
    o_all = np.zeros((n_rays, 3), np.float32)
    d_all = np.tile(np.float32([0, 0, 1]), (n_rays, 1))
    o_all[: total_pixels * U] = (
        coords[:, None, :] + plan.offsets[None, :, :]
    ).reshape(-1, 3)
    d_all[: total_pixels * U] = np.broadcast_to(
        dirs[:, None, :], (total_pixels, U, 3)
    ).reshape(-1, 3)
    T = plan.pix_per_tile * U
    return (
        o_all.reshape(plan.n_tiles, T, 3),
        d_all.reshape(plan.n_tiles, T, 3),
    )


def frame_order_device(cfg: RenderConfig, plan: FramePlan, n_pad: int):
    """Device inputs for trace_rays_tiled_u32_gen: the tile-major pixel
    permutation padded with -1 to n_pad tiles (4 B/pixel-slot int32,
    uploaded once) and the AA offset table."""
    import jax.numpy as jnp

    slots = n_pad * plan.pix_per_tile
    order_pad = np.full((slots,), -1, np.int32)
    order_pad[: plan.order.shape[0]] = plan.order
    return jnp.asarray(order_pad), jnp.asarray(plan.offsets)


class RaytracerRenderer:
    def __init__(self, cfg: RenderConfig):
        self.cfg = cfg.resolve_use_pallas()
        if self.cfg.packet_mode and not self.cfg.anti_aliasing:
            # through the renderer, packets ARE the 8 AA lanes of one pixel
            # (config.py packet_mode); without AA, 8 unrelated pixels would
            # share spawn/budget decisions. (trace_rays itself accepts any
            # hand-built 8-lane-aligned wavefront — see tests/test_packet_mode.)
            raise ValueError("packet_mode requires anti_aliasing")

    def render(
        self,
        scene: Scene,
        progress: Optional[Callable[[ImageBuffer, float], None]] = None,
    ) -> ImageBuffer:
        if self.cfg.scene_backface_culling:
            scene = Scene.backface_culling(scene, np.array([0.0, 0.0, 1.0]))
        dscene = build_device_scene(scene, self.cfg)
        return self.render_device(dscene, progress)

    def get_pixel_color(self, dscene: DeviceScene, x: int, y: int):
        """Single-pixel convenience (ref raytracer_renderer.rs:1140-1188):
        returns (linear RGB (3,), valid) with AA when configured."""
        cfg = self.cfg
        cam = cfg.camera
        plan = plan_frame(cfg)
        coords = pixel_scene_coords(cfg, np.asarray([x]), np.asarray([y]))[0]
        direction = coords - np.asarray(cam.render_ray_focus, np.float32)
        o = coords[None, :] + plan.offsets
        d = np.broadcast_to(direction, (plan.aa, 3)).copy()
        color, valid = trace_rays(dscene, cfg, jax.numpy.asarray(o), jax.numpy.asarray(d))
        color = np.asarray(color)
        valid = np.asarray(valid)
        out = (np.where(valid[:, None], color, 0.0) * plan.weights[:, None]).sum(axis=0)
        return out.astype(np.float32), bool(valid.any())

    def render_device(
        self,
        dscene: DeviceScene,
        progress: Optional[Callable[[ImageBuffer, float], None]] = None,
    ) -> ImageBuffer:
        cfg = self.cfg
        H, W = cfg.height, cfg.width
        timing = RenderTiming()
        stats = TileStats()  # per-tile seconds (ref renderer/mod.rs:39-78)

        plan = plan_frame(cfg)
        U = plan.aa
        weights = plan.weights
        total_pixels = H * W
        pix_per_tile = plan.pix_per_tile

        buf = ImageBuffer(W, H)
        flat_color = buf.color.reshape(-1, 3)
        flat_valid = buf.valid.reshape(-1)

        import time as _time

        if progress is None:
            # one fused program for the whole frame
            n_tiles = plan.n_tiles
            # multi-chip mode: shard the tile axis over a device mesh
            # (scene replicated, rays data-parallel — SURVEY.md §2.3)
            use_mesh = cfg.devices > 1
            if use_mesh:
                from .parallel.mesh import make_mesh, trace_tiles_sharded

                mesh = make_mesh(cfg.devices)
                ndev = mesh.devices.size
            align = cfg.devices if use_mesh else 1
            n_avail = (n_tiles + align - 1) // align * align
            group = cfg.tiles_per_program or n_avail
            if use_mesh:  # each launch's tile count must divide the mesh
                group = max(group // ndev * ndev, ndev)
            # pad the tile count so every launch reuses one executable (and,
            # under a mesh, every device gets the same tile count)
            n_pad = (
                n_avail if group >= n_avail
                else (n_tiles + group - 1) // group * group
            )
            ws = bool(cfg.render_timing_debug) and not use_mesh
            # device-side pixel encode: the AA reduction + u8/u32 pack runs
            # in the frame program and the host fetches 4 bytes/pixel (the
            # reference's framebuffer format) — under a mesh each chip
            # outputs 4 bytes per LOCAL pixel, shrinking the sharded->host
            # transfer identically. Falls back to the f32 path when per-tile
            # debug stats are requested.
            use_u32 = cfg.device_encode and not ws
            fg = cfg.fetch_groups
            # overlapped fetch applies under a mesh too: groups are
            # scheduled in units of the mesh size so every chip gets the
            # same local tile count per program (VERDICT r3 #1 — the mesh
            # path must run the same wall-optimized pipeline as one chip)
            align_u = ndev if use_mesh else 1
            n_units = n_pad // align_u
            overlap_ok = (
                group >= n_pad
                and fg > 1
                and (
                    (cfg.fetch_taper and n_units >= 2)
                    or (n_units >= fg and n_units % fg == 0)
                )
            )
            # device-side ray generation (cfg.device_ray_gen): the overlap
            # path takes the compact pixel permutation instead of host-built
            # (o, d) buffers — skip building them entirely
            use_gen = use_u32 and cfg.device_ray_gen and overlap_ok
            if not use_gen:
                o_all, d_all = build_frame_rays(cfg, plan)
                if n_pad != n_tiles:
                    o_all = np.concatenate(
                        [o_all, np.zeros((n_pad - n_tiles,) + o_all.shape[1:], np.float32)]
                    )
                    d_all = np.concatenate(
                        [d_all, np.tile(np.float32([0, 0, 1]), (n_pad - n_tiles, o_all.shape[1], 1))]
                    )
            if use_u32:
                w_dev = jax.numpy.asarray(weights)

                def u32_group(o_np, d_np):
                    if use_mesh:
                        from .parallel.mesh import trace_tiles_sharded_u32

                        u, dr = trace_tiles_sharded_u32(
                            dscene, cfg, jax.numpy.asarray(o_np),
                            jax.numpy.asarray(d_np), w_dev, mesh,
                        )
                    else:
                        u, dr = trace_rays_tiled_u32(
                            dscene, cfg, jax.numpy.asarray(o_np),
                            jax.numpy.asarray(d_np), w_dev,
                        )
                    return np.asarray(u), int(np.asarray(dr).sum())

                if overlap_ok:
                    # overlapped fetch (cfg.fetch_groups): dispatch every
                    # group before fetching any, so group g's host transfer
                    # rides while g+1 computes — same-session 810 -> 718 ms
                    # at 1080p (PERF.md round 3). Bit-identical: grouping
                    # only batches the same per-tile lax.map differently.
                    # fetch_taper front-loads the sizes (the exposed tail
                    # is the LAST group's fetch — 725 vs 740 ms uniform).
                    if cfg.fetch_taper:
                        sizes = fetch_schedule(
                            n_pad, max_groups=max(fg, 2), align=align_u
                        )
                    else:
                        sizes = [n_pad // fg] * fg
                    if use_mesh:
                        # replicate the scene once; every group program
                        # reuses the committed buffers
                        from .parallel.mesh import shard_scene

                        dscene = shard_scene(dscene, mesh)
                    parts, gs = [], 0
                    if use_gen:
                        from .ops.trace import trace_rays_tiled_u32_gen

                        order_dev, offs_dev = frame_order_device(cfg, plan, n_pad)
                        P = plan.pix_per_tile
                        for sz in sizes:
                            if use_mesh:
                                from .parallel.mesh import (
                                    trace_tiles_sharded_u32_gen,
                                )

                                parts.append(
                                    trace_tiles_sharded_u32_gen(
                                        dscene, cfg,
                                        order_dev[gs * P : (gs + sz) * P],
                                        offs_dev, w_dev, mesh, n_tiles=sz,
                                    )
                                )
                            else:
                                parts.append(
                                    trace_rays_tiled_u32_gen(
                                        dscene, cfg,
                                        order_dev[gs * P : (gs + sz) * P],
                                        offs_dev, w_dev, n_tiles=sz,
                                    )
                                )
                            gs += sz
                    else:
                        o_j = jax.numpy.asarray(o_all)
                        d_j = jax.numpy.asarray(d_all)
                        for sz in sizes:
                            if use_mesh:
                                from .parallel.mesh import (
                                    trace_tiles_sharded_u32,
                                )

                                parts.append(
                                    trace_tiles_sharded_u32(
                                        dscene, cfg, o_j[gs : gs + sz],
                                        d_j[gs : gs + sz], w_dev, mesh,
                                    )
                                )
                            else:
                                parts.append(
                                    trace_rays_tiled_u32(
                                        dscene, cfg, o_j[gs : gs + sz],
                                        d_j[gs : gs + sz], w_dev,
                                    )
                                )
                            gs += sz
                    # queue every D2H up front: results stream to the host
                    # as groups finish instead of one blocking relay round
                    # trip per group (-35 ms median paired at 1080p,
                    # scripts/tpu_taper_ab.py)
                    for p, dr in parts:
                        p.copy_to_host_async()
                        dr.copy_to_host_async()
                    u32 = np.concatenate([np.asarray(p) for p, _ in parts])[:n_tiles]
                    n_dropped = int(sum(np.asarray(dr).sum() for _, dr in parts))
                elif group >= n_pad:
                    u32, n_dropped = u32_group(o_all, d_all)
                else:
                    us = [
                        u32_group(o_all[gs : gs + group], d_all[gs : gs + group])
                        for gs in range(0, n_pad, group)
                    ]
                    u32 = np.concatenate([u for u, _ in us])[:n_tiles]
                    n_dropped = int(sum(dr for _, dr in us))
                _warn_drops(n_dropped)
                fb = np.zeros((total_pixels,), np.uint32)
                fb[plan.order] = u32.reshape(-1)[:total_pixels]
                buf = ImageBuffer.from_u32(fb, W, H)
                timing.next()
                buf.timing = timing
                buf.tile_stats = stats
                return buf
            if group >= n_pad and use_mesh:
                c, v = trace_tiles_sharded(
                    dscene, cfg, jax.numpy.asarray(o_all), jax.numpy.asarray(d_all),
                    mesh,
                )
                color = np.asarray(c)[:n_tiles]
                valid = np.asarray(v)[:n_tiles]
            elif group >= n_pad:
                out = trace_rays_tiled(
                    dscene, cfg, jax.numpy.asarray(o_all), jax.numpy.asarray(d_all),
                    with_stats=ws,
                )
                if ws:
                    color, valid, tstats = out
                    _warn_drops(int(tstats["dropped"]))
                else:
                    color, valid = out
                color, valid = np.asarray(color), np.asarray(valid)
            else:
                # bound single-program duration: cap each launch at `group`
                cs, vs = [], []
                for gs in range(0, n_pad, group):
                    oj = jax.numpy.asarray(o_all[gs : gs + group])
                    dj = jax.numpy.asarray(d_all[gs : gs + group])
                    if use_mesh:
                        c, v = trace_tiles_sharded(dscene, cfg, oj, dj, mesh)
                    else:
                        c, v = trace_rays_tiled(dscene, cfg, oj, dj)
                    cs.append(np.asarray(c))
                    vs.append(np.asarray(v))
                color = np.concatenate(cs)[:n_tiles]
                valid = np.concatenate(vs)[:n_tiles]
            color = color.reshape(n_tiles * pix_per_tile, U, 3)[:total_pixels]
            valid = valid.reshape(n_tiles * pix_per_tile, U)[:total_pixels]
            # weighted AA reduce (weights are 1/total, or multiplicity/total
            # with dedupe — ref rs:1001-1015 color_sum/total, misses black)
            frame_color = (
                np.where(valid[..., None], color, 0.0) * weights[None, :, None]
            ).sum(axis=1)
            frame_valid = valid.any(axis=1)
            # scatter back through the tile-major permutation
            idx = plan.order[frame_valid]
            flat_color[idx] = frame_color[frame_valid]
            flat_valid[idx] = True
            timing.next()
            buf.timing = timing
            buf.tile_stats = stats
            return buf

        # progressive path: per-tile launches committed as they finish
        # (the reference's producer/consumer window, main.rs:330-347)
        focus = np.asarray(cfg.camera.render_ray_focus, np.float32)
        px_rm, py_rm = np.meshgrid(np.arange(W), np.arange(H))
        px_o = px_rm.reshape(-1)[plan.order]
        py_o = py_rm.reshape(-1)[plan.order]
        for start in range(0, total_pixels, pix_per_tile):
            t_tile = _time.monotonic()
            end = min(start + pix_per_tile, total_pixels)
            n = end - start
            coords = pixel_scene_coords(cfg, px_o[start:end], py_o[start:end])
            dirs = coords - focus[None, :]
            origins = coords[:, None, :] + plan.offsets[None, :, :]  # (n,U,3)
            dirs_rep = np.broadcast_to(dirs[:, None, :], (n, U, 3))

            o = origins.reshape(-1, 3)
            d = dirs_rep.reshape(-1, 3).copy()
            if n < pix_per_tile:  # pad for a stable jit shape
                pad = (pix_per_tile - n) * U
                o = np.concatenate([o, np.zeros((pad, 3), np.float32)])
                d = np.concatenate([d, np.tile(np.float32([0, 0, 1]), (pad, 1))])

            color, valid = trace_rays(dscene, cfg, jax.numpy.asarray(o), jax.numpy.asarray(d))
            color = np.asarray(color)[: n * U].reshape(n, U, 3)
            valid = np.asarray(valid)[: n * U].reshape(n, U)

            # AA average: every sample contributes weight*color (misses add
            # black); pixel is written iff any sample hit
            # (ref raytracer_renderer.rs:918-1016)
            tile_color = (
                np.where(valid[..., None], color, 0.0) * weights[None, :, None]
            ).sum(axis=1)
            tile_valid = valid.any(axis=1)

            idx = plan.order[start:end][tile_valid]
            flat_color[idx] = tile_color[tile_valid]
            flat_valid[idx] = True

            if cfg.simulate_slow_render:  # ref renderer/mod.rs:126-129
                _time.sleep(70e-6 * n)
            stats.push(_time.monotonic() - t_tile)
            if progress is not None:
                timing.next()
                progress(buf, end / total_pixels)

        timing.next()
        buf.timing = timing
        buf.tile_stats = stats
        if cfg.render_timing_debug:  # ref renderer/mod.rs:39-78
            stats.print()
        return buf
