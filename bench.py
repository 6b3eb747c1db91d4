"""Headline benchmark: 1920x1080 semesterbild with `realistic` features
(reflections + refractions, hard shadows) on one TPU chip.

North star (BASELINE.json): < 100 ms/frame at <= 1e-3 RMSE vs the reference.
Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} where
vs_baseline = 100ms / measured_ms (>= 1.0 means the target is met).

Env knobs:
  BENCH_WIDTH/BENCH_HEIGHT  — override resolution (default 1920x1080)
  BENCH_REPEATS             — timed repetitions (default 3, best taken)
  BENCH_SMALL=1             — 240x135 quick sanity run
  BENCH_CONFIG              — one of BASELINE.json's "configs":
      realistic (default) — reflections + light_reflections + refractions
      default             — primary rays, Blinn-Phong, hard shadows
      anti_aliasing       — rotation_scale + randomness jitter supersampling
      soft_shadows        — Poisson light-cloud shadow sampling
      extreme             — high_quality_model OBJ + extreme_quality
                            (implies AA + soft shadows; ref Cargo.toml:62-83);
                            defaults to 480x270 — override via BENCH_WIDTH
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MS = 100.0  # BASELINE.json north-star frame budget

# feature sets per BASELINE.json "configs" (mirroring ref Cargo.toml:62-83
# feature edges; scene_backface_culling is a reference default feature)
CONFIGS = {
    "default": dict(),
    "anti_aliasing": dict(
        anti_aliasing_rotation_scale=True, anti_aliasing_randomness=True
    ),
    "soft_shadows": dict(soft_shadows=True),
    "realistic": dict(reflections=True, light_reflections=True, refractions=True),
    # the reference runs the semesterbild example with its DEFAULT features
    # still enabled (Cargo features are additive; Cargo.toml:64 defaults
    # include both AA jitter variants) — so extreme includes the randomized
    # rotated-grid AA, giving ~17 unique rays/pixel after exact dedupe
    # rather than the degenerate 2 of the bare 24-entry table
    "extreme": dict(
        reflections=True,
        light_reflections=True,
        refractions=True,
        anti_aliasing_rotation_scale=True,
        anti_aliasing_randomness=True,
        extreme_quality=True,
        high_quality_model=True,
    ),
}


def multi_session():
    """Relay-session variance mitigation (~2x between sessions, PERF.md):
    run the bench in up to BENCH_SESSIONS fresh child processes (each gets
    its own relay session; the committed repo-local .jax_cache makes repeat
    compiles cheap) and report the best session's line.

    Driver-timeout hardening (round 5 — BENCH_r04 recorded rc=124 with NO
    final metric line because session 1 paid a 318 s cold compile and the
    driver killed sessions 2-3):
      * the best-so-far final metric line is printed+flushed to stdout after
        EVERY completed session, so a timeout mid-later-session still leaves
        a valid headline as the last stdout line;
      * sessions are adaptive under a global BENCH_DEADLINE (default 540 s):
        another session starts only if the fastest completed session's wall
        time (plus margin) still fits — a 300 s cold-compile session stops
        the run at 1 instead of feeding a doomed session to the timeout.
    """
    import subprocess

    # 5 sessions (was 3): relay epochs swing 2x between sessions and the
    # protocol records best-of — with warm compiles at ~20-60 s/session the
    # BENCH_DEADLINE budget fits 4-6 sessions, and the adaptive stop below
    # cuts back automatically when a cold/slow session eats the budget
    n = int(os.environ.get("BENCH_SESSIONS", 5))
    # relay outages manifest as an indefinite hang on the first device op
    # (observed: >25 min dead relay); bound each session so the bench
    # always terminates with the best of whatever sessions succeeded
    session_timeout = float(os.environ.get("BENCH_SESSION_TIMEOUT", 1800))
    deadline = float(os.environ.get("BENCH_DEADLINE", 540))
    t_start = time.monotonic()
    results = []
    best = None
    session_walls = []
    env = dict(os.environ, BENCH_CHILD="1")
    for s in range(n):
        elapsed = time.monotonic() - t_start
        if s > 0:
            # predict the next session's cost from the cheapest completed
            # one (warm sessions are near-identical); 1.2x margin
            est = min(session_walls) * 1.2 if session_walls else deadline
            if elapsed + est > deadline:
                sys.stderr.write(
                    f"stopping after {s} session(s): elapsed {elapsed:.0f}s"
                    f" + est {est:.0f}s exceeds deadline {deadline:.0f}s\n"
                )
                break
        t_s = time.monotonic()
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True,
                timeout=min(session_timeout, max(60, deadline - elapsed)),
            )
        except subprocess.TimeoutExpired as e:
            err = e.stderr or b""
            if isinstance(err, bytes):  # TimeoutExpired ignores text=True
                err = err.decode(errors="replace")
            sys.stderr.write(
                f"session {s}: timed out after {time.monotonic()-t_s:.0f}s "
                f"(relay hang or cold compile > budget)\n{err}"
            )
            # salvage: the child prints a best-so-far line after EVERY timed
            # repeat, so a kill mid-session still yields its completed
            # repeats' best
            out = e.stdout or b""
            if isinstance(out, bytes):
                out = out.decode(errors="replace")
            line = (out.strip().splitlines() or [""])[-1]
            try:
                results.append(json.loads(line))
            except json.JSONDecodeError:
                pass
            if results:
                best = min(results, key=lambda r: r["value"])
                print(json.dumps(best), flush=True)
            break  # out of budget — whatever best we have is the answer
        session_walls.append(time.monotonic() - t_s)
        sys.stderr.write(p.stderr)
        line = (p.stdout.strip().splitlines() or [""])[-1]
        try:
            results.append(json.loads(line))
        except json.JSONDecodeError:
            sys.stderr.write(f"session {s}: no JSON ({p.returncode})\n")
            continue
        new_best = min(results, key=lambda r: r["value"])
        if new_best is not best:
            best = new_best
            print(json.dumps(best), flush=True)  # best-so-far, survives kill
    if not results:
        sys.exit(1)
    sys.stderr.write(
        "session bests (ms): " + ", ".join(str(r["value"]) for r in results) + "\n"
    )
    if best is not None and results and min(results, key=lambda r: r["value"]) is not best:
        print(json.dumps(min(results, key=lambda r: r["value"])), flush=True)


def main():
    if os.environ.get("BENCH_CHILD") != "1" and int(os.environ.get("BENCH_SESSIONS", 3)) > 1:
        return multi_session()
    import jax

    if os.environ.get("BENCH_CPU") == "1":
        # protocol self-test without a chip (the axon plugin ignores the
        # JAX_PLATFORMS env var, so this must be a config update)
        jax.config.update("jax_platforms", "cpu")
    # repo-local persistent compile cache (gitignored): /tmp is wiped with
    # the VM between driver rounds (observed round 4: 7 entries at session
    # start -> 263.7 s cold compile), while the repo workspace survives —
    # a bench run in any earlier session of the same round (or a prior
    # round on the same image) pre-warms every later session
    cache = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # CRITICAL for the committed cache to hit from a fresh clone — two
    # sources of checkout-path dependence in the cache key, both measured
    # (identical code at /root/repo vs a fresh clone produced different
    # keys and a full recompile):
    #  1. jax injects the ABSOLUTE autotune-cache path into the compile
    #     options (jax._src.cache_key does not clear it). The XLA side
    #     caches are GPU-only features; disable them.
    #  2. the Mosaic kernel payloads (tpu_custom_call backend_config)
    #     embed python source-file paths; MLIR strip-debuginfo cannot
    #     reach inside the serialized kernel module. Canonicalizing every
    #     source path to "" makes the lowered modules byte-identical
    #     across checkouts (verified with two clones).
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    jax.config.update("jax_hlo_source_file_canonicalization_regex", ".*")
    import jax.numpy as jnp

    from hslu_i.ba_raytracing.f2501_raytracer_tpu import (
        RenderConfig,
        build_device_scene,
    )
    from hslu_i.ba_raytracing.f2501_raytracer_tpu.models import build
    from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.trace import (
        trace_rays_tiled,
        trace_rays_tiled_u32,
        trace_rays_tiled_u32_gen,
    )
    from hslu_i.ba_raytracing.f2501_raytracer_tpu.renderer import (
        build_frame_rays,
        fetch_schedule,
        plan_frame,
    )
    from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.builder import Scene

    config_name = os.environ.get("BENCH_CONFIG", "realistic")
    if config_name not in CONFIGS:
        sys.exit(f"BENCH_CONFIG must be one of {sorted(CONFIGS)}")
    small = os.environ.get("BENCH_SMALL") == "1"
    dflt_w, dflt_h = (240, 135) if small else (1920, 1080)
    if config_name == "extreme" and not small:
        dflt_w, dflt_h = 480, 270  # ~500 rays/pixel; full-res via BENCH_WIDTH
    width = int(os.environ.get("BENCH_WIDTH", dflt_w))
    height = int(os.environ.get("BENCH_HEIGHT", dflt_h))
    repeats = int(os.environ.get("BENCH_REPEATS", 4))

    cfg = RenderConfig(
        width=width,
        height=height,
        scene_backface_culling=True,
        # 131072-ray tiles + 8 overlapped fetch groups measured fastest at
        # 1080p (same-session sweep, scripts/tpu_overlap_bench.py round 3:
        # 718 ms vs 810 at 262144/G=8 and 755 at 65536/G=8 — 16 tiles give
        # the fetch pipeline 2-tile groups to hide behind compute).
        # extreme prefers the bigger 262144 tile (480x270: 43.9 s vs 49.8 s
        # at 131072, same session; full-res 1620x1350: ~690 s warm vs 704 s)
        tile_rays=int(
            os.environ.get(
                "BENCH_TILE", 262144 if config_name == "extreme" else 131072
            )
        ),
        max_nodes=int(os.environ.get("BENCH_MAX_NODES", 48)),
        weight_cutoff=float(os.environ.get("BENCH_WEIGHT_CUTOFF", 1e-3)),
        # compiled Pallas needs a real TPU; the BENCH_CPU protocol self-test
        # defaults to the XLA path (override with BENCH_PALLAS=1 + interpret)
        use_pallas=os.environ.get(
            "BENCH_PALLAS", "0" if os.environ.get("BENCH_CPU") == "1" else "1"
        ) == "1",
        compaction_ratio=int(os.environ.get("BENCH_COMPACT", 64)),
        # 512-ray kernel tiles beat 256 by ~10% at 1080p (fewer kernel
        # instances at the same pair work; scripts/tpu_sweep_r3.py round 3:
        # 61.3 vs 68.3 ms/131k-tile, bit-identical image)
        kernel_ray_tile=int(os.environ.get("BENCH_RAY_TILE", 512)),
        # 96 (was 128): the per-chunk contribution commit scatters
        # chunk*W rows whether or not the tile executed them; the r5 tile
        # census (docs/tile_census_r5.json) puts frame commit slots at
        # 2944 (chunk=128) vs 2496 (chunk=96) with per-commit fixed cost
        # ~0.26 ms -> ~10 ms device/frame saved by the slot model
        # (fusion.47 device events: 2.96 ms @128, 1.70 @96 on a 66-iter
        # tile)
        loop_chunk=int(os.environ.get("BENCH_LOOP_CHUNK", 96)),
        # 0 = auto: the library resolves the measured-optimum block size per
        # regime (scene/device.py::_resolve_block — hq-mesh 256, plain 64 at
        # >=1e6-pixel frames, else 512; sweeps in PERF.md). The old
        # resolution-only rule put full-res extreme on B=64, 1.58x slower
        # on the hq-mesh light kernel than 256
        triangle_block=int(os.environ.get("BENCH_TRI_BLOCK", 0)),
        # cap tiles per launched program (heavy configs can outlive the
        # relay worker watchdog ~4 min in a single program; see PERF.md).
        # extreme at FULL RES keeps 4-tile chunks (one unchunked program is
        # a guaranteed worker kill); at the default 480x270 the overlap
        # path's programs are ~3 s each, and the overlapped/tapered
        # async-fetch pipeline measured 26.83 s vs 29.18 s at TPP=4
        # (same-session interleaved, bit-identical — r5,
        # scripts/tpu_extreme_tpp_ab.py)
        tiles_per_program=int(
            os.environ.get(
                "BENCH_TPP",
                4 if config_name == "extreme" and width * height >= 10**6
                else 0,
            )
        ),
        # multi-chip: shard the frame's tile axis over N devices (needs N
        # attached chips; validated on the 8-way virtual CPU mesh in tests)
        devices=int(os.environ.get("BENCH_DEVICES", 1)),
        # device-side u32 pixel encode + exact AA dedupe (renderer defaults)
        device_encode=os.environ.get("BENCH_U32", "1") == "1",
        dedupe_aa=os.environ.get("BENCH_DEDUPE", "1") == "1",
        # pool staging/commit machinery knobs (defaults measured:
        # PERF.md "Pool staging machinery" and scripts/tpu_commit_ab.py)
        stage_mode=os.environ.get("BENCH_STAGE", "scatter"),
        commit_splits=int(os.environ.get("BENCH_COMMIT_SPLITS", 1)),
        **CONFIGS[config_name],
    )

    scene = build("semesterbild", cfg)
    scene = Scene.backface_culling(scene, np.array([0.0, 0.0, 1.0]))
    if os.environ.get("BENCH_AUTOTUNE") == "1":
        # same-session triangle_block sweep on one representative tile
        # (image-identical across candidates; costs one compile per new
        # candidate, amortized by the persistent cache)
        from hslu_i.ba_raytracing.f2501_raytracer_tpu.tune import autotune

        res = autotune(
            scene, cfg, candidates=(32, 64, 128, 256, 512), repeats=2,
            tile=min(cfg.tile_rays, 131072), verbose=True,
        )
        cfg, dscene = res.cfg, res.device_scene
        sys.stderr.write(f"autotuned triangle_block={res.tuned_block}\n")
    else:
        dscene = build_device_scene(scene, cfg)

    # ray layout + AA expansion: the SAME plan the library renderer uses
    # (tile-major square patches for kernel-tile culling; deduped weighted
    # AA samples — renderer.plan_frame)
    n_pix = width * height
    plan = plan_frame(cfg)
    aa = plan.aa
    n_rays = n_pix * aa
    n_tiles = plan.n_tiles
    # device-side ray generation (default): the frame program takes the
    # compact pixel permutation (4 B/pixel, uploaded once) and rebuilds the
    # rays bit-identically in-program — no host (o, d) buffers at all
    # (24·aa B/pixel; ~0.9 GB at extreme full res). BENCH_RAYGEN=0 restores
    # the host build. Mesh mode runs the SAME pipeline per chip
    # (trace_tiles_sharded_u32_gen — VERDICT r3 #1).
    raygen = (
        os.environ.get("BENCH_RAYGEN", "1") == "1"
        and cfg.device_encode
    )
    if raygen:
        from hslu_i.ba_raytracing.f2501_raytracer_tpu.renderer import (
            frame_order_device,
        )

        if cfg.devices > 1:  # pad the tile axis for equal per-device tiles
            n_tiles = (
                (n_tiles + cfg.devices - 1) // cfg.devices * cfg.devices
            )
        order_dev, offs_dev = frame_order_device(cfg, plan, n_tiles)
        pixt = plan.pix_per_tile
        o_tiles = d_tiles = None
    else:
        o_np, d_np = build_frame_rays(cfg, plan)
        tile = o_np.shape[1]
        if cfg.devices > 1:  # pad the tile axis for equal per-device tiles
            n_pad = (n_tiles + cfg.devices - 1) // cfg.devices * cfg.devices
            if n_pad != n_tiles:
                o_np = np.concatenate(
                    [o_np, np.zeros((n_pad - n_tiles, tile, 3), np.float32)]
                )
                d_np = np.concatenate(
                    [d_np, np.tile(np.float32([0, 0, 1]), (n_pad - n_tiles, tile, 1))]
                )
                n_tiles = n_pad
        o_tiles = jnp.asarray(o_np)
        d_tiles = jnp.asarray(d_np)
    w_dev = jnp.asarray(plan.weights)
    if cfg.devices > 1:
        from hslu_i.ba_raytracing.f2501_raytracer_tpu.parallel.mesh import (
            make_mesh, shard_scene, trace_tiles_sharded,
            trace_tiles_sharded_u32, trace_tiles_sharded_u32_gen,
        )

        mesh = make_mesh(cfg.devices)
        # replicate the scene once; every frame/group program reuses the
        # committed buffers
        dscene = shard_scene(dscene, mesh)
    # device-side u32 pixel encode (the reference's framebuffer format):
    # AA reduce + u8 pack fuse into the frame program and the host fetches
    # 4 bytes/pixel instead of 12·aa f32 — the f32 fetch measured ~650 ms
    # of the 1080p frame through the relay (scripts/tpu_wall_breakdown.py).
    # The mesh path fuses the same encode per chip (trace_tiles_sharded_u32).
    use_u32 = cfg.device_encode
    # overlapped fetch: split the frame into BENCH_OVERLAP programs, dispatch
    # them ALL, then fetch in order — group g's 1 MB host fetch rides while
    # g+1 computes. Same-session measurement (scripts/tpu_overlap_bench.py):
    # 1795.7 -> 1677.7 ms at G=8 (the full-frame fetch otherwise starts only
    # after the whole lax.map program finishes). Mutually exclusive with the
    # tiles_per_program watchdog path (that one must sync between groups).
    overlap = int(os.environ.get("BENCH_OVERLAP", 8))
    taper = os.environ.get("BENCH_TAPER", "1") == "1"

    # pool-saturation drop audit: every u32 path surfaces the per-tile drop
    # counter (free — it rides the loop state); nonzero means reflection/
    # refraction energy was lost vs the reference recursion, so warn loudly
    # (and tests/test_drop_audit.py gates it at bench-shaped tiles)
    drops = {"n": 0}

    def note_drops(dr):
        drops["n"] += int(np.asarray(dr).sum())

    def frame():
        # whole frame as ONE program: per-launch overhead is high on
        # remote-attached TPUs. BENCH_TPP caps tiles per program for
        # configs that would outlive the relay watchdog in one executable.
        group = cfg.tiles_per_program
        if cfg.devices > 1:
            # the mesh path runs the SAME wall machinery as one chip:
            # overlapped/tapered fetch groups (units of the mesh size so
            # every device gets equal local tiles per program), device-side
            # ray gen, async D2H streaming (VERDICT r3 #1)
            n_units = n_tiles // cfg.devices
            if use_u32 and overlap > 1 and (
                (taper and n_units >= 2)
                or (n_units % overlap == 0 and n_units >= overlap)
            ):
                if taper:
                    sizes = fetch_schedule(
                        n_tiles, max_groups=max(overlap, 2),
                        align=cfg.devices,
                    )
                else:
                    sizes = [(n_units // overlap) * cfg.devices] * overlap
                parts, gs = [], 0
                for sz in sizes:  # all dispatched before any fetch
                    if raygen:
                        parts.append(
                            trace_tiles_sharded_u32_gen(
                                dscene, cfg,
                                order_dev[gs * pixt : (gs + sz) * pixt],
                                offs_dev, w_dev, mesh, n_tiles=sz,
                            )
                        )
                    else:
                        parts.append(
                            trace_tiles_sharded_u32(
                                dscene, cfg, o_tiles[gs : gs + sz],
                                d_tiles[gs : gs + sz], w_dev, mesh,
                            )
                        )
                    gs += sz
                for p, dr in parts:
                    p.copy_to_host_async()
                    dr.copy_to_host_async()
                fbp = np.concatenate([np.asarray(p) for p, _ in parts])
                for _, dr in parts:
                    note_drops(dr)
                return fbp
            if use_u32:
                if raygen:
                    outs, dr = trace_tiles_sharded_u32_gen(
                        dscene, cfg, order_dev, offs_dev, w_dev, mesh,
                        n_tiles=n_tiles,
                    )
                else:
                    outs, dr = trace_tiles_sharded_u32(
                        dscene, cfg, o_tiles, d_tiles, w_dev, mesh
                    )
                note_drops(dr)
            else:
                outs = trace_tiles_sharded(dscene, cfg, o_tiles, d_tiles, mesh)
        elif group and group < n_tiles:
            n_g = (n_tiles + group - 1) // group * group
            pad_g = n_g - n_tiles
            if raygen:
                # pad slots are -1 (harmless +z rays) like the host build
                og_pad = jnp.concatenate(
                    [order_dev, jnp.full((pad_g * pixt,), -1, jnp.int32)]
                ) if pad_g else order_dev
            else:
                o_g = jnp.concatenate([o_tiles, o_tiles[:pad_g]]) if pad_g else o_tiles
                d_g = jnp.concatenate([d_tiles, d_tiles[:pad_g]]) if pad_g else d_tiles
            parts = []
            for gs in range(0, n_g, group):
                t_g = time.monotonic()
                if use_u32:
                    if raygen:
                        out, dr = trace_rays_tiled_u32_gen(
                            dscene, cfg,
                            og_pad[gs * pixt : (gs + group) * pixt],
                            offs_dev, w_dev, n_tiles=group,
                        )
                    else:
                        out, dr = trace_rays_tiled_u32(
                            dscene, cfg, o_g[gs : gs + group],
                            d_g[gs : gs + group], w_dev,
                        )
                    note_drops(dr)
                    # sync per group: an unbroken multi-minute device queue
                    # can trip the relay worker watchdog just like one long
                    # program; only a value fetch proves the group finished
                    np.asarray(out[0, 0])
                else:
                    og, dg = o_g[gs : gs + group], d_g[gs : gs + group]
                    out = trace_rays_tiled(dscene, cfg, og, dg)
                    jax.block_until_ready(out[1])
                    np.asarray(out[0])[0, 0]
                parts.append(out)
                sys.stderr.write(
                    f"  group {gs // group + 1}/{n_g // group}: "
                    f"{time.monotonic() - t_g:.1f}s\n"
                )
            if use_u32:
                outs = jnp.concatenate(parts)[:n_tiles]
            else:
                outs = (
                    jnp.concatenate([p[0] for p in parts])[:n_tiles],
                    jnp.concatenate([p[1] for p in parts])[:n_tiles],
                )
        # n_tiles == overlap is the 1080p default (8 tiles of 262k): one
        # tile per group still overlaps each group's fetch with the next
        # group's compute, which is the whole point
        elif use_u32 and overlap > 1 and (
            (taper and n_tiles >= 2)
            or (n_tiles % overlap == 0 and n_tiles >= overlap)
        ):
            if taper:  # front-loaded sizes: the exposed tail is the LAST
                # group's fetch (725 vs 740 ms uniform, same session)
                sizes = fetch_schedule(n_tiles, max_groups=max(overlap, 2))
            else:
                sizes = [n_tiles // overlap] * overlap
            parts, gs = [], 0
            for sz in sizes:  # all dispatched before any fetch
                if raygen:
                    parts.append(
                        trace_rays_tiled_u32_gen(
                            dscene, cfg,
                            order_dev[gs * pixt : (gs + sz) * pixt],
                            offs_dev, w_dev, n_tiles=sz,
                        )
                    )
                else:
                    parts.append(
                        trace_rays_tiled_u32(
                            dscene, cfg, o_tiles[gs : gs + sz],
                            d_tiles[gs : gs + sz], w_dev,
                        )
                    )
                gs += sz
            # queue every D2H up front: results stream to the host as each
            # group finishes instead of paying one blocking relay round trip
            # per group (interleaved A/B: median -35 ms, all rounds negative,
            # scripts/tpu_taper_ab.py AB_MODE=async)
            for p, dr in parts:
                p.copy_to_host_async()
                dr.copy_to_host_async()
            fbp = np.concatenate([np.asarray(p) for p, _ in parts])
            for _, dr in parts:
                note_drops(dr)
            return fbp
        elif use_u32:
            if raygen:
                outs, dr = trace_rays_tiled_u32_gen(
                    dscene, cfg, order_dev, offs_dev, w_dev, n_tiles=n_tiles
                )
            else:
                outs, dr = trace_rays_tiled_u32(
                    dscene, cfg, o_tiles, d_tiles, w_dev
                )
            note_drops(dr)
        else:
            outs = trace_rays_tiled(dscene, cfg, o_tiles, d_tiles)
        # fetch the full frame to the host — the frame isn't "rendered"
        # until the host holds it (the reference's shared framebuffer); on
        # the relay this fetch also forces real completion (block_until_ready
        # alone can return early after fresh compiles)
        return np.asarray(outs[0] if isinstance(outs, tuple) else outs)

    # warmup/compile
    t0 = time.monotonic()
    fb = frame()
    compile_s = time.monotonic() - t0

    def metric_line(ms):
        return json.dumps(
            {
                "metric": f"{width}x{height} semesterbild {config_name} frame latency",
                "value": round(ms, 2),
                "unit": "ms",
                "vs_baseline": round(BASELINE_MS / ms, 4),
            }
        )

    times_ms = []
    for _ in range(repeats):
        t0 = time.monotonic()
        fb = frame()
        times_ms.append((time.monotonic() - t0) * 1e3)
        # best-so-far after EVERY repeat: a driver/parent timeout that kills
        # this session mid-run still finds a valid final metric line in the
        # partial stdout (BENCH_r04 recorded rc=124 with no line at all)
        print(metric_line(min(times_ms)), flush=True)

    ms = min(times_ms)
    if drops["n"]:
        sys.stderr.write(
            f"WARNING: ray pool/stack saturated — {drops['n']} pending "
            "secondary rays dropped across warmup+repeats (reflection/"
            "refraction energy lost; the reference recursion never drops)\n"
        )
    sys.stderr.write(
        "bench repeats (ms): " + ", ".join(f"{t:.1f}" for t in times_ms) + "\n"
    )
    rays_per_s = n_rays / (ms / 1e3)
    sys.stderr.write(
        json.dumps({"compile_s": round(compile_s, 1), "repeats_ms":
                    [round(t, 1) for t in times_ms]}) + "\n"
    )
    sys.stderr.write(
        f"bench: {width}x{height} semesterbild {config_name} | compile {compile_s:.1f}s | "
        f"{ms:.1f} ms/frame | {rays_per_s/1e6:.2f} Mprimary-rays/s (aa={aa}) | "
        f"triangles={dscene.n_triangles} lights={int(dscene.light_pos.shape[0])}\n"
    )
    print(metric_line(ms), flush=True)


if __name__ == "__main__":
    main()
