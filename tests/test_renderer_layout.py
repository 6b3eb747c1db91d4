"""Renderer ray-layout + device-encode invariants (round-3 unification):
the tile-major kernel layout, the device-side u32 encode and the exact AA
dedupe must all be output-invariant vs the straightforward row-major f32
path (ref semantics: raytracer_renderer.rs:918-1016, image_buffer.rs)."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from hslu_i.ba_raytracing.f2501_raytracer_tpu import RaytracerRenderer, RenderConfig
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.camera import pixel_scene_coords
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.trace import trace_rays
from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.device import build_device_scene
from scenes import mixed_scene


def _cfg(**kw):
    base = dict(
        width=33,
        height=17,
        reflections=True,
        refractions=True,
        weight_cutoff=0.0,
        compaction_ratio=1,  # stack path: per-ray-deterministic DFS order
        use_pallas=False,
    )
    base.update(kw)
    return RenderConfig(**base)


def test_tile_major_layout_is_bit_identical_to_rowmajor():
    """The tile-major permutation is host-side relabeling only: renderer
    output must be BIT-identical to tracing the same pixels row-major
    (per-ray math is position-independent on the stack path)."""
    cfg = _cfg()
    scene = mixed_scene(cfg)
    ds = build_device_scene(scene, cfg)

    buf = RaytracerRenderer(cfg).render_device(ds)

    px, py = np.meshgrid(np.arange(cfg.width), np.arange(cfg.height))
    coords = pixel_scene_coords(cfg, px.reshape(-1), py.reshape(-1))
    dirs = coords - np.asarray(cfg.camera.render_ray_focus, np.float32)
    c, v = trace_rays(ds, cfg, jnp.asarray(coords), jnp.asarray(dirs))
    c = np.asarray(c).reshape(cfg.height, cfg.width, 3)
    v = np.asarray(v).reshape(cfg.height, cfg.width)

    np.testing.assert_array_equal(buf.valid, v)
    np.testing.assert_array_equal(buf.color[v], c[v])


def test_device_encode_matches_f32_path():
    """device_encode=True (on-device AA reduce + u32 pack) must equal the
    f32 host path in u8 space, and agree on validity."""
    cfg = _cfg(anti_aliasing_rotation_scale=True, anti_aliasing_randomness=True)
    scene = mixed_scene(cfg)
    ds = build_device_scene(scene, cfg)

    a = RaytracerRenderer(cfg).render_device(ds)
    b = RaytracerRenderer(
        dataclasses.replace(cfg, device_encode=True)
    ).render_device(ds)

    np.testing.assert_array_equal(a.valid, b.valid)
    da = a.as_u8().astype(np.int16)
    db = b.as_u8().astype(np.int16)
    # identical math, device-side quantization: allow 1 u8 ulp for f32
    # rounding at the exact .5 quantization boundaries
    assert np.abs(da - db).max() <= 1, np.abs(da - db).max()
    assert (np.abs(da - db) > 0).mean() < 0.01


def test_dedupe_aa_matches_full_expansion():
    """Folding the 8 identical [1,1] AA rows into one weighted ray is
    algebraically exact; images must agree to f32 summation-order noise."""
    cfg = _cfg(anti_aliasing_rotation_scale=True, anti_aliasing_randomness=True)
    scene = mixed_scene(cfg)
    ds = build_device_scene(scene, cfg)

    a = RaytracerRenderer(cfg).render_device(ds)  # dedupe_aa=True default
    b = RaytracerRenderer(
        dataclasses.replace(cfg, dedupe_aa=False)
    ).render_device(ds)

    np.testing.assert_array_equal(a.valid, b.valid)
    np.testing.assert_allclose(a.color, b.color, atol=2e-6, rtol=0)


def test_progressive_path_matches_fused():
    """The per-tile progressive path commits through the same tile-major
    permutation and must reproduce the fused frame exactly."""
    cfg = _cfg(anti_aliasing_rotation_scale=True)
    scene = mixed_scene(cfg)
    ds = build_device_scene(scene, cfg)

    fused = RaytracerRenderer(cfg).render_device(ds)
    seen = []
    prog = RaytracerRenderer(cfg).render_device(
        ds, progress=lambda buf, frac: seen.append(frac)
    )
    assert seen and seen[-1] == 1.0
    np.testing.assert_array_equal(fused.valid, prog.valid)
    np.testing.assert_array_equal(
        fused.color[fused.valid], prog.color[prog.valid]
    )


def test_fetch_groups_overlap_is_bit_identical():
    """cfg.fetch_groups splits the fused u32 frame into N dispatched-ahead
    programs (overlapped fetch, PERF.md round 3); grouping batches the same
    per-tile lax.map differently so the u32 frame must be BIT-identical —
    with the tapered schedule (default) and the uniform split alike."""
    # 64x48 = 3072 pixels, tile_rays=384 -> 8 tiles (divisible by fg=8 and 4)
    cfg = _cfg(width=64, height=48, tile_rays=384, device_encode=True)
    scene = mixed_scene(cfg)
    ds = build_device_scene(scene, cfg)

    one = RaytracerRenderer(
        dataclasses.replace(cfg, fetch_groups=1)
    ).render_device(ds)
    for fg, taper in ((4, False), (8, False), (8, True)):
        g = RaytracerRenderer(
            dataclasses.replace(cfg, fetch_groups=fg, fetch_taper=taper)
        ).render_device(ds)
        np.testing.assert_array_equal(one.valid, g.valid)
        np.testing.assert_array_equal(one.as_u8(), g.as_u8())


def test_fetch_taper_overlaps_odd_tile_counts():
    """The tapered schedule lifts the uniform split's divisibility
    requirement: a 7-tile frame (not divisible by fetch_groups=8, so the
    uniform path fell back to a single program) must still render
    bit-identically through the tapered overlap path."""
    # 56x48 = 2688 pixels, tile_rays=384 -> 7 tiles
    cfg = _cfg(width=56, height=48, tile_rays=384, device_encode=True)
    scene = mixed_scene(cfg)
    ds = build_device_scene(scene, cfg)
    one = RaytracerRenderer(
        dataclasses.replace(cfg, fetch_groups=1)
    ).render_device(ds)
    g = RaytracerRenderer(
        dataclasses.replace(cfg, fetch_groups=8, fetch_taper=True)
    ).render_device(ds)
    np.testing.assert_array_equal(one.valid, g.valid)
    np.testing.assert_array_equal(one.as_u8(), g.as_u8())


def test_device_ray_gen_is_bit_identical():
    """cfg.device_ray_gen rebuilds the primary rays IN-PROGRAM from the
    compact pixel permutation (trace_rays_tiled_u32_gen) — the same f32 ops
    in the same order as build_frame_rays, so the u32 frame must be
    BIT-identical to the host-built-rays path. Covers AA (offset table) and
    a ragged last tile (padding slots = -1 -> harmless +z rays)."""
    for kw in (
        dict(width=64, height=48, tile_rays=384),
        dict(width=56, height=44, tile_rays=384),  # ragged: 7.18 tiles
        dict(
            width=40, height=32, tile_rays=512,
            anti_aliasing_rotation_scale=True, anti_aliasing_randomness=True,
        ),
    ):
        cfg = _cfg(device_encode=True, fetch_groups=8, **kw)
        scene = mixed_scene(cfg)
        ds = build_device_scene(scene, cfg)
        host = RaytracerRenderer(
            dataclasses.replace(cfg, device_ray_gen=False)
        ).render_device(ds)
        gen = RaytracerRenderer(
            dataclasses.replace(cfg, device_ray_gen=True)
        ).render_device(ds)
        np.testing.assert_array_equal(host.valid, gen.valid)
        np.testing.assert_array_equal(host.as_u8(), gen.as_u8())


def test_fetch_schedule_shapes():
    from hslu_i.ba_raytracing.f2501_raytracer_tpu.renderer import fetch_schedule

    assert fetch_schedule(16) == [2] * 8  # ONE compiled group shape
    assert fetch_schedule(8) == [1] * 8
    assert fetch_schedule(2) == [1, 1]
    assert fetch_schedule(1) == [1]
    assert fetch_schedule(17) == [3] + [2] * 7
    assert fetch_schedule(7) == [1] * 7  # non-divisible counts still split
    for n in range(1, 70):
        s = fetch_schedule(n)
        assert sum(s) == n
        assert s == sorted(s, reverse=True)  # front-loaded
        assert len(s) <= 8
        assert all(x >= 1 for x in s)
        # each distinct size is a separate XLA executable to cold-compile
        assert len(set(s)) <= 2
