"""Multi-device tests on the 8-way virtual CPU mesh: sharded rendering must
agree bitwise-ish with single-device rendering, and the object-sharded cast
must reproduce the dense nearest-hit."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hslu_i.ba_raytracing.f2501_raytracer_tpu import RenderConfig, build_device_scene
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.intersect import cast_rays
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.trace import trace_rays
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.vecmath import normalized
from hslu_i.ba_raytracing.f2501_raytracer_tpu.parallel import (
    cast_nearest_objsharded,
    make_mesh,
    render_image_sharded,
)
from scenes import mixed_scene


@pytest.fixture(scope="module")
def setup():
    cfg = RenderConfig(
        width=32, height=16, reflections=True, refractions=True, max_nodes=64
    )
    scene = mixed_scene(cfg)
    ds = build_device_scene(scene, cfg, min_tri_blocks=8)
    cam = cfg.camera
    px, py = np.meshgrid(np.arange(32), np.arange(16))
    coords = np.stack(
        [
            px.reshape(-1) * cam.w2s_width,
            py.reshape(-1) * cam.w2s_height,
            np.zeros(512),
        ],
        axis=-1,
    ).astype(np.float32)
    dirs = coords - np.asarray(cam.render_ray_focus, np.float32)
    return cfg, ds, jnp.asarray(coords), jnp.asarray(dirs)


def test_devices_available():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"


def test_render_image_sharded_matches_single(setup):
    cfg, ds, o, d = setup
    mesh = make_mesh(8)
    color_m, valid_m = render_image_sharded(ds, cfg, o, d, mesh)
    color_1, valid_1 = trace_rays(ds, cfg, o, d)
    np.testing.assert_array_equal(np.asarray(valid_m), np.asarray(valid_1))
    np.testing.assert_allclose(
        np.asarray(color_m), np.asarray(color_1), rtol=1e-5, atol=1e-6
    )


def test_objsharded_cast_matches_dense(setup):
    cfg, ds, o, d = setup
    dn = normalized(d)
    mesh = make_mesh(8, axis="objs")
    if ds.triangle_blocks % 8 != 0:
        pytest.skip("triangle blocks not divisible by mesh size")
    t_s, idx_s, valid_s = cast_nearest_objsharded(ds, o, dn, mesh)
    hit = cast_rays(ds, o, dn, False)
    np.testing.assert_array_equal(np.asarray(valid_s), np.asarray(hit.valid))
    both = np.asarray(valid_s)
    np.testing.assert_allclose(
        np.asarray(t_s)[both], np.asarray(hit.t)[both], rtol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(idx_s)[both], np.asarray(hit.obj_idx)[both]
    )


def test_pool_path_sharded_matches_single():
    """The compacted-pool wavefront must run under shard_map: per-tile
    R = 512 >= 256 * ratio(2) engages the pool path on every device
    (ops/trace.py), and the 8-device tile-sharded render must agree with the
    single-device fused render."""
    import dataclasses

    from hslu_i.ba_raytracing.f2501_raytracer_tpu.parallel import (  # noqa: F401
        make_mesh,
    )
    from hslu_i.ba_raytracing.f2501_raytracer_tpu.parallel.mesh import (
        trace_tiles_sharded,
    )
    from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.trace import trace_rays_tiled

    cfg = RenderConfig(
        width=64, height=64, reflections=True, refractions=True,
        compaction_ratio=2, max_nodes=48, tile_rays=512,
    )
    scene = mixed_scene(cfg)
    ds = build_device_scene(scene, cfg)
    cam = cfg.camera
    px, py = np.meshgrid(np.arange(64), np.arange(64))
    coords = np.stack(
        [
            px.reshape(-1) * cam.w2s_width,
            py.reshape(-1) * cam.w2s_height,
            np.zeros(64 * 64),
        ],
        axis=-1,
    ).astype(np.float32)
    dirs = (coords - np.asarray(cam.render_ray_focus, np.float32)).astype(np.float32)
    o_tiles = jnp.asarray(coords.reshape(8, 512, 3))
    d_tiles = jnp.asarray(dirs.reshape(8, 512, 3))

    mesh = make_mesh(8)
    c_m, v_m = trace_tiles_sharded(ds, cfg, o_tiles, d_tiles, mesh)
    c_1, v_1 = trace_rays_tiled(ds, cfg, o_tiles, d_tiles)
    np.testing.assert_array_equal(np.asarray(v_m), np.asarray(v_1))
    np.testing.assert_allclose(
        np.asarray(c_m), np.asarray(c_1), rtol=1e-5, atol=1e-6
    )
    # sanity: this shape takes the pool path (not the full-width stack)
    assert cfg.compaction_ratio > 1 and 512 >= 256 * cfg.compaction_ratio


def test_pallas_interpret_sharded_matches_single():
    """Pallas kernels INSIDE shard_map: on real multi-chip hardware
    cfg.devices>1 runs the Pallas path on every chip — a combination the
    plain mesh tests never exercise (CPU resolves use_pallas=None to False).
    Interpret mode executes the same kernel bodies on the CPU mesh, closing
    the coverage hole without TPU hardware (VERDICT r2 item 5)."""
    from hslu_i.ba_raytracing.f2501_raytracer_tpu.parallel.mesh import (
        trace_tiles_sharded,
    )
    from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.trace import trace_rays_tiled

    cfg = RenderConfig(
        width=64, height=64, reflections=True, refractions=True,
        compaction_ratio=2, max_nodes=24, tile_rays=512,
        use_pallas=True, interpret=True,
    )
    scene = mixed_scene(cfg)
    ds = build_device_scene(scene, cfg)
    cam = cfg.camera
    px, py = np.meshgrid(np.arange(64), np.arange(64))
    coords = np.stack(
        [
            px.reshape(-1) * cam.w2s_width,
            py.reshape(-1) * cam.w2s_height,
            np.zeros(64 * 64),
        ],
        axis=-1,
    ).astype(np.float32)
    dirs = (coords - np.asarray(cam.render_ray_focus, np.float32)).astype(np.float32)
    o_tiles = jnp.asarray(coords.reshape(8, 512, 3))
    d_tiles = jnp.asarray(dirs.reshape(8, 512, 3))

    mesh = make_mesh(8)
    c_m, v_m = trace_tiles_sharded(ds, cfg, o_tiles, d_tiles, mesh)
    c_1, v_1 = trace_rays_tiled(ds, cfg, o_tiles, d_tiles)
    np.testing.assert_array_equal(np.asarray(v_m), np.asarray(v_1))
    np.testing.assert_allclose(
        np.asarray(c_m), np.asarray(c_1), rtol=1e-5, atol=1e-6
    )


def test_renderer_mesh_mode_matches_single():
    """RaytracerRenderer with cfg.devices=8 (tile axis sharded over the mesh)
    must produce the same frame as the single-device fused render."""
    import dataclasses

    from hslu_i.ba_raytracing.f2501_raytracer_tpu.renderer import RaytracerRenderer

    base = RenderConfig(
        width=48, height=32, reflections=True, refractions=True,
        compaction_ratio=2, max_nodes=48, tile_rays=512, use_pallas=False,
    )
    scene = mixed_scene(base)
    buf1 = RaytracerRenderer(base).render(scene)
    buf8 = RaytracerRenderer(dataclasses.replace(base, devices=8)).render(scene)
    np.testing.assert_array_equal(buf8.valid, buf1.valid)
    np.testing.assert_allclose(buf8.color, buf1.color, rtol=1e-5, atol=1e-6)


def test_sharded_u32_encode_matches_single():
    """trace_tiles_sharded_u32 (per-chip fused AA reduce + 0xFFRRGGBB
    encode) must produce byte-identical packed pixels to the single-device
    trace_rays_tiled_u32, and the renderer's mesh mode with
    cfg.device_encode must equal the single-chip u32 render."""
    import dataclasses

    from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.trace import (
        trace_rays_tiled_u32,
    )
    from hslu_i.ba_raytracing.f2501_raytracer_tpu.parallel.mesh import (
        trace_tiles_sharded_u32,
    )
    from hslu_i.ba_raytracing.f2501_raytracer_tpu.renderer import RaytracerRenderer

    cfg = RenderConfig(
        width=64, height=64, reflections=True, refractions=True,
        compaction_ratio=2, max_nodes=48, tile_rays=512, device_encode=True,
    )
    scene = mixed_scene(cfg)
    ds = build_device_scene(scene, cfg)
    cam = cfg.camera
    px, py = np.meshgrid(np.arange(64), np.arange(64))
    coords = np.stack(
        [
            px.reshape(-1) * cam.w2s_width,
            py.reshape(-1) * cam.w2s_height,
            np.zeros(64 * 64),
        ],
        axis=-1,
    ).astype(np.float32)
    dirs = (coords - np.asarray(cam.render_ray_focus, np.float32)).astype(np.float32)
    o_tiles = jnp.asarray(coords.reshape(8, 512, 3))
    d_tiles = jnp.asarray(dirs.reshape(8, 512, 3))
    w = jnp.ones((1,), jnp.float32)  # no AA: one unit-weight sample/pixel

    mesh = make_mesh(8)
    u_m, dr_m = trace_tiles_sharded_u32(ds, cfg, o_tiles, d_tiles, w, mesh)
    u_1, dr_1 = trace_rays_tiled_u32(ds, cfg, o_tiles, d_tiles, w)
    np.testing.assert_array_equal(np.asarray(u_m), np.asarray(u_1))
    # the drop audit rides both paths; a healthy trace never saturates
    assert int(np.asarray(dr_m).sum()) == 0
    assert int(np.asarray(dr_1).sum()) == 0

    base = dataclasses.replace(cfg, width=48, height=32, use_pallas=False)
    buf1 = RaytracerRenderer(base).render(mixed_scene(base))
    buf8 = RaytracerRenderer(dataclasses.replace(base, devices=8)).render(
        mixed_scene(base)
    )
    np.testing.assert_array_equal(buf8.get_u32_slice(), buf1.get_u32_slice())
    np.testing.assert_array_equal(buf8.valid, buf1.valid)

def test_mesh_wall_pipeline_bit_identical():
    """The WALL-OPTIMIZED mesh path (VERDICT r3 #1): device-side ray
    generation + fused u32 encode + overlapped/tapered fetch groups must be
    bit-identical to single-chip through both the raw op and the renderer.

    (a) trace_tiles_sharded_u32_gen == trace_rays_tiled_u32_gen per tile;
    (b) RaytracerRenderer(devices=8, device_ray_gen=True, fetch_groups=4,
        fetch_taper) == the single-chip render, byte-for-byte."""
    import dataclasses

    from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.trace import (
        trace_rays_tiled_u32_gen,
    )
    from hslu_i.ba_raytracing.f2501_raytracer_tpu.parallel.mesh import (
        trace_tiles_sharded_u32_gen,
    )
    from hslu_i.ba_raytracing.f2501_raytracer_tpu.renderer import (
        RaytracerRenderer, frame_order_device, plan_frame,
    )

    cfg = RenderConfig(
        width=64, height=64, reflections=True, refractions=True,
        compaction_ratio=2, max_nodes=48, tile_rays=512, device_encode=True,
        device_ray_gen=True,
    )
    scene = mixed_scene(cfg)
    ds = build_device_scene(scene, cfg)
    plan = plan_frame(cfg)
    n_tiles = plan.n_tiles
    assert n_tiles % 8 == 0, n_tiles
    order_dev, offs_dev = frame_order_device(cfg, plan, n_tiles)
    w = jnp.asarray(plan.weights)

    mesh = make_mesh(8)
    u_m, dr_m = trace_tiles_sharded_u32_gen(
        ds, cfg, order_dev, offs_dev, w, mesh, n_tiles=n_tiles
    )
    u_1, dr_1 = trace_rays_tiled_u32_gen(
        ds, cfg, order_dev, offs_dev, w, n_tiles=n_tiles
    )
    np.testing.assert_array_equal(np.asarray(u_m), np.asarray(u_1))
    assert int(np.asarray(dr_m).sum()) == 0
    assert int(np.asarray(dr_1).sum()) == 0

    # renderer end-to-end: mesh overlap+gen vs single-chip (which itself is
    # gated bit-identical to the host ray build in test_renderer_layout)
    base = dataclasses.replace(
        cfg, width=48, height=64, use_pallas=False, tile_rays=512,
        fetch_groups=4, fetch_taper=True,
    )
    buf1 = RaytracerRenderer(base).render(mixed_scene(base))
    buf8 = RaytracerRenderer(dataclasses.replace(base, devices=8)).render(
        mixed_scene(base)
    )
    np.testing.assert_array_equal(buf8.get_u32_slice(), buf1.get_u32_slice())
    np.testing.assert_array_equal(buf8.valid, buf1.valid)
