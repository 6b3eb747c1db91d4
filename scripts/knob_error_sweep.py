"""Quantify the bench approximation knobs (VERDICT round-1 item 2).

The reference traces its full shading tree with no weight cutoff
(raytracer_renderer.rs:174-264); the TPU wavefront exposes `weight_cutoff`
and `max_nodes` as speed knobs. This sweep renders the realistic config at
a chosen resolution for weight_cutoff x max_nodes, compares each image
against the exact render (cutoff=0, max_nodes=512) in OUTPUT u8 space (the
no-gamma encoder, the space the golden gate uses), and reports max|Δu8| /
RMSE(u8) / frame time, so bench defaults are justified by measurement.

Usage: python scripts/knob_error_sweep.py [WIDTHxHEIGHT]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from hslu_i.ba_raytracing.f2501_raytracer_tpu import RenderConfig, build_device_scene
from hslu_i.ba_raytracing.f2501_raytracer_tpu.models import build
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.camera import (
    pixel_scene_coords,
    tile_major_order,
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.colorops import linear_to_u8
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.trace import trace_rays_tiled
from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.builder import Scene

res = sys.argv[1] if len(sys.argv) > 1 else "480x270"
W0, H0 = (int(v) for v in res.split("x"))

SWEEP = [
    # (weight_cutoff, max_nodes)
    (0.0, 512),  # exact baseline
    (0.0, 96),
    (1e-4, 96),
    (1e-4, 48),
    (1e-3, 96),
    (1e-3, 48),  # bench.py defaults
    (3e-3, 32),
]

n_pix = W0 * H0
px, py = np.meshgrid(np.arange(W0), np.arange(H0))
order = tile_major_order(W0, H0)
px, py = px.reshape(-1)[order], py.reshape(-1)[order]
inv_order = np.argsort(order)

ref_u8 = None
print(f"{res} semesterbild realistic | u8 error vs cutoff=0/max_nodes=512")
for wc, mn in SWEEP:
    cfg = RenderConfig(
        width=W0, height=H0, reflections=True, refractions=True,
        light_reflections=True, scene_backface_culling=True,
        tile_rays=32768, max_nodes=mn, weight_cutoff=wc,
        compaction_ratio=32, loop_chunk=128,
    )
    scene = build("semesterbild", cfg)
    scene = Scene.backface_culling(scene, np.array([0.0, 0.0, 1.0]))
    ds = build_device_scene(scene, cfg)
    coords = pixel_scene_coords(cfg, px, py)
    dirs = (coords - np.asarray(cfg.camera.render_ray_focus, np.float32)).astype(
        np.float32
    )
    tile = cfg.tile_rays
    n_tiles = (n_pix + tile - 1) // tile
    pad = n_tiles * tile - n_pix
    if pad:
        coords = np.concatenate([coords, np.zeros((pad, 3), np.float32)])
        dirs = np.concatenate([dirs, np.tile(np.float32([0, 0, 1]), (pad, 1))])
    o_t = jnp.asarray(coords.reshape(n_tiles, tile, 3))
    d_t = jnp.asarray(dirs.reshape(n_tiles, tile, 3))

    def frame():
        outs = trace_rays_tiled(ds, cfg, o_t, d_t)
        jax.block_until_ready(outs)
        np.asarray(outs[0])[0, 0]
        return outs

    t0 = time.monotonic()
    c, v = frame()
    comp = time.monotonic() - t0
    ts = []
    for _ in range(2):
        t0 = time.monotonic()
        frame()
        ts.append((time.monotonic() - t0) * 1e3)
    c = np.asarray(c).reshape(-1, 3)[:n_pix][inv_order]
    v = np.asarray(v).reshape(-1)[:n_pix][inv_order]
    img = np.where(v[:, None], c, 0.0)
    u8 = linear_to_u8(img.reshape(H0, W0, 3)).astype(np.int32)
    if ref_u8 is None:
        ref_u8 = u8
        err_s = "exact baseline"
    else:
        d8 = np.abs(u8 - ref_u8)
        err_s = (
            f"max|du8| {d8.max():3d}  rmse(u8) {np.sqrt((d8.astype(np.float64)**2).mean()):7.4f}"
            f"  pix>1u8 {(d8.max(axis=2) > 1).mean():7.4%}"
        )
    print(
        f"cutoff={wc:7.0e} max_nodes={mn:3d}: {min(ts):8.1f} ms  {err_s}",
        flush=True,
    )
