"""Offline analysis: how often CAN the per-ray block gates skip work?

Casts the primary wavefront on CPU, then evaluates the shadow-kernel block
gates in numpy for every (kernel tile, light, block) cell, reporting the
fraction of block-scans a perfect implementation of the current gating
design would skip. Use to validate gate design before kernel work."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from hslu_i.ba_raytracing.f2501_raytracer_tpu import RenderConfig, build_device_scene
from hslu_i.ba_raytracing.f2501_raytracer_tpu.models import build
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.camera import (
    pixel_scene_coords,
    tile_major_order,
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.intersect import cast_rays
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.vecmath import normalized
from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.builder import Scene

W = int(os.environ.get("CW", 240))
H = int(os.environ.get("CH", 135))
TB = int(os.environ.get("CTB", 512))
TS = int(os.environ.get("CTS", 16))

cfg = RenderConfig(
    width=W, height=H, reflections=True, refractions=True,
    scene_backface_culling=True, triangle_block=TB,
)
scene = build("semesterbild", cfg)
scene = Scene.backface_culling(scene, np.array([0.0, 0.0, 1.0]))
ds = build_device_scene(scene, cfg)
print(f"blocks={ds.triangle_blocks} B={ds.tri_block} sb_sizes={ds.sb_sizes}")

px, py = np.meshgrid(np.arange(W), np.arange(H))
order = tile_major_order(W, H, TS)
px, py = px.reshape(-1)[order], py.reshape(-1)[order]
coords = pixel_scene_coords(cfg, px, py)
dirs = (coords - np.asarray(cfg.camera.render_ray_focus, np.float32)).astype(np.float32)

import jax.numpy as jnp

hit = cast_rays(ds, jnp.asarray(coords), jnp.asarray(normalized(jnp.asarray(dirs))))
point = np.asarray(hit.point)
normal = np.asarray(hit.normal)
valid = np.asarray(hit.valid)
print(f"primary hits: {valid.mean():.3f}")

lights = np.asarray(ds.light_pack)[: ds.n_lights]
aabb = np.asarray(ds.tri_aabb)
nb = aabb.shape[0]
eps = cfg.camera.epsilon_distance

R = point.shape[0]
RT = 256
n_tiles = (R + RT - 1) // RT
pad = n_tiles * RT - R
if pad:
    point = np.concatenate([point, np.full((pad, 3), 1e9, np.float32)])
    normal = np.concatenate([normal, np.tile(np.float32([0, 0, 1]), (pad, 1))])
    valid = np.concatenate([valid, np.zeros(pad, bool)])

skipped = np.zeros((nb,), np.int64)
total = 0
for li in range(lights.shape[0]):
    lpos = lights[li, 0:3]
    ltp = lpos[None, :] - point
    dist = np.linalg.norm(ltp, axis=1)
    ldir = ltp / np.maximum(dist[:, None], 1e-30)
    so = point + ldir * eps
    cos_in = np.einsum("rc,rc->r", ltp, normal) / np.maximum(dist, 1e-30)
    maxd = np.where(valid & (cos_in > 0), np.linalg.norm(lpos[None, :] - so, axis=1), 0.0)

    inv = 1.0 / np.where(ldir == 0, 1e-30, ldir)
    for b in range(nb):
        t1 = (aabb[b, 0:3][None, :] - so) * inv
        t2 = (aabb[b, 3:6][None, :] - so) * inv
        lo = np.minimum(t1, t2).max(axis=1)
        hi = np.maximum(t1, t2).min(axis=1)
        gate = (hi >= np.maximum(lo, 0.0)) & (lo <= maxd) & (maxd > 0)
        g = gate.reshape(n_tiles, RT)
        sk = (~g.any(axis=1)).sum()
        skipped[b] += sk
        total += n_tiles

print(f"tile-block-light cells skipped: {skipped.sum()}/{total} = {skipped.sum()/total:.3f}")
for b in range(nb):
    sz = np.asarray(ds.tri_aabb)[b]
    print(
        f"  block {b:3d} skip={skipped[b]/(total//nb):.3f} "
        f"aabb=[{sz[0]:.2f},{sz[1]:.2f},{sz[2]:.2f}]..[{sz[3]:.2f},{sz[4]:.2f},{sz[5]:.2f}]"
    )
