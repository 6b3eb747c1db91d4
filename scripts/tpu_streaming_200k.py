"""Streaming-scene validation at scale: 200k synthetic triangles (past the
VMEM-residency ceiling), compiled on the real TPU.

Checks: streaming cast/occlude agree with the XLA scan path (which has no
size ceiling) and reports throughput for both."""
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
import jax.numpy as jnp

from hslu_i.ba_raytracing.f2501_raytracer_tpu import RenderConfig, build_device_scene
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.intersect import (
    cast_rays,
    occlude_rays,
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.builder import (
    Scene,
    TriangleData,
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.materials import Material

N_TRI = 200_000
R = 32768

rng = np.random.default_rng(7)
# random small triangles filling a 10^3 box
c = rng.uniform(0.0, 10.0, (N_TRI, 3)).astype(np.float32)
e1 = rng.normal(0, 0.08, (N_TRI, 3)).astype(np.float32)
e2 = rng.normal(0, 0.08, (N_TRI, 3)).astype(np.float32)
mat = Material((0.5, 0.5, 0.5), 0.0, 0.2)

t_build = time.monotonic()
scene = Scene()
for i in range(N_TRI):
    scene.add_triangle(
        TriangleData.with_material(c[i], c[i] + e1[i], c[i] + e2[i], mat)
    )
cfg = RenderConfig(width=64, height=64)
ds = build_device_scene(scene, cfg)
print(
    f"build {time.monotonic()-t_build:.1f}s | T_pad={ds.n_triangles} "
    f"blocks={ds.triangle_blocks} streaming={ds.streaming}",
    flush=True,
)
assert ds.streaming, "200k triangles must trip the streaming threshold"

o = rng.uniform(0.0, 10.0, (R, 3)).astype(np.float32)
d = rng.normal(size=(R, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
o, d = jnp.asarray(o), jnp.asarray(d)
md = jnp.full((R,), 4.0, jnp.float32)


def _force(out):
    jax.block_until_ready(out)
    # relay quirk: fetch one element to guarantee completion
    leaves = jax.tree_util.tree_leaves(out)
    np.asarray(leaves[0]).ravel()[0]


def timeit(name, fn):
    out = fn()
    _force(out)
    ts = []
    for _ in range(3):
        t0 = time.monotonic()
        out = fn()
        _force(out)
        ts.append((time.monotonic() - t0) * 1e3)
    print(f"{name:28s} {min(ts):9.2f} ms", flush=True)
    return out


import dataclasses

ds_xla = ds  # XLA scan path has no ceiling; use as oracle
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.pallas_kernels import (
    pallas_cast_triangles_stream,
)
for rt in (512, 1024):
    timeit(f"stream cast rt={rt}", lambda rt=rt: pallas_cast_triangles_stream(
        ds.tri_woop, ds.tri_nsq, ds.tri_valid_f, ds.tri_httr_f,
        ds.tri_normal3, ds.tri_aabb, o, d, backface_culling=True, ray_tile=rt))
hs = timeit("streaming cast", lambda: cast_rays(ds, o, d, True, use_pallas=True))
hx = timeit("XLA-scan cast", lambda: cast_rays(ds_xla, o, d, True, use_pallas=False))
vs, vx = np.asarray(hs.valid), np.asarray(hx.valid)
assert (vs == vx).all(), (vs.sum(), vx.sum())
ts_, tx = np.asarray(hs.t)[vs], np.asarray(hx.t)[vx]
print(
    f"cast agree: hits={vs.sum()} max|dt|={np.abs(ts_-tx).max():.2e} "
    f"idx match={(np.asarray(hs.obj_idx)[vs]==np.asarray(hx.obj_idx)[vx]).mean():.4f}",
    flush=True,
)

os_ = timeit("streaming occlude", lambda: occlude_rays(ds, o, d, md, True, use_pallas=True))
ox = timeit("XLA-scan occlude", lambda: occlude_rays(ds_xla, o, d, md, True, use_pallas=False))
print(
    f"occl agree: opq match={(np.asarray(os_[0])==np.asarray(ox[0])).mean():.4f} "
    f"max|dop|={np.abs(np.asarray(os_[1])-np.asarray(ox[1])).max():.2e} "
    f"max|dfilt|={np.abs(np.asarray(os_[2])-np.asarray(ox[2])).max():.2e}",
    flush=True,
)
