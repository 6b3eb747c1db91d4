"""Virtual-mesh scaling evidence for the road-to-100ms budget (PERF.md).

Runs the production multi-chip wall pipeline (trace_tiles_sharded_u32_gen —
device-side ray gen + fused u32 encode, the SAME per-tile body as the
single-chip bench) over devices ∈ {1,2,4,8} on the
xla_force_host_platform_device_count virtual CPU mesh and reports, per N:

  * per-device tile count (the sharded work split — must be n_tiles/N),
  * bit-identity of the assembled frame vs the single-device run,
  * wall per frame step (on this 1-CPU-core box all N virtual devices
    timeshare one core, so wall is expected ~FLAT — the meaningful scaling
    fact is that total work is conserved while per-device work is 1/N),
  * the collective count in the compiled HLO (expected 0: the tile axis is
    embarrassingly parallel; the only cross-device step is the host fetch).

Linearity on real chips follows from (work/N per chip) + (no collectives)
+ (per-chip host fetch streams async); this script pins the first two
facts and the bit-identity, which ARE checkable without 8 real chips.

Usage: python scripts/mesh_scaling.py  (forces CPU + 8 virtual devices)
"""
import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from hslu_i.ba_raytracing.f2501_raytracer_tpu import RenderConfig, build_device_scene
from hslu_i.ba_raytracing.f2501_raytracer_tpu.models import build
from hslu_i.ba_raytracing.f2501_raytracer_tpu.parallel.mesh import (
    make_mesh, shard_scene, trace_tiles_sharded_u32_gen,
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.renderer import (
    frame_order_device, plan_frame,
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.builder import Scene

W, H = int(os.environ.get("MS_W", 480)), int(os.environ.get("MS_H", 270))
cfg = RenderConfig(
    width=W, height=H, scene_backface_culling=True,
    reflections=True, light_reflections=True, refractions=True,
    tile_rays=int(os.environ.get("MS_TILE", 16384)),
    max_nodes=48, weight_cutoff=1e-3, compaction_ratio=64,
    loop_chunk=32, use_pallas=False, kernel_ray_tile=256,
    device_encode=True, dedupe_aa=True,
)
scene = build("semesterbild", cfg)
scene = Scene.backface_culling(scene, np.array([0.0, 0.0, 1.0]))
ds0 = build_device_scene(scene, cfg)
plan = plan_frame(cfg)
pixt = plan.pix_per_tile
w_dev = jnp.asarray(plan.weights)

rows = []
ref_frame = None
for n_dev in (1, 2, 4, 8):
    n_tiles = (plan.n_tiles + n_dev - 1) // n_dev * n_dev
    order_dev, offs_dev = frame_order_device(cfg, plan, n_tiles)
    mesh = make_mesh(n_dev)
    ds = shard_scene(ds0, mesh)

    def step():
        out, dr = trace_tiles_sharded_u32_gen(
            ds, cfg, order_dev, offs_dev, w_dev, mesh, n_tiles=n_tiles
        )
        return np.asarray(out), np.asarray(dr)

    fb, dr = step()  # compile + warm
    t = []
    for _ in range(int(os.environ.get("MS_REPS", 3))):
        t0 = time.monotonic()
        fb, dr = step()
        t.append((time.monotonic() - t0) * 1e3)
    # collective count in the compiled module (expect 0)
    from hslu_i.ba_raytracing.f2501_raytracer_tpu.parallel.mesh import (
        _sharded_u32_gen, shard_scene as _ss,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    pix_t = order_dev.shape[0] // n_tiles
    hlo = _sharded_u32_gen.lower(
        _ss(ds0, mesh),
        jax.device_put(jnp.asarray(offs_dev), NamedSharding(mesh, P())),
        jax.device_put(w_dev, NamedSharding(mesh, P())),
        jax.device_put(
            order_dev.reshape(n_tiles, pix_t),
            NamedSharding(mesh, P(mesh.axis_names[0])),
        ),
        cfg=cfg, n_tiles=n_tiles, pix_t=pix_t, mesh=mesh,
    ).compile().as_text()
    n_coll = sum(hlo.count(op) for op in
                 ("all-reduce", "all-gather", "collective-permute",
                  "reduce-scatter", "all-to-all"))
    flat = fb.reshape(-1)[: plan.n_tiles * pixt]
    if ref_frame is None:
        ref_frame = flat
        identical = True
    else:
        identical = bool(np.array_equal(ref_frame[: flat.shape[0]], flat))
    rows.append(dict(
        devices=n_dev, n_tiles=int(n_tiles),
        tiles_per_device=int(n_tiles // n_dev),
        wall_ms_best=round(min(t), 1), wall_ms=sorted(round(x, 1) for x in t),
        bit_identical_vs_1dev=identical, hlo_collectives=int(n_coll),
        dropped=int(dr.sum()),
    ))
    print(json.dumps(rows[-1]), flush=True)

out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "mesh_scaling.json")
with open(out + ".tmp", "w") as fh:
    json.dump(dict(width=W, height=H, note=__doc__.split("\n")[0],
                   host_cores=os.cpu_count(), rows=rows), fh, indent=1)
os.replace(out + ".tmp", out)
print("wrote", out)
