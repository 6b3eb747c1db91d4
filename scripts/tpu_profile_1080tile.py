import os, sys, time, glob
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache")))
import jax.numpy as jnp
import numpy as np
import dataclasses
from hslu_i.ba_raytracing.f2501_raytracer_tpu import RenderConfig, build_device_scene
from hslu_i.ba_raytracing.f2501_raytracer_tpu.models import build
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.camera import pixel_scene_coords, tile_major_order
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.trace import trace_rays
from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.builder import Scene

W0, H0 = 1920, 1080
cfg = RenderConfig(width=W0, height=H0, reflections=True, refractions=True,
                   scene_backface_culling=True, weight_cutoff=1e-3, use_pallas=True,
                   max_nodes=48,
                   loop_chunk=int(__import__('os').environ.get('PROF_CHUNK', 128)),
                   tile_rays=131072,
                   triangle_block=int(__import__('os').environ.get('PROF_B', 64)),
                   resort_secondary=__import__('os').environ.get('PROF_RESORT') == '1',
                   commit_splits=int(__import__('os').environ.get('PROF_SPLITS', 1)),
                   packed_stage=__import__('os').environ.get('PROF_PACKED', '1') == '1',
                   compaction_ratio=int(__import__('os').environ.get('PROF_RATIO', 64)))
scene = build("semesterbild", cfg)
scene = Scene.backface_culling(scene, np.array([0.0, 0.0, 1.0]))
ds = build_device_scene(scene, cfg)
px, py = np.meshgrid(np.arange(W0), np.arange(H0))
order = tile_major_order(W0, H0)
px, py = px.reshape(-1)[order], py.reshape(-1)[order]
coords = pixel_scene_coords(cfg, px, py)
dirs = (coords - np.asarray(cfg.camera.render_ray_focus, np.float32)).astype(np.float32)
R = 131072
PROF_TILE = int(os.environ.get('PROF_TILE', 4))
sl = slice(PROF_TILE*R, (PROF_TILE+1)*R)  # default: a middle tile
o, d = jnp.asarray(coords[sl]), jnp.asarray(dirs[sl])
out = trace_rays(ds, cfg, o, d); jax.block_until_ready(out)
t0=time.monotonic(); out = trace_rays(ds, cfg, o, d); jax.block_until_ready(out)
print("tile:", (time.monotonic()-t0)*1e3, "ms", flush=True)
with jax.profiler.trace("/tmp/jaxprof2"):
    out = trace_rays(ds, cfg, o, d); jax.block_until_ready(out)
import gzip, json, collections
f = sorted(glob.glob('/tmp/jaxprof2/plugins/profile/*/*.trace.json.gz'))[-1]
with gzip.open(f) as fh: data = json.load(fh)
tot = collections.Counter(); cnt = collections.Counter()
for e in data.get('traceEvents', []):
    if e.get('ph')=='X' and 'dur' in e:
        tot[e.get('name','')] += e['dur']; cnt[e.get('name','')] += 1
for name, us in tot.most_common(22):
    print(f"{us/1e3:9.2f} ms x{cnt[name]:5d}  {name[:100]}")
