"""Numeric drift of the TPU fused path vs the CPU XLA path on identical rays."""
import os, sys, time
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
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.camera import pixel_scene_coords
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.trace import trace_rays
from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.builder import Scene

cfg = RenderConfig(width=240, height=135, reflections=True, refractions=True,
                   scene_backface_culling=True, weight_cutoff=1e-3, max_nodes=48)
scene = build("semesterbild", cfg)
scene = Scene.backface_culling(scene, np.array([0.0, 0.0, 1.0]))
px, py = np.meshgrid(np.arange(240), np.arange(135))
coords = pixel_scene_coords(cfg, px.reshape(-1), py.reshape(-1))
dirs = (coords - np.asarray(cfg.camera.render_ray_focus, np.float32)).astype(np.float32)
R = 32768
o = np.zeros((R,3), np.float32); o[:32400] = coords
d = np.tile(np.float32([0,0,1]), (R,1)); d[:32400] = dirs

cpu = jax.devices("cpu")[0]
tpu = jax.devices()[0]
cfg_cpu = dataclasses.replace(cfg, use_pallas=False)
cfg_tpu = dataclasses.replace(cfg, use_pallas=True)

with jax.default_device(cpu):
    ds_c = build_device_scene(scene, cfg_cpu)
    c_cpu, v_cpu = trace_rays(ds_c, cfg_cpu, jnp.asarray(o), jnp.asarray(d))
    c_cpu, v_cpu = np.asarray(c_cpu), np.asarray(v_cpu)
print("cpu done", flush=True)

with jax.default_device(tpu):
    ds_t = build_device_scene(scene, cfg_tpu)
    c_tpu, v_tpu = trace_rays(ds_t, cfg_tpu, jnp.asarray(o), jnp.asarray(d))
    c_tpu, v_tpu = np.asarray(c_tpu), np.asarray(v_tpu)
print("tpu done", flush=True)

print("valid mismatch:", (v_cpu != v_tpu).sum(), "/", R)
both = v_cpu & v_tpu
diff = np.abs(c_cpu - c_tpu)[both]
print(f"color diff: max {diff.max():.2e} mean {diff.mean():.2e} "
      f"p99 {np.percentile(diff, 99):.2e}")
u8 = np.abs(np.clip(c_cpu,0,1)*255 - np.clip(c_tpu,0,1)*255)[both]
print(f"u8 diff: max {u8.max():.2f} frac>0.5: {(u8.max(axis=-1)>0.5).mean():.4%}")
