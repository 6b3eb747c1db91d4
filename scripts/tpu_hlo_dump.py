"""Dump the compiled HLO of trace_rays at bench-tile shapes and print the
bodies of the named fusions (map profiler fusion.N entries to actual ops)."""
import os, sys, re
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache")))
import jax.numpy as jnp
import numpy as np
from hslu_i.ba_raytracing.f2501_raytracer_tpu import RenderConfig, build_device_scene
from hslu_i.ba_raytracing.f2501_raytracer_tpu.models import build
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.trace import trace_rays
from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.builder import Scene

cfg = RenderConfig(width=1920, height=1080, reflections=True, refractions=True,
                   scene_backface_culling=True, weight_cutoff=1e-3, use_pallas=True,
                   max_nodes=48, compaction_ratio=64, loop_chunk=128, tile_rays=131072)
scene = build("semesterbild", cfg)
scene = Scene.backface_culling(scene, np.array([0.0, 0.0, 1.0]))
ds = build_device_scene(scene, cfg)
R = 131072
o = jnp.zeros((R, 3), jnp.float32)
d = jnp.tile(jnp.float32([0, 0, 1]), (R, 1))
lowered = trace_rays.lower(ds, cfg, o, d)
comp = lowered.compile()
txt = comp.as_text()
print("HLO chars:", len(txt), flush=True)
targets = [f"fusion.{n}" for n in sys.argv[1:]] or [
    "fusion.5", "fusion.6", "fusion.7", "fusion.8", "fusion.10",
    "fusion.11", "fusion.12", "fusion.100",
]
lines = txt.splitlines()
for t in targets:
    pat = re.compile(rf"%{re.escape(t)} \(|{re.escape(t)} = ")
    for i, ln in enumerate(lines):
        if f"%{t} (" in ln and "calls=" not in ln:
            # computation definition header
            print("=" * 80)
            print(ln.strip()[:200])
            # print a summary of ops inside until closing brace
            depth = 0
            ops = {}
            for l2 in lines[i:i + 400]:
                if "{" in l2:
                    depth += l2.count("{")
                if "}" in l2:
                    depth -= l2.count("}")
                    if depth <= 0:
                        break
                m = re.search(r"= (\S+?)[\(\[]", l2.strip())
                if m:
                    op = m.group(1).split("(")[0]
                    ops[op] = ops.get(op, 0) + 1
            big = sorted(ops.items(), key=lambda kv: -kv[1])[:12]
            print("   ops:", big)
            break
# also: find the call sites with shapes
for t in targets:
    for ln in lines:
        if f" = " in ln and f"fusion({t.split('.')[0]}" in ln:
            pass
for t in targets:
    for ln in lines:
        s = ln.strip()
        if s.startswith(f"%{t} =") or f" {t} = " in f" {s} ":
            print("-" * 80)
            print(s[:300])
            break
