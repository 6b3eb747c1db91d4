"""Region-scale right-wall adjudication (VERDICT r2 item 3).

Question: is the golden's right-wall brightness delta OUR divergence from
the Rust source, or the golden's? The oracle (tests/oracle.py) is a literal
scalar transcription of the source, so on any shared config:

    oracle == engine  and  golden != both   =>  the delta is the golden's.

The full reference_default config is infeasible for the per-pixel Python
oracle (16 AA x 95 cloud lights x 14.5k tris), so the patch runs a cheap
DETERMINISTIC config (lowres mesh, no AA, hard shadows) on BOTH oracle and
engine at the same native 1140x950 pixel coordinates; the engine's full-
config render (docs/renders/semesterbild_1140x950.png) bounds what AA/soft
shadows change on these flat-wall regions.

Outputs (committed):
  docs/renders/right_wall_adjudication.png — rows: worst-diff region,
      control region; cols: golden | engine(full) | engine(cheap) |
      oracle(cheap), 8x nearest upscale
  docs/renders/renders.json — per-region numeric summary

Run AFTER scripts/make_renders.py (needs renders.json + the full render).
CPU-only, ~10-20 min (1024 px x 2 regions of scalar Python recursion).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tests"),
)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from hslu_i.ba_raytracing.f2501_raytracer_tpu import RenderConfig
from hslu_i.ba_raytracing.f2501_raytracer_tpu.models import build
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.colorops import linear_to_u8
from hslu_i.ba_raytracing.f2501_raytracer_tpu.output import write_png
from hslu_i.ba_raytracing.f2501_raytracer_tpu.output.png_io import read_png
from oracle import DEFAULT_REFRACTION_INDEX, OracleRenderer
from scenes import preprocessed_light_tuples

REF = os.environ.get("RAYTRACER_REF_DATA", "/root/reference")
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "docs", "renders")
meta = json.load(open(os.path.join(OUT, "renders.json")))
W, H = 1140, 950  # native resolution
PS = int(os.environ.get("PATCH", 32))  # patch size (px); scalar-oracle cost
# is ~seconds/pixel, so 24 keeps the two-region run under ~an hour on 1 core

# cheap deterministic config shared by oracle + engine: realistic features,
# lowres mesh, no AA, hard shadows (multiplier 1), runtime backface cull off
# (the golden build has it off too — it is not in the default feature set)
cfg = RenderConfig(
    width=W, height=H, reflections=True, refractions=True,
    light_reflections=True, scene_backface_culling=True, max_nodes=64,
)
scene = build("semesterbild", cfg)
lights = preprocessed_light_tuples(scene, cfg)
orc = OracleRenderer(scene, cfg, lights)
cam = cfg.camera
focus = np.asarray(cam.render_ray_focus)

golden = read_png(os.path.join(REF, "output.png")).astype(np.float64)
full = read_png(os.path.join(OUT, "semesterbild_1140x950.png")).astype(np.float64)

# worst-diff region from make_renders.py; control = min blurred diff with
# nonzero golden brightness (a region where golden and engine agree)
x0, y0 = meta["worst_region_xywh"][:2]
diff = np.abs(golden - full).mean(axis=2)
from numpy.lib.stride_tricks import sliding_window_view

win = sliding_window_view(diff, (PS, PS)).mean(axis=(2, 3))
bright = sliding_window_view(golden.mean(axis=2), (PS, PS)).mean(axis=(2, 3))
score = np.where(bright > 40.0, win, np.inf)
cy, cx = np.unravel_index(np.argmin(score), score.shape)
regions = {"worst": (x0, y0), "control": (int(cx), int(cy))}

# engine (cheap config): trace ONLY the two 32x32 patches — the full-res
# CPU render of this config exceeds practical time; trace_rays on the
# patch rays is the same compiled path the renderer uses per tile
import jax.numpy as jnp

from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.camera import (
    pixel_scene_coords,
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops.trace import trace_rays
from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.device import (
    build_device_scene,
)

dscene = build_device_scene(scene, cfg)


def engine_patch(rx, ry):
    gy, gx = np.mgrid[ry : ry + PS, rx : rx + PS]
    coords = pixel_scene_coords(cfg, gx.ravel(), gy.ravel())  # (P, 3)
    dirs = coords - focus.astype(np.float32)
    color, pvalid = trace_rays(dscene, cfg, jnp.asarray(coords), jnp.asarray(dirs))
    out = np.where(np.asarray(pvalid)[:, None], np.asarray(color), 0.0)
    return linear_to_u8(out).astype(np.float64).reshape(PS, PS, 3)


rows, summary = [], {}
for name, (rx, ry) in regions.items():
    e = engine_patch(rx, ry)
    patch = np.zeros((PS, PS, 3))
    for j in range(PS):
        for i in range(PS):
            px, py = rx + i, ry + j
            coords = np.array([px * cam.w2s_width, py * cam.w2s_height, 0.0])
            res = orc.single_raytrace(
                coords, coords - focus, DEFAULT_REFRACTION_INDEX, None
            )
            if res is not None and res[1]:
                patch[j, i] = res[0]
        print(f"{name}: row {j + 1}/{PS}", flush=True)
    orc_u8 = np.floor(np.clip(patch, 0, 1) * 255.0 + 0.5)
    g = golden[ry : ry + PS, rx : rx + PS]
    f = full[ry : ry + PS, rx : rx + PS]
    summary[name] = dict(
        xy=[rx, ry],
        oracle_vs_engine_cheap_max=float(np.abs(orc_u8 - e).max()),
        oracle_vs_engine_cheap_rmse=round(float(np.sqrt(np.mean((orc_u8 - e) ** 2))), 2),
        golden_vs_engine_full_mean=round(float(np.abs(g - f).mean()), 2),
        golden_vs_oracle_mean=round(float(np.abs(g - orc_u8).mean()), 2),
        engine_full_vs_cheap_mean=round(float(np.abs(f - e).mean()), 2),
    )
    up = 8

    def U(a):
        return np.repeat(np.repeat(a.astype(np.uint8), up, 0), up, 1)

    gap = np.full((PS * up, 2 * up, 3), 255, np.uint8)
    rows.append(np.concatenate([U(g), gap, U(f), gap, U(e), gap, U(orc_u8)], axis=1))

img = np.concatenate(
    [rows[0], np.full((2 * 8, rows[0].shape[1], 3), 255, np.uint8), rows[1]], axis=0
)
write_png(os.path.join(OUT, "right_wall_adjudication.png"), img)
meta["adjudication"] = summary
meta["adjudication_layout"] = (
    "rows: worst|control; cols: golden | engine(full cfg) | engine(cheap cfg) "
    "| oracle(cheap cfg)"
)
json.dump(meta, open(os.path.join(OUT, "renders.json"), "w"), indent=1)
print(json.dumps(summary, indent=1))
