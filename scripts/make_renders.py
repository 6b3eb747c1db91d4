"""Generate every committed visual-parity artifact under docs/renders/
(VERDICT r2 item 3: the evidence chain must exist in git).

Artifacts (all paths cited from README.md / PARITY.md / ROADMAP.md):
  docs/renders/semesterbild_1140x950.png          — our reference_default render
  docs/renders/golden_side_by_side_1140x950.png   — golden | ours, native res
  docs/renders/golden_absdiff_1140x950.png        — per-pixel |diff| heat (u8)
  docs/renders/semesterbild_aa_packet8.png        — simd_render packet semantics
  docs/renders/test_scene.png, test_text.png      — the other two example scenes
  docs/renders/right_wall_crops.png               — golden | engine 32x32 crops of
                                                    the worst-diff wall region
                                                    (oracle crop added by
                                                    scripts/oracle_patch.py)
  docs/renders/renders.json                       — RMSE/crop metadata

Intended to run on the TPU (native-res reference_default is hours on CPU):
  python scripts/make_renders.py            # all artifacts
  python scripts/make_renders.py small      # only the cheap ones (CPU ok)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from hslu_i.ba_raytracing.f2501_raytracer_tpu import RaytracerRenderer, RenderConfig
from hslu_i.ba_raytracing.f2501_raytracer_tpu.models import build
from hslu_i.ba_raytracing.f2501_raytracer_tpu.output import write_png
from hslu_i.ba_raytracing.f2501_raytracer_tpu.output.png_io import read_png

REF = os.environ.get("RAYTRACER_REF_DATA", "/root/reference")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "renders")
os.makedirs(OUT, exist_ok=True)
SMALL_ONLY = len(sys.argv) > 1 and sys.argv[1] == "small"
meta = {}
if os.path.exists(os.path.join(OUT, "renders.json")):
    meta = json.load(open(os.path.join(OUT, "renders.json")))


def render(name, cfg, scene_name):
    scene = build(scene_name, cfg)
    t0 = time.monotonic()
    buf = RaytracerRenderer(cfg).render(scene)
    dt = time.monotonic() - t0
    img = buf.as_u8()
    write_png(os.path.join(OUT, f"{name}.png"), img)
    print(f"{name}: {cfg.width}x{cfg.height} in {dt:.1f}s", flush=True)
    return img


# --- cheap artifacts (CPU-feasible) ---
render(
    "test_scene",
    RenderConfig(width=456, height=380, reflections=True, refractions=True,
                 light_reflections=True, max_nodes=64),
    "test_scene",
)
render(
    "test_text",
    RenderConfig(width=456, height=380, reflections=True, refractions=True,
                 light_reflections=True, max_nodes=64),
    "test_text",
)
# simd_render packet-semantics variant (228x190, ROADMAP.md)
render(
    "semesterbild_aa_packet8",
    RenderConfig.reference_default(
        width=228, height=190, max_nodes=64, tiles_per_program=4,
        aa_packet_lanes=8, packet_mode=True,
    ),
    "semesterbild",
)

if not SMALL_ONLY:
    # --- native-res reference_default vs the golden ---
    cfg = RenderConfig.reference_default(
        width=1140, height=950, max_nodes=64, tiles_per_program=4,
    )
    mine = render("semesterbild_1140x950", cfg, "semesterbild").astype(np.float64)
    ref = read_png(os.path.join(REF, "output.png")).astype(np.float64)
    H, W = mine.shape[:2]
    rmse = float(np.sqrt(np.mean((ref - mine) ** 2)))
    mae = float(np.abs(ref - mine).mean())
    print(f"native golden RMSE {rmse:.2f}/255 ({rmse/255:.4f}) MAE {mae:.2f}")
    side = np.concatenate(
        [ref, np.full((H, 8, 3), 255.0), mine], axis=1
    ).astype(np.uint8)
    write_png(os.path.join(OUT, "golden_side_by_side_1140x950.png"), side)
    diff = np.abs(ref - mine).mean(axis=2)
    write_png(
        os.path.join(OUT, "golden_absdiff_1140x950.png"),
        np.repeat(np.clip(diff * 4.0, 0, 255)[..., None], 3, 2).astype(np.uint8),
    )

    # --- worst-diff wall region: committed 32x32 crops (golden | engine) ---
    # box-blur the diff map so we pick a *region*, not a jitter-noise pixel
    k = 16
    kern = np.ones((k, k)) / (k * k)
    from numpy.lib.stride_tricks import sliding_window_view

    win = sliding_window_view(diff, (k, k)).mean(axis=(2, 3))
    cy, cx = np.unravel_index(np.argmax(win), win.shape)
    y0 = int(np.clip(cy + k // 2 - 16, 0, H - 32))
    x0 = int(np.clip(cx + k // 2 - 16, 0, W - 32))
    crop_ref = ref[y0 : y0 + 32, x0 : x0 + 32].astype(np.uint8)
    crop_me = mine[y0 : y0 + 32, x0 : x0 + 32].astype(np.uint8)
    up = 8  # nearest-neighbour upscale so the crops are visible

    def upscale(a):
        return np.repeat(np.repeat(a, up, 0), up, 1)

    pair = np.concatenate(
        [upscale(crop_ref), np.full((32 * up, 2 * up, 3), 255, np.uint8),
         upscale(crop_me)], axis=1,
    )
    write_png(os.path.join(OUT, "right_wall_crops.png"), pair)
    meta.update(
        native_rmse_u8=round(rmse, 2),
        native_mae_u8=round(mae, 2),
        worst_region_xywh=[x0, y0, 32, 32],
        worst_region_mean_absdiff=round(float(win[cy, cx]), 2),
        crop_layout="golden | engine (oracle via scripts/oracle_patch.py)",
    )

json.dump(meta, open(os.path.join(OUT, "renders.json"), "w"), indent=1)
print("meta:", json.dumps(meta))
