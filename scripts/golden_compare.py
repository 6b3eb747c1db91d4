"""Golden-image comparison against the reference's checked-in output.png.

The reference golden was rendered with its default cargo features
(realistic + AA rotation/randomness + high_quality => soft shadows,
1140x950, scalar path) — see BASELINE.md. Its AA jitter and per-pixel light
clouds are drawn from a thread RNG, so the golden itself is one sample of a
noisy process; exact 1e-3 RMSE parity is only defined for deterministic
configs. This script renders at a configurable scale with our deterministic
equivalents and reports RMSE on the box-downsampled pair.

Usage: python scripts/golden_compare.py [scale] [--full]
"""

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


def box_downsample(img, h, w):
    ih, iw = img.shape[:2]
    ys = np.arange(ih) * h // ih
    xs = np.arange(iw) * w // iw
    acc = np.zeros((h, w, 3), np.float64)
    cnt = np.zeros((h, w, 1), np.float64)
    np.add.at(acc, (ys[:, None], xs[None, :]), img)
    np.add.at(cnt, (ys[:, None], xs[None, :]), 1.0)
    return acc / cnt


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    W, H = 1140 // scale, 950 // scale
    cfg = RenderConfig.reference_default(
        width=W,
        height=H,
        use_pallas=os.environ.get("GOLD_PALLAS", "1") == "1",
        tile_rays=int(os.environ.get("GOLD_TILE", 65536)),
        max_nodes=int(os.environ.get("GOLD_MAX_NODES", 64)),
        weight_cutoff=float(os.environ.get("GOLD_CUTOFF", 1e-3)),
        # heavy config: cap tiles per launched program so no single on-device
        # program outlives the relay worker watchdog (~4 min; PERF.md)
        tiles_per_program=int(os.environ.get("GOLD_TPP", 4)),
        # GOLD_PACKET=1 -> the reference's simd_render build semantics:
        # 8-lane AA direction cycling + packet-shared spawn/budget decisions
        aa_packet_lanes=8 if os.environ.get("GOLD_PACKET") == "1" else 1,
        packet_mode=os.environ.get("GOLD_PACKET") == "1",
    )
    print("config:", cfg.feature_string(), "| aa rays:", cfg.total_aa_rays,
          "| lights x", cfg.point_light_multiplicator, flush=True)
    scene = build("semesterbild", cfg)
    t0 = time.monotonic()
    buf = RaytracerRenderer(cfg).render(scene)
    print(f"rendered {W}x{H} in {time.monotonic()-t0:.1f}s", flush=True)

    mine = buf.as_u8().astype(np.float64)
    write_png(f"/tmp/golden_mine_{W}x{H}.png", mine.astype(np.uint8))

    ref = read_png(os.path.join(REF, "output.png")).astype(np.float64)
    ref_small = box_downsample(ref, H, W)
    write_png(f"/tmp/golden_ref_{W}x{H}.png", ref_small.astype(np.uint8))

    rmse = float(np.sqrt(np.mean((ref_small - mine) ** 2)))
    mae = float(np.abs(ref_small - mine).mean())
    print(f"RMSE (u8): {rmse:.3f}  ({rmse/255:.5f} normalized) | MAE {mae:.3f}")

    side = np.concatenate(
        [ref_small, np.full((H, 4, 3), 255.0), mine], axis=1
    ).astype(np.uint8)
    write_png(f"/tmp/golden_side_{W}x{H}.png", side)
    print(f"side-by-side: /tmp/golden_side_{W}x{H}.png")


if __name__ == "__main__":
    main()
