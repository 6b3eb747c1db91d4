"""Golden-image regression vs the reference's checked-in output.png.

The golden was rendered by the reference's default cargo build (realistic +
AA + soft shadows at 1140x950) whose AA jitter and per-pixel light clouds
come from a thread RNG — the golden itself carries sampling noise, so this
gate is a coarse structural check (layout/orientation/palette), not the
1e-3 oracle gate. Heavy: runs only with RUN_GOLDEN=1 (CPU) — the TPU
variant is scripts/golden_compare.py.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from conftest import REFERENCE_ROOT, reference_available
from hslu_i.ba_raytracing.f2501_raytracer_tpu import RaytracerRenderer, RenderConfig
from hslu_i.ba_raytracing.f2501_raytracer_tpu.models import build
from hslu_i.ba_raytracing.f2501_raytracer_tpu.output.png_io import read_png


def box_downsample(img, h, w):
    ih, iw = img.shape[:2]
    ys = np.arange(ih) * h // ih
    xs = np.arange(iw) * w // iw
    acc = np.zeros((h, w, 3), np.float64)
    cnt = np.zeros((h, w, 1), np.float64)
    np.add.at(acc, (ys[:, None], xs[None, :]), img)
    np.add.at(cnt, (ys[:, None], xs[None, :]), 1.0)
    return acc / cnt


def test_golden_structural_cheap_always_on():
    """ALWAYS-ON structural gate vs the reference golden (VERDICT r2 item 9):
    a 57x47 realistic render (no AA, no soft shadows, lowres mesh — ~35 s on
    CPU) against the box-downsampled output.png. The absent supersampling /
    light clouds cost a few RMSE points (measured 33.0 vs ~30 with them), so
    the same coarse structural bound applies: catches flips, palette breaks,
    and shading regressions in default CI without opt-in flags."""
    if not reference_available():
        pytest.skip("reference data not mounted")
    W, H = 57, 47
    cfg = RenderConfig(
        width=W, height=H, reflections=True, refractions=True,
        light_reflections=True, scene_backface_culling=True, max_nodes=64,
    )
    scene = build("semesterbild", cfg)
    buf = RaytracerRenderer(cfg).render(scene)
    mine = buf.as_u8().astype(np.float64)
    ref = read_png(os.path.join(REFERENCE_ROOT, "output.png")).astype(np.float64)
    ref_small = box_downsample(ref, H, W)
    rmse = float(np.sqrt(np.mean((ref_small - mine) ** 2)))
    assert rmse < 40.0, f"golden structural RMSE {rmse:.2f} too high"


@pytest.mark.skipif(
    os.environ.get("RUN_GOLDEN") != "1", reason="heavy; set RUN_GOLDEN=1"
)
def test_golden_structural_rmse():
    if not reference_available():
        pytest.skip("reference data not mounted")
    scale = int(os.environ.get("GOLDEN_SCALE", 10))
    W, H = 1140 // scale, 950 // scale
    cfg = RenderConfig.reference_default(width=W, height=H, max_nodes=64)
    # GOLDEN_FAST=1 builds the scene with the lowres text mesh (1.6k vs
    # 14.5k faces): ~8x faster on CPU; the structural gate is insensitive
    # to glyph detail at these downsample sizes. Full-fidelity check: unset
    # it (or use the TPU variant, scripts/golden_compare.py). The render
    # config itself is unchanged (high_quality forces the flag back on, so
    # only the scene build sees the override).
    scene_cfg = cfg
    if os.environ.get("GOLDEN_FAST") == "1":
        scene_cfg = RenderConfig.default_scene(width=W, height=H)
    scene = build("semesterbild", scene_cfg)
    buf = RaytracerRenderer(cfg).render(scene)
    mine = buf.as_u8().astype(np.float64)
    ref = read_png(os.path.join(REFERENCE_ROOT, "output.png")).astype(np.float64)
    ref_small = box_downsample(ref, H, W)
    rmse = float(np.sqrt(np.mean((ref_small - mine) ** 2)))
    # coarse structural gate; see PARITY.md on golden nondeterminism
    assert rmse < 40.0, f"golden RMSE {rmse:.2f} too high"
