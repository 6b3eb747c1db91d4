"""Wavefront engine vs scalar oracle: the central correctness gate.

The oracle (tests/oracle.py) transcribes the reference's recursive scalar
path literally; the engine must reproduce it to f32 tolerance across feature
combinations. Tolerances are loose enough for f32-vs-f64 and the Woop-vs-
Cramer triangle formulation, tight enough to catch any structural error."""

from __future__ import annotations

import os

import numpy as np
import pytest

from hslu_i.ba_raytracing.f2501_raytracer_tpu import RaytracerRenderer, RenderConfig
from oracle import OracleRenderer
from scenes import mixed_scene, preprocessed_light_tuples

SIZE = dict(width=24, height=20, tile_rays=24 * 20, weight_cutoff=0.0, max_nodes=512)


def run_both(cfg):
    scene = mixed_scene(cfg)
    lights = preprocessed_light_tuples(scene, cfg)
    oracle_img, oracle_valid = OracleRenderer(scene, cfg, lights).render()
    buf = RaytracerRenderer(cfg).render(scene)
    return oracle_img, oracle_valid, buf.as_linear(), buf.valid


def check(cfg, atol=2e-3, frac=0.005):
    o_img, o_valid, e_img, e_valid = run_both(cfg)
    assert o_valid.sum() > 20, "oracle should hit something"
    mismatch = o_valid != e_valid
    assert mismatch.mean() < 0.005, f"validity mismatch on {mismatch.sum()} pixels"
    both = o_valid & e_valid
    diff = np.abs(o_img - e_img)[both]
    # a tiny fraction of pixels may diverge on knife-edge mask decisions
    frac_bad = (diff.max(axis=-1) > atol).mean()
    assert frac_bad < frac, (
        f"{frac_bad:.3%} pixels off; max diff {diff.max():.5f}, "
        f"mean {diff.mean():.6f}"
    )


def test_parity_basic():
    check(RenderConfig(**SIZE))


def test_parity_backface_culling():
    check(RenderConfig(backface_culling=True, **SIZE))


def test_parity_reflections_only():
    check(RenderConfig(reflections=True, **SIZE))


def test_parity_refractions_only():
    check(RenderConfig(refractions=True, **SIZE))


def test_parity_realistic():
    check(RenderConfig(reflections=True, refractions=True, **SIZE))


def test_parity_soft_shadows():
    # soft_shadows expands every light into a 10-light Poisson cloud; the
    # engine and oracle share the seeded preprocessing, so results must match
    cfg = RenderConfig(
        reflections=True, refractions=True, soft_shadows=True, **SIZE
    )
    check(cfg, atol=3e-3)


@pytest.mark.skipif(
    os.environ.get("PARITY_FAST") == "1",
    reason="medium-res oracle gate skipped via PARITY_FAST",
)
def test_parity_medium_realistic():
    """Medium-resolution oracle gate (VERDICT r1 item 8): 160x120 realistic,
    <0.5% divergent pixels. The oracle is a per-pixel Python transcription,
    so this is the slowest gate in the suite (~5 min); PARITY_FAST=1 skips
    it for quick local loops — CI runs it."""
    cfg = RenderConfig(
        width=160, height=120, tile_rays=160 * 120,
        weight_cutoff=0.0, max_nodes=512,
        reflections=True, refractions=True,
    )
    check(cfg)


def test_parity_small_interpret():
    """The Pallas kernels themselves (interpret mode on CPU) against the
    scalar oracle — no XLA-path intermediary."""
    cfg = RenderConfig(
        reflections=True, refractions=True,
        use_pallas=True, interpret=True, **SIZE,
    )
    check(cfg)


def test_parity_soft_shadows_interpret():
    """Many-light kernel path (soft-shadow clouds exceed one 8-light chunk,
    exercising the fori-of-chunks scan with dynamic light-row slices)
    against the scalar oracle, in interpret mode."""
    cfg = RenderConfig(
        reflections=True, refractions=True, soft_shadows=True,
        use_pallas=True, interpret=True, **SIZE,
    )
    check(cfg, atol=3e-3)


def test_parity_adaptive_refraction_budgets():
    """Opacities 0.25/0.45 hit the divisor-3 / divisor-2 + step-2 budget
    branches (raytracer_renderer.rs:458-491)."""
    from scenes import translucent_scene

    cfg = RenderConfig(reflections=True, refractions=True, **SIZE)
    scene = translucent_scene(cfg)
    lights = preprocessed_light_tuples(scene, cfg)
    o_img, o_valid = OracleRenderer(scene, cfg, lights).render()
    buf = RaytracerRenderer(cfg).render(scene)
    e_img, e_valid = buf.as_linear(), buf.valid
    assert (o_valid != e_valid).mean() < 0.01
    both = o_valid & e_valid
    diff = np.abs(o_img - e_img)[both]
    assert (diff.max(axis=-1) > 2e-3).mean() < 0.02, f"max {diff.max():.5f}"
