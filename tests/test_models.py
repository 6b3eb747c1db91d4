"""Scene zoo builders must produce the reference's object/light counts."""

import os

import pytest

from conftest import reference_available
from hslu_i.ba_raytracing.f2501_raytracer_tpu import RenderConfig
from hslu_i.ba_raytracing.f2501_raytracer_tpu.models import build


def test_semesterbild_counts():
    cfg = RenderConfig(width=114, height=95)
    s = build("semesterbild", cfg)
    n_spheres = len(s.scene_objects.spheres)
    n_tris = len(s.scene_objects.triangles)
    assert n_spheres == 9
    assert len(s.scene_lights) == 5
    if reference_available():
        # lowres text mesh (1639 faces) + 4 bounded planes x 12 triangles
        assert n_tris == 1639 + 48
    else:
        assert n_tris > 48  # procedural fallback + planes


def test_semesterbild_high_quality_model():
    if not reference_available():
        pytest.skip("reference data not mounted")
    cfg = RenderConfig(width=114, height=95, high_quality_model=True)
    s = build("semesterbild", cfg)
    assert len(s.scene_objects.triangles) == 14521 + 48


def test_test_scene_counts():
    cfg = RenderConfig(width=100, height=80)
    s = build("test_scene", cfg)
    assert len(s.scene_objects.spheres) == 4
    # 3 free triangles + 7 bounded planes x 12
    assert len(s.scene_objects.triangles) == 3 + 7 * 12
    assert len(s.scene_lights) == 6


def test_test_text_counts():
    cfg = RenderConfig(width=100, height=80)
    s = build("test_text", cfg)
    assert len(s.scene_lights) == 2
    assert len(s.scene_objects.triangles) > 0
