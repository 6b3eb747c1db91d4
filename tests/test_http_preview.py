"""HTTP live view (output/http_preview.py): frame serving, stop semantics,
and end-to-end with the progressive renderer."""

from __future__ import annotations

import urllib.request

import numpy as np
import pytest

from hslu_i.ba_raytracing.f2501_raytracer_tpu import (
    ImageBuffer,
    RaytracerRenderer,
    RenderConfig,
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.output.http_preview import (
    HttpPreview,
    RenderAborted,
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.output.png_io import read_png
from scenes import mixed_scene


def test_serves_frame_and_stops():
    pv = HttpPreview(title="t", fps=1000.0)
    url = pv.start()
    try:
        buf = ImageBuffer(8, 6)
        buf.commit_tile(0, 0, np.full((6, 8, 3), 0.5, np.float32),
                        np.ones((6, 8), bool))
        pv(buf, 1.0)

        page = urllib.request.urlopen(url, timeout=10).read().decode()
        assert "<title>t</title>" in page and "Escape" in page

        png = urllib.request.urlopen(url + "frame.png", timeout=10).read()
        import io, tempfile, os
        with tempfile.NamedTemporaryFile(suffix=".png", delete=False) as f:
            f.write(png)
            path = f.name
        try:
            img = read_png(path)
        finally:
            os.unlink(path)
        assert img.shape == (6, 8, 3)
        assert img.max() > 0

        # Escape -> POST /stop -> next callback raises (window-close exit)
        req = urllib.request.Request(url + "stop", method="POST", data=b"")
        urllib.request.urlopen(req, timeout=10)
        assert pv.stopped
        with pytest.raises(RenderAborted):
            pv(buf, 0.5)
    finally:
        pv.close()


def test_progressive_render_through_preview():
    cfg = RenderConfig(width=24, height=20, tile_rays=120)  # 4 tiles
    pv = HttpPreview(fps=1000.0)
    url = pv.start()
    try:
        buf = RaytracerRenderer(cfg).render(mixed_scene(cfg), progress=pv)
        pv.finish(buf)
        png = urllib.request.urlopen(url + "frame.png", timeout=10).read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        assert len(png) > 100
    finally:
        pv.close()
