"""Render the flagship semesterbild scene (ref src/main.rs) and save a PNG.

Usage: python examples/semesterbild.py [--width W] [--height H] [--out PATH]
       [--preset default|reference_default|realistic] [--small]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hslu_i.ba_raytracing.f2501_raytracer_tpu import RaytracerRenderer, RenderConfig
from hslu_i.ba_raytracing.f2501_raytracer_tpu.models import build
from hslu_i.ba_raytracing.f2501_raytracer_tpu.output import FileOutput


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--out", default="./output.png")
    ap.add_argument("--preset", default="realistic",
                    choices=["default", "reference_default", "realistic"])
    ap.add_argument("--small", action="store_true", help="228x190 quick render")
    ap.add_argument("--scene", default="semesterbild",
                    choices=["semesterbild", "test_scene", "test_text"])
    ap.add_argument("--live", action="store_true",
                    help="terminal live preview of the progressive render "
                         "(the reference's window analog; also rewrites "
                         "OUT.partial.png as tiles land)")
    ap.add_argument("--serve", action="store_true",
                    help="interactive live view over HTTP: open the printed "
                         "URL in a browser for a fit-screen window that "
                         "refreshes as tiles land; Escape stops the render "
                         "(the reference's window loop, display-server-free)")
    args = ap.parse_args()

    w = args.width or (228 if args.small else None)
    h = args.height or (190 if args.small else None)
    preset = {
        "default": RenderConfig.default_scene,
        "reference_default": RenderConfig.reference_default,
        "realistic": RenderConfig.realistic_scene,
    }[args.preset]
    cfg = preset(width=w, height=h, scene_backface_culling=True)

    scene = build(args.scene, cfg)
    print(f"{args.scene}: {len(scene.scene_objects)} objects, "
          f"{len(scene.scene_lights)} lights | {cfg.feature_string()}")

    renderer = RaytracerRenderer(cfg)
    if args.serve:
        from hslu_i.ba_raytracing.f2501_raytracer_tpu.output.http_preview import (
            HttpPreview,
            RenderAborted,
        )

        preview = HttpPreview(title=cfg.feature_string())
        url = preview.start()
        print(f"live view: {url}  (Escape in the page stops the render)")
        try:
            buf = renderer.render(scene, progress=preview)
        except RenderAborted:
            print("\nrender stopped from the live view")
            return
        preview.finish(buf)
    elif args.live:
        from hslu_i.ba_raytracing.f2501_raytracer_tpu.output.preview import (
            TerminalPreview,
        )

        preview = TerminalPreview(png_path=args.out + ".partial.png")
        buf = renderer.render(scene, progress=preview)
        preview.finish(buf)
    else:
        buf = renderer.render(
            scene, progress=lambda b, f: print(f"  {f:6.1%}", end="\r")
        )
    print(f"\nRender timing done! {buf.timing!r}")
    FileOutput(args.out).render_buffer(buf)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
