"""CLI entry: render a scene from the model zoo.

The reference has no runtime CLI (all configuration is compile-time cargo
features, SURVEY.md §5); this maps those feature sets onto flags:

  python -m hslu_i.ba_raytracing.f2501_raytracer_tpu \
      --scene semesterbild --preset realistic --width 768 --height 640 \
      --out output.png
"""

from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser(prog="f2501_raytracer_tpu")
    ap.add_argument("--scene", default="semesterbild",
                    choices=["semesterbild", "test_scene", "test_text"])
    ap.add_argument("--preset", default="realistic",
                    choices=["default", "reference_default", "realistic"])
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--out", default="./output.png")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--progress", action="store_true",
                    help="per-tile progressive rendering with status output")
    args = ap.parse_args()

    from . import RaytracerRenderer, RenderConfig
    from .models import build
    from .output import FileOutput

    preset = {
        "default": RenderConfig.default_scene,
        "reference_default": RenderConfig.reference_default,
        "realistic": RenderConfig.realistic_scene,
    }[args.preset]
    cfg = preset(width=args.width, height=args.height,
                 scene_backface_culling=True, seed=args.seed)

    scene = build(args.scene, cfg)
    print(f"Num of obj in scene: {len(scene.scene_objects)}")
    print(cfg.feature_string())

    cb = (lambda b, f: print(f"  {f:6.1%}", end="\r")) if args.progress else None
    buf = RaytracerRenderer(cfg).render(scene, progress=cb)
    print(f"Render timing done! {buf.timing!r}")
    FileOutput(args.out).render_buffer(buf)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
