"""Stratified golden-adjudication grid (VERDICT r3 item 6).

Widens the 2-patch right-wall adjudication (scripts/oracle_patch.py) to a
~20-patch stratified grid over the native 1140x950 frame, testing the claim
"engine == scalar oracle everywhere; where the checked-in golden disagrees
with the engine it disagrees with the oracle by the same amount" across the
whole frame instead of at one wall.

Patch selection (stratified):
  - the N_WORST highest blurred |golden - engine_full| windows, greedily
    spread (min separation SEP px) — the worst-decile diff regions;
  - N_CTRL control windows from the lowest-diff windows with nonzero golden
    brightness, also spread.

Per patch, on a cheap DETERMINISTIC shared config (lowres mesh, no AA, hard
shadows — the full reference_default config is infeasible for the per-pixel
Python oracle):
  oracle(cheap) vs engine(cheap):   expect bit-exact u8 (max |delta| == 0)
  golden vs engine(full render):    the observed divergence
  golden vs oracle(cheap):          ~equal to the above where the cheap
                                    config approximates the full one

Outputs (committed):
  docs/renders/oracle_grid.json — per-patch table + aggregate verdict
  docs/renders/oracle_grid.png  — patch montage rows:
                                  golden | engine(full) | engine(cheap) | oracle

CPU-only; ~30-60 min at PS=16 on the 1-core box (run with nice 19, alone or
under TPU-bound work only). Needs docs/renders/semesterbild_1140x950.png
(scripts/make_renders.py).
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
W, H = 1140, 950
PS = int(os.environ.get("PATCH", 16))      # patch edge (px)
N_WORST = int(os.environ.get("N_WORST", 10))
N_CTRL = int(os.environ.get("N_CTRL", 10))
SEP = int(os.environ.get("SEP", 96))       # min patch separation (px)

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

diff = np.abs(golden - full).mean(axis=2)
from numpy.lib.stride_tricks import sliding_window_view

win = sliding_window_view(diff, (PS, PS)).mean(axis=(2, 3))
bright = sliding_window_view(golden.mean(axis=2), (PS, PS)).mean(axis=(2, 3))


def pick_spread(score_map, n, minimize):
    """Greedy top-n window corners with >= SEP separation."""
    s = score_map.copy()
    if minimize:
        s = np.where(np.isfinite(s), s, np.inf)
    picks = []
    order = np.argsort(s, axis=None)
    if not minimize:
        order = order[::-1]
    for flat in order:
        cy, cx = np.unravel_index(flat, s.shape)
        if minimize and not np.isfinite(s[cy, cx]):
            break
        if all(max(abs(cx - px), abs(cy - py)) >= SEP for px, py in picks):
            picks.append((int(cx), int(cy)))
            if len(picks) >= n:
                break
    return picks


worst = pick_spread(win, N_WORST, minimize=False)
ctrl_score = np.where(bright > 40.0, win, np.inf)
ctrl = pick_spread(ctrl_score, N_CTRL, minimize=True)

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
    coords = pixel_scene_coords(cfg, gx.ravel(), gy.ravel())
    dirs = coords - focus.astype(np.float32)
    color, pvalid = trace_rays(dscene, cfg, jnp.asarray(coords), jnp.asarray(dirs))
    out = np.where(np.asarray(pvalid)[:, None], np.asarray(color), 0.0)
    return linear_to_u8(out).astype(np.float64).reshape(PS, PS, 3)


def oracle_patch(rx, ry, tag):
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
        print(f"{tag}: row {j + 1}/{PS}", flush=True)
    return np.floor(np.clip(patch, 0, 1) * 255.0 + 0.5)


# interleave worst/control so partial runs cover both strata; write the
# JSON + montage INCREMENTALLY after every patch (the per-pixel Python
# oracle is ~10 s/px — a wall-budget kill must not lose completed patches)
queue = []
for i in range(max(len(worst), len(ctrl))):
    if i < len(worst):
        queue.append(("worst", i, worst[i]))
    if i < len(ctrl):
        queue.append(("control", i, ctrl[i]))


def flush_outputs(rows, table, total):
    img_rows = []
    for r in rows:
        img_rows.append(r)
        img_rows.append(np.full((6, r.shape[1], 3), 255, np.uint8))
    if img_rows:
        # atomic: write to a temp file and os.replace() it, so a wall-budget
        # kill mid-write can't corrupt the committed montage (ADVICE r4)
        png_path = os.path.join(OUT, "oracle_grid.png")
        write_png(png_path + ".tmp", np.concatenate(img_rows[:-1], axis=0))
        os.replace(png_path + ".tmp", png_path)
    # aggregate verdict: the engine==oracle claim must hold on EVERY patch;
    # the golden residual should track golden_vs_engine on worst patches
    # and vanish on controls
    def _mean(key, kind):
        vals = [r[key] for r in table if r["kind"] == kind]
        return round(float(np.mean(vals)), 2) if vals else None

    agg = dict(
        patches=len(table),
        patches_planned=total,
        patch_px=PS,
        engine_eq_oracle_everywhere=bool(
            all(r["oracle_vs_engine_cheap_max"] == 0.0 for r in table)
        ),
        worst_mean_golden_vs_engine=_mean("golden_vs_engine_full_mean", "worst"),
        worst_mean_golden_vs_oracle=_mean("golden_vs_oracle_mean", "worst"),
        control_mean_golden_vs_engine=_mean(
            "golden_vs_engine_full_mean", "control"),
        layout="cols: golden | engine(full cfg) | engine(cheap cfg) | oracle(cheap cfg)",
    )
    json_path = os.path.join(OUT, "oracle_grid.json")
    with open(json_path + ".tmp", "w") as fh:
        json.dump(dict(summary=agg, patches=table), fh, indent=1)
    os.replace(json_path + ".tmp", json_path)
    return agg


rows, table = [], []
# RESUME (default on): patch selection is deterministic (fixed golden +
# committed full render), so reload completed patches from the
# incrementally-written outputs and only run the remainder — a killed run
# (wall budget, signal) costs only its in-flight patch
if os.environ.get("RESUME", "1") != "0":
    jp = os.path.join(OUT, "oracle_grid.json")
    pp = os.path.join(OUT, "oracle_grid.png")
    if os.path.exists(jp) and os.path.exists(pp):
        prev = json.load(open(jp))
        table = prev.get("patches", [])
        img = read_png(pp).astype(np.uint8)
        rh = PS * 6  # upscaled patch-row height (see U() below)
        for i in range(len(table)):
            rows.append(img[i * (rh + 6) : i * (rh + 6) + rh])
        print(f"resuming: {len(table)} patches loaded", flush=True)
done_keys = {(r["kind"], tuple(r["xy"])) for r in table}

for kind, idx, (rx, ry) in queue:
    if (kind, (rx, ry)) in done_keys:
        continue
    tag = f"{kind}{idx}@{rx},{ry}"
    e = engine_patch(rx, ry)
    o = oracle_patch(rx, ry, tag)
    g = golden[ry : ry + PS, rx : rx + PS]
    f = full[ry : ry + PS, rx : rx + PS]
    rec = dict(
        kind=kind, xy=[rx, ry],
        oracle_vs_engine_cheap_max=float(np.abs(o - e).max()),
        golden_vs_engine_full_mean=round(float(np.abs(g - f).mean()), 2),
        golden_vs_oracle_mean=round(float(np.abs(g - o).mean()), 2),
        engine_full_vs_cheap_mean=round(float(np.abs(f - e).mean()), 2),
    )
    table.append(rec)
    print(json.dumps(rec), flush=True)
    up = 6

    def U(a):
        return np.repeat(np.repeat(a.astype(np.uint8), up, 0), up, 1)

    gap = np.full((PS * up, up, 3), 255, np.uint8)
    rows.append(
        np.concatenate([U(g), gap, U(f), gap, U(e), gap, U(o)], axis=1)
    )
    flush_outputs(rows, table, len(queue))

print(json.dumps(flush_outputs(rows, table, len(queue)), indent=1))
