"""Per-scene knob auto-tuner.

The optimal `triangle_block` flips with scene, resolution, and kernel cost
(measured across rounds: 512 at small frames, 64 at 1080p on the
semesterbild, 256 on the 14.8k-face hq mesh — PERF.md), so a fixed default
always leaves something on the table. `autotune` times ONE representative
ray tile per candidate in the current process/session (cross-session
variance on relay-attached TPUs is 3-4x, so same-session comparison is the
only sound protocol) and returns the fastest candidate's config + device
scene, ready to render.

The reference has no analog — its tile size is a compile-time lcm/gcd
constant (renderer/mod.rs:84-90); a runtime-retargetable framework can
afford to measure instead of guess.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Iterable, Optional, Sequence

import jax
import numpy as np

from .config import RenderConfig
from .ops.trace import trace_rays
from .scene.builder import Scene
from .scene.device import DeviceScene, build_device_scene


@dataclasses.dataclass(frozen=True)
class TuneResult:
    cfg: RenderConfig
    device_scene: DeviceScene
    timings_ms: dict  # candidate triangle_block -> best-of-repeats ms
    tuned_block: int


def _probe_rays(cfg: RenderConfig, n: int) -> tuple[np.ndarray, np.ndarray]:
    """A representative wavefront: the frame's central rays in the same
    tile-major layout the renderer traces (central tiles see the scene;
    border tiles can be all-background and would reward over-culling)."""
    from .renderer import build_frame_rays, plan_frame

    plan = plan_frame(cfg)
    o, d = build_frame_rays(cfg, plan)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    mid = len(o) // 2
    start = max(0, min(mid - n // 2, len(o) - n))
    return o[start : start + n], d[start : start + n]


def autotune(
    scene: Scene,
    cfg: RenderConfig,
    candidates: Sequence[int] = (32, 64, 128, 256, 512),
    repeats: int = 3,
    tile: Optional[int] = None,
    verbose: bool = False,
) -> TuneResult:
    """Time one `tile`-ray wavefront per triangle_block candidate and return
    the fastest candidate's (cfg, device_scene). Every candidate produces a
    bit-identical image (block size only regroups the scan), so this is a
    pure-performance choice. Costs one compile per NEW candidate (the
    persistent compilation cache amortizes repeat tuning)."""
    import jax.numpy as jnp

    tile = tile or cfg.tile_rays
    o_np, d_np = _probe_rays(cfg, tile)
    timings: dict[int, float] = {}
    best_ds = None
    best_cfg = None
    for B in candidates:
        cand = dataclasses.replace(cfg, triangle_block=int(B))
        ds = build_device_scene(scene, cand)
        o = jnp.asarray(o_np)
        d = jnp.asarray(d_np)
        out = trace_rays(ds, cand, o, d)
        jax.block_until_ready(out)
        # relay quirk: the first block_until_ready after a fresh compile can
        # return early — force a value fetch before timing
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf).ravel()[0]
        best = float("inf")
        for _ in range(repeats):
            t0 = time.monotonic()
            out = trace_rays(ds, cand, o, d)
            jax.block_until_ready(out)
            best = min(best, (time.monotonic() - t0) * 1e3)
        timings[int(B)] = best
        if verbose:
            print(f"autotune: triangle_block={B}: {best:.2f} ms", flush=True)
        if best_cfg is None or best < timings[best_cfg.triangle_block]:
            best_cfg, best_ds = cand, ds
    return TuneResult(
        cfg=best_cfg,
        device_scene=best_ds,
        timings_ms=timings,
        tuned_block=best_cfg.triangle_block,
    )
