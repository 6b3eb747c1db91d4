"""Dominant-occluder prime (pallas_kernels.PRIME_GATE): exactness.

Multi-chunk light loops carry the opaque Morton block that newly saturated
the most lanes in the previous chunk's scan and run just that block first
for the next chunk (two-pass shadow evaluation — VERDICT r3 items 2/4; the
reference's soft-shadow cloud lights of one source share occluders,
light.rs:183-226). The prime only raises the opq carry of lanes the scan
would have saturated anyway at the same block, and every downstream term of
a saturated lane is discarded (can_reach = opq < 1 in `_light_sums`), so
kernel outputs must be bit-identical with the prime on and off.

Scene: the LANE_GATE two-cluster stack (watertight opaque grid occluding
the left lanes mid-scan + a second cluster on the same shadow column) lit
by a 17-light cloud → 3 chunks of 8, so chunk 1+ prime with chunk 0's
dominant block.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hslu_i.ba_raytracing.f2501_raytracer_tpu import (
    PointLight,
    RenderConfig,
    build_device_scene,
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops import pallas_kernels as PK
from test_opq_gate import _lanegate_scene


def _cloud_scene():
    s = _lanegate_scene()
    # replace the single light with a 17-light cloud around it (same
    # source direction, slightly jittered positions — the chunks share
    # the dominant occluder, which is what the prime exploits)
    s.scene_lights.clear()
    rng = np.random.default_rng(23)
    for _ in range(17):
        p = np.float32([0.25, 0.9, 0.5]) + rng.uniform(-0.02, 0.02, 3)
        s.add_light(PointLight.new(tuple(p), (1.0, 0.9, 0.8), 0.3))
    return s


def test_prime_gate_is_exact():
    cfg = RenderConfig(width=32, height=16, triangle_block=64)
    ds = build_device_scene(_cloud_scene(), cfg)
    assert ds.tri_blk_pack.shape[0] >= 2
    assert ds.n_lights == 17  # 3 chunks of MAX_UNROLL_LIGHTS=8

    R = 256
    x = np.linspace(0.0, 1.0, R, dtype=np.float32)
    point = np.stack(
        [x, np.full(R, 0.1, np.float32), np.full(R, 0.5, np.float32)], -1
    )
    normal = np.tile(np.float32([0.0, 1.0, 0.0]), (R, 1))
    view = np.tile(np.float32([0.0, 0.0, 1.0]), (R, 1))
    color = np.tile(np.float32([0.8, 0.7, 0.6]), (R, 1))
    shin = np.full((R,), 0.3, np.float32)
    valid = np.ones((R,), np.float32)
    args = tuple(
        jnp.asarray(a) for a in (point, normal, view, color, shin, valid)
    )

    def run(flag: bool):
        old = PK.PRIME_GATE
        PK.PRIME_GATE = flag
        try:
            f = jax.jit(
                lambda *a: PK.pallas_light_shade.__wrapped__(
                    ds.light_pack, ds.sph_pack, ds.trb_pack,
                    ds.tri_blk_pack, ds.tri_blk_aabb, *a,
                    n_lights=ds.n_lights,
                    eps_dist=float(cfg.camera.epsilon_distance),
                    n_trans_blocks=ds.n_trans_blocks,
                    ray_tile=R, interpret=True,
                    bigtri_trans_rows=ds.bigtri_trans_rows,
                )
            )
            d, sp = f(*args)
            return np.asarray(d), np.asarray(sp)
        finally:
            PK.PRIME_GATE = old

    d_on, s_on = run(True)
    d_off, s_off = run(False)
    np.testing.assert_array_equal(d_on, d_off)
    np.testing.assert_array_equal(s_on, s_off)
    # sanity: the grid umbra exists (prime-saturable lanes) and light
    # still reaches the open lanes
    left = d_on[(x > 0.22) & (x < 0.28)]
    right = d_on[(x > 0.6) & (x < 0.9)]
    assert float(left.mean()) < 0.5 * float(right.mean())
    assert float(right.mean()) > 0.0
