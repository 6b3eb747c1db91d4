"""Distance-sorted opaque block order (pallas_kernels.SORT_GATE): exactness.

The shadow scan iterates opaque Morton blocks nearest-the-light-chunk first
(static SMEM order table) so per-lane opacity saturates early and LANE_GATE
drops umbra lanes from the remaining scan (the reference's shadow loop
early-outs per occluder hit, raytracer.rs:94-96). Opaque-block permutations
are bit-exact: a block's updates either contribute exactly 0.0 to the
dec/fr/fg/fb sums (no hit — adding 0.0 is order-free) or saturate the
lane's opq (a max, order-free), whose downstream sums are then discarded
(can_reach = opq < 1 in `_light_sums`). So kernel outputs must be
BIT-identical with the sort on and off — both on the single-chunk
(5-light realistic-style) and multi-chunk (17-light cloud) paths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hslu_i.ba_raytracing.f2501_raytracer_tpu import (
    RenderConfig,
    build_device_scene,
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops import pallas_kernels as PK
from test_opq_gate import _lanegate_scene
from test_prime_gate import _cloud_scene


def _ray_args(R=256):
    x = np.linspace(0.0, 1.0, R, dtype=np.float32)
    point = np.stack(
        [x, np.full(R, 0.1, np.float32), np.full(R, 0.5, np.float32)], -1
    )
    normal = np.tile(np.float32([0.0, 1.0, 0.0]), (R, 1))
    view = np.tile(np.float32([0.0, 0.0, 1.0]), (R, 1))
    color = np.tile(np.float32([0.8, 0.7, 0.6]), (R, 1))
    shin = np.full((R,), 0.3, np.float32)
    valid = np.ones((R,), np.float32)
    return x, tuple(
        jnp.asarray(a) for a in (point, normal, view, color, shin, valid)
    )


def _run(ds, cfg, args, flag: bool, R=256):
    old = PK.SORT_GATE
    PK.SORT_GATE = flag
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
        PK.SORT_GATE = old


def test_sort_gate_is_exact_multichunk():
    cfg = RenderConfig(width=32, height=16, triangle_block=64)
    ds = build_device_scene(_cloud_scene(), cfg)
    assert ds.tri_blk_pack.shape[0] >= 2
    assert ds.n_lights == 17  # 3 chunks of MAX_UNROLL_LIGHTS=8

    x, args = _ray_args()
    d_on, s_on = _run(ds, cfg, args, True)
    d_off, s_off = _run(ds, cfg, args, False)
    np.testing.assert_array_equal(d_on, d_off)
    np.testing.assert_array_equal(s_on, s_off)
    # sanity: the grid umbra exists and light still reaches open lanes
    left = d_on[(x > 0.22) & (x < 0.28)]
    right = d_on[(x > 0.6) & (x < 0.9)]
    assert float(left.mean()) < 0.5 * float(right.mean())
    assert float(right.mean()) > 0.0


def test_sort_gate_is_exact_single_chunk():
    cfg = RenderConfig(width=32, height=16, triangle_block=64)
    ds = build_device_scene(_lanegate_scene(), cfg)
    x, args = _ray_args()
    d_on, s_on = _run(ds, cfg, args, True)
    d_off, s_off = _run(ds, cfg, args, False)
    np.testing.assert_array_equal(d_on, d_off)
    np.testing.assert_array_equal(s_on, s_off)


def test_chunk_block_order_is_valid_permutation():
    cfg = RenderConfig(width=32, height=16, triangle_block=64)
    ds = build_device_scene(_cloud_scene(), cfg)
    nb = ds.tri_blk_pack.shape[0]
    order = np.asarray(
        PK._chunk_block_order(
            ds.light_pack, ds.tri_blk_aabb, ds.n_lights, ds.n_trans_blocks
        )
    )
    n_chunks = -(-ds.n_lights // PK.MAX_UNROLL_LIGHTS)
    assert order.shape == (n_chunks, nb - ds.n_trans_blocks)
    for c in range(n_chunks):
        assert sorted(order[c].tolist()) == list(range(ds.n_trans_blocks, nb))
