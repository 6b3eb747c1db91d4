"""Per-ray opaque-occlusion gate fold (pallas_kernels.OPQ_GATE): exactness.

The fold drops lanes already fully occluded by the sphere/big-primitive
pre-pass out of the Morton block gates (raytracer.rs:94-96 semantics — a
completely occluded lane's dec/fr/fg/fb sums are unused downstream, so
skipping blocks whose only crossing lanes are occluded cannot change the
image). This test constructs a wavefront where the fold provably flips
gates — half the lanes are shadowed by an opaque sphere whose shadow
segments ALSO cross a Morton triangle cluster, the other half cross
neither — and asserts the kernel outputs are bit-identical with the fold
on and off (interpret mode on CPU)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hslu_i.ba_raytracing.f2501_raytracer_tpu import (
    Material,
    PointLight,
    RenderConfig,
    Scene,
    SphereData,
    TransmissionProperties,
    TriangleData,
    build_device_scene,
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.ops import pallas_kernels as PK


def _gate_scene() -> Scene:
    s = Scene()
    # opaque sphere between the left-half hit points and the light
    s.add_sphere(
        SphereData.with_material(
            (0.25, 0.3, 0.5), 0.12,
            Material.new((0.7, 0.7, 0.7), 0.0, 0.0, TransmissionProperties.none()),
        )
    )
    # tiny-triangle cluster above the sphere, on the occluded lanes'
    # shadow segments only (x in [0.2, 0.3], y in [0.55, 0.65], z = 0.5)
    rng = np.random.default_rng(7)
    for _ in range(24):
        cx = rng.uniform(0.21, 0.29)
        cy = rng.uniform(0.56, 0.64)
        e1 = rng.uniform(-0.008, 0.008, 3)
        e2 = rng.uniform(-0.008, 0.008, 3)
        a = np.array([cx, cy, 0.5])
        s.add_triangle(
            TriangleData.with_material(
                tuple(a), tuple(a + e1), tuple(a + e2),
                Material.new(
                    (0.4, 0.5, 0.6), 0.0, 0.2, TransmissionProperties.none()
                ),
            )
        )
    s.add_light(PointLight.new((0.25, 0.9, 0.5), (1.0, 0.9, 0.8), 1.0))
    return s


def test_opq_gate_fold_is_exact():
    cfg = RenderConfig(width=32, height=16)
    ds = build_device_scene(_gate_scene(), cfg)
    assert ds.tri_blk_pack.shape[0] >= 1  # cluster landed in the Morton pack

    R = 256
    x = np.linspace(0.0, 1.0, R, dtype=np.float32)
    point = np.stack([x, np.full(R, 0.1, np.float32), np.full(R, 0.5, np.float32)], -1)
    normal = np.tile(np.float32([0.0, 1.0, 0.0]), (R, 1))
    view = np.tile(np.float32([0.0, 0.0, 1.0]), (R, 1))
    color = np.tile(np.float32([0.8, 0.7, 0.6]), (R, 1))
    shin = np.full((R,), 0.3, np.float32)
    valid = np.ones((R,), np.float32)
    args = tuple(
        jnp.asarray(a) for a in (point, normal, view, color, shin, valid)
    )

    def run(flag: bool):
        old = PK.OPQ_GATE
        PK.OPQ_GATE = flag
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
            PK.OPQ_GATE = old

    d_on, s_on = run(True)
    d_off, s_off = run(False)
    np.testing.assert_array_equal(d_on, d_off)
    np.testing.assert_array_equal(s_on, s_off)
    # sanity: the sphere shadow actually darkens the left half relative to
    # the right (i.e. the pre-pass produced occluded lanes to fold)
    left = d_on[(x > 0.2) & (x < 0.3)]
    right = d_on[(x > 0.6) & (x < 0.9)]
    assert float(left.mean()) < 0.5 * float(right.mean())


def _lanegate_scene() -> Scene:
    """Two stacked Morton clusters on the same shadow column: a watertight
    opaque triangle grid at y=0.45 fully occludes the left lanes MID-SCAN
    (opq evolves inside the block loop, not in the pre-pass), and a second
    cluster at y=0.6 crosses the same segments — with LANE_GATE its blocks
    are skipped for those lanes while unoccluded lanes elsewhere keep their
    gates."""
    s = Scene()
    opaque = Material.new(
        (0.7, 0.7, 0.7), 0.0, 0.0, TransmissionProperties.none()
    )
    # watertight grid over x [0.2, 0.3] x z [0.44, 0.56] at y = 0.45,
    # normals -y (toward the hit points) so shadow backface culling keeps it
    # cells small enough to stay under the big-primitive split (10% of
    # scene diagonal, scene/device.py) so the grid lands in Morton blocks
    nx_, nz_ = 12, 8
    xs = np.linspace(0.2, 0.3, nx_ + 1)
    zs = np.linspace(0.44, 0.56, nz_ + 1)
    for i in range(nx_):
        for k in range(nz_):
            a = (xs[i], 0.45, zs[k])
            bx = (xs[i + 1], 0.45, zs[k])
            cz = (xs[i], 0.45, zs[k + 1])
            d2 = (xs[i + 1], 0.45, zs[k + 1])
            s.add_triangle(TriangleData.with_material(a, bx, cz, opaque))
            s.add_triangle(TriangleData.with_material(d2, cz, bx, opaque))
    # second cluster behind the grid (closer to the light)
    rng = np.random.default_rng(11)
    for _ in range(24):
        cx = rng.uniform(0.21, 0.29)
        cy = rng.uniform(0.58, 0.62)
        e1 = rng.uniform(-0.008, 0.008, 3)
        e2 = rng.uniform(-0.008, 0.008, 3)
        a = np.array([cx, cy, 0.5])
        s.add_triangle(
            TriangleData.with_material(
                tuple(a), tuple(a + e1), tuple(a + e2),
                Material.new(
                    (0.4, 0.5, 0.6), 0.0, 0.2, TransmissionProperties.none()
                ),
            )
        )
    s.add_light(PointLight.new((0.25, 0.9, 0.5), (1.0, 0.9, 0.8), 1.0))
    return s


def test_lane_gate_is_exact():
    """pallas_kernels.LANE_GATE bit-identity: per-lane evolving-opacity
    block gating must not change kernel outputs (skipped pair math only
    touches lanes whose results are discarded by can_reach)."""
    # small triangle_block so the two clusters land in separate Morton
    # blocks (mid-scan opq evolution must cross a block boundary to
    # exercise the per-lane gate)
    cfg = RenderConfig(width=32, height=16, triangle_block=64)
    ds = build_device_scene(_lanegate_scene(), cfg)
    assert ds.tri_blk_pack.shape[0] >= 2  # both clusters in the Morton pack

    R = 256
    x = np.linspace(0.0, 1.0, R, dtype=np.float32)
    point = np.stack([x, np.full(R, 0.1, np.float32), np.full(R, 0.5, np.float32)], -1)
    normal = np.tile(np.float32([0.0, 1.0, 0.0]), (R, 1))
    view = np.tile(np.float32([0.0, 0.0, 1.0]), (R, 1))
    color = np.tile(np.float32([0.8, 0.7, 0.6]), (R, 1))
    shin = np.full((R,), 0.3, np.float32)
    valid = np.ones((R,), np.float32)
    args = tuple(
        jnp.asarray(a) for a in (point, normal, view, color, shin, valid)
    )

    def run(flag: bool):
        old = PK.LANE_GATE
        PK.LANE_GATE = flag
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
            PK.LANE_GATE = old

    d_on, s_on = run(True)
    d_off, s_off = run(False)
    np.testing.assert_array_equal(d_on, d_off)
    np.testing.assert_array_equal(s_on, s_off)
    # sanity: the grid occludes the left lanes (mid-scan opq=1 lanes exist)
    left = d_on[(x > 0.22) & (x < 0.28)]
    right = d_on[(x > 0.6) & (x < 0.9)]
    assert float(left.mean()) < 0.5 * float(right.mean())
