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
