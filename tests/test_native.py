"""Native host runtime (csrc/rt_host.cpp) vs python fallbacks."""

from __future__ import annotations

import numpy as np
import pytest

from hslu_i.ba_raytracing.f2501_raytracer_tpu.output.png_io import read_png
from hslu_i.ba_raytracing.f2501_raytracer_tpu.utils import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native host library unavailable")
    return lib


def test_native_woop_matches_numpy(lib):
    rng = np.random.default_rng(0)
    v1 = rng.normal(size=(64, 3))
    v2 = v1 + rng.normal(size=(64, 3))
    v3 = v1 + rng.normal(size=(64, 3))
    v2[5] = v1[5]  # degenerate
    w4, nsq, ok = native.native_woop_transforms(v1, v2, v3)
    assert not ok[5] and ok.sum() == 63

    e1, e2 = v2 - v1, v3 - v1
    ng = np.cross(e1, e2)
    n2 = np.einsum("tc,tc->t", ng, ng)
    good = n2 > 0
    M = np.stack([e1, e2, ng], axis=2)
    A = np.linalg.inv(np.where(good[:, None, None], M, np.eye(3)))
    b = -np.einsum("tij,tj->ti", A, v1)
    w4_np = np.concatenate([A.transpose(0, 2, 1), b[:, None, :]], axis=1)
    np.testing.assert_allclose(w4[ok], w4_np[good].astype(np.float32), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(nsq[ok], n2[good].astype(np.float32), rtol=1e-5)


def test_native_obj_parser(tmp_path, lib):
    obj = tmp_path / "t.obj"
    obj.write_text(
        "mtllib lib.mtl\n"
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vn 0 0 1\nvn 1 0 0\n"
        "usemtl a\n"
        "f 1//1 2//1 3//2 4//2\n"
        "usemtl b\n"
        "f -4 -3 -2\n"
    )
    out = native.native_parse_obj(str(obj))
    assert out is not None
    positions, normals, tri_pos, tri_nrm, tri_mat, names, mtllib = out
    assert positions.shape == (4, 3) and normals.shape == (2, 3)
    assert tri_pos.shape == (3, 3)
    np.testing.assert_array_equal(tri_pos[0], [0, 1, 2])
    np.testing.assert_array_equal(tri_pos[1], [0, 2, 3])
    np.testing.assert_array_equal(tri_pos[2], [0, 1, 2])  # negative indices
    np.testing.assert_array_equal(tri_nrm[0], [0, 0, 1])
    assert names == ["a", "b"]
    assert list(tri_mat) == [0, 0, 1]
    assert mtllib == "lib.mtl"


def test_native_morton_order_locality(lib):
    rng = np.random.default_rng(1)
    pts = rng.random((256, 3)).astype(np.float32)
    order = native.native_morton_order(pts)
    assert sorted(order.tolist()) == list(range(256))
    # morton ordering should reduce the mean hop distance vs random order
    hops = np.linalg.norm(np.diff(pts[order], axis=0), axis=1).mean()
    hops_rand = np.linalg.norm(np.diff(pts, axis=0), axis=1).mean()
    assert hops < hops_rand * 0.6


def test_native_cluster_aabbs(lib):
    verts = np.zeros((4, 3, 3), np.float32)
    verts[0] = [[0, 0, 0], [1, 0, 0], [0, 1, 0]]
    verts[1] = [[0, 0, 2], [1, 0, 2], [0, 1, 3]]
    verts[2] = [[5, 5, 5], [6, 5, 5], [5, 6, 5]]
    verts[3] = [[5, 5, 7], [6, 5, 7], [5, 6, 9]]
    aabbs = native.native_cluster_aabbs(verts, 2)
    assert aabbs.shape == (2, 6)
    np.testing.assert_allclose(aabbs[0], [0, 0, 0, 1, 1, 3])
    np.testing.assert_allclose(aabbs[1], [5, 5, 5, 6, 6, 9])


def test_native_png_roundtrip(tmp_path, lib):
    img = (np.arange(6 * 9 * 3).reshape(6, 9, 3) * 5 % 256).astype(np.uint8)
    data = native.native_png_encode(img)
    assert data is not None
    p = tmp_path / "n.png"
    p.write_bytes(data)
    np.testing.assert_array_equal(read_png(p), img)
