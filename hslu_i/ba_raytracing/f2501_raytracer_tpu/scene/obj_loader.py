"""OBJ/MTL mesh loader.

Reimplements the subset of `tobj` the reference relies on
(ref scene/scene.rs:43-134: triangulate + single_index load, per-mesh
material, Kd/illum/Pm/Ps material mapping) without any third-party
dependency. Faces are fan-triangulated; per-face normals are merged from the
vertex normals by the reference's asymmetric lerp chain
n1.lerp(n2, 0.5).lerp(n3, 0.5) (scene.rs:102-111) and NOT re-normalized.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..materials import Material, material_from_mtl
from .builder import Scene, Similarity3, TriangleData


def parse_mtl(path: str) -> Dict[str, dict]:
    """Parse a .mtl file into {name: {Kd, illum, Pm, Ps, ...}}."""
    materials: Dict[str, dict] = {}
    current: Optional[dict] = None
    with open(path, "r", errors="replace") as f:
        for raw in f:
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            key = parts[0]
            if key == "newmtl":
                current = {}
                materials[" ".join(parts[1:])] = current
            elif current is None:
                continue
            elif key == "Kd":
                current["Kd"] = tuple(float(x) for x in parts[1:4])
            elif key == "illum":
                current["illum"] = int(float(parts[1]))
            else:
                # unknown params (incl. Pm / Ps) kept verbatim like tobj
                current[key] = parts[1] if len(parts) == 2 else parts[1:]
    return materials


def load_obj_scene(
    path,
    transform: Optional[Similarity3] = None,
    continue_on_material_failure: bool = True,
) -> Scene:
    """ref scene/scene.rs:43-134."""
    path = os.fspath(path)
    positions: List[Tuple[float, float, float]] = []
    normals: List[Tuple[float, float, float]] = []
    mtl_by_name: Dict[str, dict] = {}
    faces: List[Tuple[List[Tuple[int, Optional[int]]], Optional[str]]] = []
    current_mtl: Optional[str] = None

    with open(path, "r", errors="replace") as f:
        for raw in f:
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            key = parts[0]
            if key == "v":
                positions.append(tuple(float(x) for x in parts[1:4]))
            elif key == "vn":
                normals.append(tuple(float(x) for x in parts[1:4]))
            elif key == "mtllib":
                mtl_path = os.path.join(os.path.dirname(path), " ".join(parts[1:]))
                try:
                    mtl_by_name.update(parse_mtl(mtl_path))
                except OSError:
                    if not continue_on_material_failure:
                        raise
            elif key == "usemtl":
                current_mtl = " ".join(parts[1:])
            elif key == "f":
                verts = []
                for spec in parts[1:]:
                    comps = spec.split("/")
                    vi = int(comps[0])
                    ni = None
                    if len(comps) >= 3 and comps[2] != "":
                        ni = int(comps[2])
                    verts.append((vi, ni))
                faces.append((verts, current_mtl))

    def resolve(idx: int, count: int) -> int:
        return idx - 1 if idx > 0 else count + idx

    materials: Dict[str, Material] = {
        name: material_from_mtl(m) for name, m in mtl_by_name.items()
    }

    scene = Scene()
    pos_arr = np.asarray(positions, dtype=np.float32)
    nrm_arr = np.asarray(normals, dtype=np.float32) if normals else None

    def xform_pos(p: np.ndarray) -> np.ndarray:
        return transform.transform_vec(p) if transform is not None else p

    def xform_nrm(n: np.ndarray) -> np.ndarray:
        return transform.rotate_vec(n) if transform is not None else n

    def lerp(a, b, t):
        return a + (b - a) * t

    for verts, mtl_name in faces:
        # fan triangulation (tobj LoadOptions::triangulate)
        for k in range(1, len(verts) - 1):
            tri = [verts[0], verts[k], verts[k + 1]]
            ps = []
            ns = []
            for vi, ni in tri:
                p = pos_arr[resolve(vi, len(positions))]
                ps.append(xform_pos(p))
                if ni is not None and nrm_arr is not None:
                    ns.append(xform_nrm(nrm_arr[resolve(ni, len(normals))]))
                else:
                    ns.append(None)
            # normal merge, ref scene.rs:102-111
            have = [n for n in ns if n is not None]
            if len(have) == 0:
                normal = None
            elif len(have) == 1:
                normal = have[0]
            elif len(have) == 2:
                normal = lerp(have[0], have[1], 0.5)
            else:
                normal = lerp(lerp(have[0], have[1], 0.5), have[2], 0.5)

            material = materials.get(mtl_name) if mtl_name else None
            if material is None:
                material = Material.diffuse((1.0, 1.0, 1.0))

            if normal is not None:
                t = TriangleData.with_material_and_normal(ps[0], ps[1], ps[2], normal, material)
            else:
                t = TriangleData.with_material(ps[0], ps[1], ps[2], material)
            scene.add_triangle(t)

    return scene
