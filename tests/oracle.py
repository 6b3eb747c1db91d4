"""Slow scalar reference oracle.

A literal, per-pixel recursive transcription of the reference renderer's
*scalar* path (LANES=1) used only in tests to validate the wavefront TPU
engine. Control flow mirrors /root/reference/src/renderer/raytracer_renderer.rs
(single_raytrace / calculate_lighting / calculate_reflection /
calculate_refractions), raytracing/raytracer.rs (cast_ray /
has_any_intersection), and the primitive intersections. Written against the
Rust behaviour, not the Rust text.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from hslu_i.ba_raytracing.f2501_raytracer_tpu.config import (
    DEFAULT_REFRACTION_INDEX,
    RenderConfig,
)
from hslu_i.ba_raytracing.f2501_raytracer_tpu.scene.builder import (
    Scene,
    SphereData,
    TriangleData,
)

F32_EPS = float(np.finfo(np.float32).eps)


def normalize(v):
    n = np.linalg.norm(v)
    return v / n if n > 0 else v * np.inf


def reflect(v, n):
    return v - 2.0 * np.dot(v, n) * n


def refract(i, n, eta):
    ndi = np.dot(n, i)
    k = 1.0 - eta * eta * (1.0 - ndi * ndi)
    if k < 0.0:
        return np.zeros(3)
    return i * eta - (eta * ndi + math.sqrt(k)) * n


@dataclass
class Hit:
    point: np.ndarray
    normal: np.ndarray
    distance: float
    material: object
    obj: object


def intersect_sphere(s: SphereData, o, d, backface: bool) -> Optional[Hit]:
    v = o - s.center
    b = 2.0 * np.dot(d, v)
    c = np.dot(v, v) - s.r_sq
    disc = b * b - 4.0 * c
    if disc < 0:
        return None
    sq = math.sqrt(disc)
    t0 = (-b - sq) / 2.0
    t1 = (-b + sq) / 2.0
    t0_valid, t1_valid = t0 >= 0.0, t1 >= 0.0
    use_t0 = t0_valid and ((not t1_valid) or t0 < t1)
    use_t1 = t1_valid and not use_t0
    if not (use_t0 or use_t1):
        return None
    t = t0 if use_t0 else t1
    p = o + d * t
    n = normalize(p - s.center)
    if backface:
        if not (np.dot(d, n) < 0.75 or s.material.transmission.mask):
            return None
    return Hit(p, n, t, s.material, s)


def intersect_triangle(tr: TriangleData, o, d, backface: bool) -> Optional[Hit]:
    if backface:
        if not (np.dot(d, tr.normal) < 0.75 or tr.material.transmission.mask):
            return None
    e1, e2 = tr.edge1, tr.edge2
    b = tr.vertex1 - o
    mat = np.stack([d, -e1, -e2], axis=1)
    det = np.linalg.det(mat)
    if abs(det) <= F32_EPS:
        return None
    tuv = np.linalg.solve(mat, b)
    t, u, v = tuv
    if t <= F32_EPS:
        return None
    if u < 0 or v < 0 or (u + v) >= 1.0:
        return None
    return Hit(o + d * t, tr.normal.astype(np.float64), t, tr.material, tr)


def cast_ray(objects, o, d) -> Optional[Hit]:
    d = normalize(d)
    nearest = None
    for obj in objects:
        if isinstance(obj, SphereData):
            h = intersect_sphere(obj, o, d, cast_ray.backface)
        else:
            h = intersect_triangle(obj, o, d, cast_ray.backface)
        if h is not None and (nearest is None or h.distance <= nearest.distance):
            nearest = h
    return nearest


cast_ray.backface = False


def compute_fresnel(material, normal, view_dir, other_ior):
    """material.rs:467-525, scalar. Returns (F_rgb, 1-F_rgb)."""
    color = np.asarray(material.color, dtype=np.float64)
    metallic = material.metallic
    is_reflective = metallic > 0.0
    if not material.transmission.mask:
        f = np.full(3, metallic)
        return f, 1.0 - f
    ior = material.transmission.refraction_index
    n_dot_v = np.dot(normal, view_dir)
    cos_theta = abs(n_dot_v)
    is_inside = n_dot_v < 0.0
    eta_t = (ior / other_ior) if is_inside else (other_ior / ior)
    sin2_t = eta_t * eta_t * (1.0 - cos_theta * cos_theta)
    is_tir = (is_inside and sin2_t > 1.0) or is_reflective
    f0 = ((other_ior - ior) / (other_ior + ior)) ** 2
    f0 = f0 + (color - f0) * metallic
    fres = f0 + (1.0 - f0) * (1.0 - cos_theta) ** 5
    reflected_amount = np.full(3, metallic) if is_reflective else np.ones(3)
    f = reflected_amount if is_tir else fres
    return f, 1.0 - f


def has_any_intersection(objects, o, d, max_distance):
    """raytracer.rs:24-106, scalar."""
    d = normalize(d)
    has = False
    occluded = False
    opacity = 1.0
    filt = np.ones(3)
    for obj in objects:
        if isinstance(obj, SphereData):
            h = intersect_sphere(obj, o, d, cast_ray.backface)
        else:
            h = intersect_triangle(obj, o, d, cast_ray.backface)
        if h is None:
            continue
        hit = h.distance <= max_distance
        m = h.material
        _, transmittance = compute_fresnel(m, h.normal, -d, 1.0)
        transmittance = transmittance if m.transmission.mask else np.zeros(3)
        op_val = m.transmission.opacity if m.transmission.mask else 0.0
        io = op_val * transmittance[0]
        if hit:
            opacity = min(max(opacity - (1.0 - io), 0.0), 1.0)
        iocc = hit and (not m.transmission.mask) and abs(opacity) <= F32_EPS
        has = has or hit
        if hit:
            occluded = occluded or iocc
        absorption = np.asarray(m.color) * (
            1.0
            - min(
                max(m.transmission.opacity if m.transmission.mask else 1.0, 0.0),
                1.0 - F32_EPS,
            )
        )
        if hit:
            filt = filt - absorption
        if occluded and has:
            break
    return has, occluded, opacity, filt


def attenuation(distance):
    d = abs(distance)
    return min(max(1.0 / (1.0 + d + 0.1 * d * d), 0.0), 1.0)


class OracleRenderer:
    def __init__(self, scene: Scene, cfg: RenderConfig, lights):
        """`lights` = preprocessed (cloud-expanded) [(pos, color, intensity)]."""
        self.cfg = cfg
        self.cam = cfg.camera
        self.objects = scene.scene_objects.get_all()
        self.lights = lights
        cast_ray.backface = cfg.backface_culling

    # single_raytrace (raytracer_renderer.rs:147-264)
    def single_raytrace(self, coords, direction, start_ior, depth):
        cfg = self.cfg
        if depth is not None and depth <= 0:
            return None
        hit = cast_ray(self.objects, coords, normalize(direction))
        if hit is None:
            return None
        view_dir = normalize(direction)
        direct, spec = self.calculate_lighting(hit, view_dir)
        f = attenuation(hit.distance)
        direct = direct * f
        spec = spec * f

        is_trans = hit.material.transmission.mask
        is_refl = hit.material.metallic > 0.0 or is_trans

        refl = np.zeros(3)
        if cfg.reflections and is_refl:
            refl = self.calculate_reflection(hit, view_dir, start_ior, depth)
        refr = np.zeros(3)
        if cfg.refractions and is_trans:
            refr = self.calculate_refractions(hit, view_dir, start_ior, depth)

        if is_trans:
            color = refl + refr + spec
        else:
            color = direct + refl + spec
        return color, True, hit

    # calculate_reflection (raytracer_renderer.rs:526-729)
    def calculate_reflection(self, hit, view_dir, start_ior, depth):
        cfg = self.cfg
        m = hit.material
        cos_theta = np.dot(view_dir, hit.normal)
        is_inside = cos_theta < 0.0
        inormal = -hit.normal if is_inside else hit.normal
        new_ior = (
            m.transmission.refraction_index if is_inside else DEFAULT_REFRACTION_INDEX
        )
        eta = (new_ior / start_ior) if is_inside else (start_ior / new_ior)
        cos_i = abs(cos_theta)
        sin2_t = eta * eta * (1.0 - cos_i * cos_i)
        tir = sin2_t >= 1.0
        reflective = m.metallic > 0.0 or (m.transmission.mask and tir)
        if not reflective:
            return np.zeros(3)
        refl_dir = normalize(reflect(view_dir, hit.normal))
        reflectance, _ = compute_fresnel(m, inormal, -view_dir, start_ior)
        child_depth = (
            max(depth - 1, 0) if depth is not None else self.cfg.reflection_max_depth
        )
        res = self.single_raytrace(
            hit.point + refl_dir * self.cam.epsilon_distance,
            refl_dir,
            start_ior,
            child_depth,
        )
        if res is None:
            return np.zeros(3)
        color, valid, child_hit = res
        if not valid:
            return np.zeros(3)
        return color * attenuation(child_hit.distance) * reflectance

    # calculate_refractions (raytracer_renderer.rs:279-524)
    def calculate_refractions(self, hit, view_dir, start_ior, depth):
        m = hit.material
        if not m.transmission.mask:
            return np.zeros(3)
        cos_theta = np.dot(view_dir, hit.normal)
        is_inside = cos_theta <= 0.0
        inormal = -hit.normal if is_inside else hit.normal
        new_ior = (
            m.transmission.refraction_index if is_inside else DEFAULT_REFRACTION_INDEX
        )
        eta = (new_ior / start_ior) if is_inside else (start_ior / new_ior)
        _, transmittance = compute_fresnel(m, inormal, view_dir, 1.0 / eta)
        refr_dir = normalize(refract(view_dir, -inormal, 1.0 / eta))

        op = m.transmission.opacity if m.transmission.mask else 0.0
        step = 2 if op < 0.5 else 1
        factor = 3 if op <= 0.3 else (2 if op < 0.5 else 1)
        child_depth = (
            max(depth - step, 0)
            if depth is not None
            else self.cfg.refraction_max_depth // factor
        )
        if not np.all(np.isfinite(refr_dir)):
            return np.zeros(3)
        res = self.single_raytrace(
            hit.point + refr_dir * self.cam.epsilon_distance,
            refr_dir,
            new_ior,
            child_depth,
        )
        if res is None:
            return np.zeros(3)
        color, valid, _ = res
        if not valid:
            return np.zeros(3)
        boost = (m.transmission.boost if m.transmission.mask else 0.0) + 1.0
        return color * boost * transmittance

    # calculate_lighting (raytracer_renderer.rs:731-874)
    def calculate_lighting(self, hit, view_dir):
        m = hit.material
        mcolor = np.asarray(m.color, dtype=np.float64)
        ambient = mcolor * 1.0 * 0.08
        light_color = np.zeros(3)
        spec_color = np.zeros(3)
        has_specular = m.shininess > 0.0
        for lpos, lcol, lint in self.lights:
            lpos = np.asarray(lpos, dtype=np.float64)
            lcol = np.asarray(lcol, dtype=np.float64)
            light_to_point = lpos - hit.point
            light_dir = normalize(light_to_point)
            shadow_origin = hit.point + light_dir * self.cam.epsilon_distance
            max_dist = np.linalg.norm(lpos - shadow_origin)
            has, occluded, comb_op, filt = has_any_intersection(
                self.objects, shadow_origin, light_dir, max_dist
            )
            can_reach = not occluded
            if not can_reach:
                continue
            # PointLight::calculate_contribution_at
            light_distance = np.linalg.norm(light_to_point) + F32_EPS
            cos_in = np.dot(light_to_point, hit.normal) / light_distance
            angle_pos = cos_in > 0.0
            att = 0.95 * (F32_EPS + light_distance + light_distance**2)
            att_sig = (math.tanh(att) + 1.0) / 2.0
            contrib_col = mcolor * lcol if angle_pos else np.zeros(3)
            contrib_int = (
                cos_in * lint * min(max(att_sig, 0.0), 1.0) if angle_pos else 0.0
            )
            light_color_s = contrib_col / filt if can_reach else contrib_col
            diffuse = max(np.dot(hit.normal, light_dir), 0.0)
            if has_specular:
                srefl = reflect(light_dir, hit.normal)
                spec = max(np.dot(normalize(srefl), view_dir), 0.0) ** max(
                    m.shininess * 512.0, 1.0
                )
            else:
                spec = 0.0
            opacity_sel = comb_op if can_reach else 1.0
            light_factor = diffuse * contrib_int * opacity_sel
            spec_factor = contrib_int * opacity_sel * spec
            light_valid = diffuse > 0.0 and can_reach
            if light_valid:
                light_color = light_color + mcolor * light_color_s * light_factor
                if has_specular:
                    spec_color = spec_color + lcol * spec_factor
        return ambient + light_color, spec_color

    def render(self) -> Tuple[np.ndarray, np.ndarray]:
        cfg = self.cfg
        H, W = cfg.height, cfg.width
        cam = self.cam
        img = np.zeros((H, W, 3))
        valid = np.zeros((H, W), bool)
        focus = np.asarray(cam.render_ray_focus)
        for py in range(H):
            for px in range(W):
                coords = np.array([px * cam.w2s_width, py * cam.w2s_height, 0.0])
                direction = coords - focus
                res = self.single_raytrace(
                    coords, direction, DEFAULT_REFRACTION_INDEX, None
                )
                if res is None:
                    continue
                color, v, _ = res
                if v:
                    img[py, px] = color
                    valid[py, px] = True
        return img.astype(np.float32), valid
