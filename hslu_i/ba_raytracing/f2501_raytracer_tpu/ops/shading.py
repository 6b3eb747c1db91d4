"""Shading math: Fresnel, direct lighting, distance attenuation.

Ports the exact (quirky) formulas of the reference's shading pipeline —
these constants and asymmetries define the image and must not be "fixed":

* Schlick Fresnel with metallic-tinted F0, TIR forcing full reflection and
  the non-transmissive early-out F = metallic     (ref material.rs:467-525)
* ambient = material_color * 0.08                 (ref raytracer_renderer.rs:752-764)
* tanh-sigmoid light attenuation with the 0.95 constant (ref light.rs:261-300)
* diffuse multiplies the material color twice     (ref raytracer_renderer.rs:804-851)
* shadowed light color is *divided* by the occluder color filter
  (ref raytracer_renderer.rs:807-811)
* specular = (reflect(L, N)·V)^(max(shininess*512, 1)) — V pointing at the
  surface, not the halfway vector                 (ref raytracer_renderer.rs:818-833)
* node distance attenuation 1/(1+d+0.1d²)         (ref raytracer_renderer.rs:266-277)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..scene.device import DeviceScene
from .intersect import Hit, occlude_rays
from .vecmath import F32_EPSILON, dot, normalized, reflected


def attenuation_factor_based_on_distance(distance):
    """ref raytracer_renderer.rs:266-277."""
    d = jnp.abs(distance)
    return jnp.clip(1.0 / (1.0 + d + 0.1 * d * d), 0.0, 1.0)


def compute_fresnel(normal, view_dir, other_ior, color, metallic, ior, has_trans):
    """Schlick Fresnel (ref material.rs:467-525), per-lane scalar semantics.

    Returns (reflectance_rgb, transmittance_rgb = 1 - reflectance).
    Non-transmissive lanes take the early-exit branch: F = metallic.
    """
    is_reflective = metallic > 0.0
    n_dot_v = dot(normal, view_dir)
    cos_theta = jnp.abs(n_dot_v)
    is_inside = n_dot_v < 0.0
    eta_t = jnp.where(is_inside, ior / other_ior, other_ior / ior)
    sin2_t = eta_t * eta_t * (1.0 - cos_theta * cos_theta)
    is_tir = (has_trans & is_inside & (sin2_t > 1.0)) | is_reflective

    f0 = ((other_ior - ior) / (other_ior + ior)) ** 2
    f0_rgb = f0[..., None] + (color - f0[..., None]) * metallic[..., None]
    fresnel = f0_rgb + (1.0 - f0_rgb) * ((1.0 - cos_theta) ** 5)[..., None]

    reflected_amount = jnp.where(is_reflective[..., None], metallic[..., None], 1.0)
    f = jnp.where(is_tir[..., None], reflected_amount, fresnel)
    f = jnp.where(has_trans[..., None], f, metallic[..., None])
    return f, 1.0 - f


def calculate_lighting(
    scene: DeviceScene,
    cfg: RenderConfig,
    hit: Hit,
    view_dir,
    epsilon_distance: float,
):
    """Direct + specular lighting at a hit wavefront
    (ref raytracer_renderer.rs:731-874). Returns (direct_rgb, specular_rgb)."""
    valid = hit.valid
    material_color = hit.color
    R = hit.point.shape[0]

    # ambient: color (1,1,1) value-maximized is itself; intensity 0.08
    ambient = jnp.where(valid[:, None], material_color, 0.0) * jnp.float32(0.08)

    if cfg.use_pallas and not scene.streaming:
        from .intersect import _pad_rays
        from .pallas_kernels import pallas_light_shade

        args, _ = _pad_rays(
            (
                hit.point,
                hit.normal,
                view_dir,
                material_color,
                hit.shininess,
                valid.astype(jnp.float32),
            ),
            cfg.kernel_ray_tile,
        )
        direct, spec = pallas_light_shade(
            scene.light_pack,
            scene.sph_pack,
            scene.trb_pack,
            scene.tri_blk_pack,
            scene.tri_blk_aabb,
            *args,
            n_lights=scene.n_lights,
            eps_dist=float(epsilon_distance),
            n_trans_blocks=scene.n_trans_blocks,
            backface_culling=cfg.backface_culling,
            ray_tile=cfg.kernel_ray_tile,
            interpret=cfg.interpret,
            bigtri_trans_rows=scene.bigtri_trans_rows,
        )
        return ambient + direct[:R], spec[:R]

    has_specular = hit.shininess > 0.0
    spec_exponent = jnp.maximum(hit.shininess * 512.0, 1.0)

    # lights are processed C at a time with ONE occlusion launch per chunk
    # (R*C shadow rays, laid out light-major so each Pallas ray tile serves
    # one light — coherent directions keep the AABB cull effective)
    L = scene.light_pos.shape[0]
    C = max(1, min(L, (2**21) // max(R, 1)))

    light_color = jnp.zeros_like(hit.point)
    specular_color = jnp.zeros_like(hit.point)

    for start in range(0, L, C):
        end = min(start + C, L)  # static per-chunk size, no overlap
        c = end - start
        lpos = scene.light_pos[start:end]  # (c,3)
        lcolor = scene.light_color[start:end]
        lintensity = scene.light_intensity[start:end]

        light_to_point = lpos[:, None, :] - hit.point[None, :, :]  # (C,R,3)
        light_dir = normalized(light_to_point)
        shadow_origin = hit.point[None, :, :] + light_dir * epsilon_distance
        delta = lpos[:, None, :] - shadow_origin
        max_dist = jnp.sqrt(dot(delta, delta))  # (C,R)

        occluded, combined_opacity, color_filter = occlude_rays(
            scene,
            shadow_origin.reshape(-1, 3),
            light_dir.reshape(-1, 3),
            max_dist.reshape(-1),
            cfg.backface_culling,
            bool(cfg.use_pallas),
            cfg.interpret,
            cfg.kernel_ray_tile,
        )
        occluded = occluded.reshape(c, R)
        combined_opacity = combined_opacity.reshape(c, R)
        color_filter = color_filter.reshape(c, R, 3)

        can_reach = ~occluded & valid[None, :]

        # PointLight::calculate_contribution_at (light.rs:261-300)
        light_distance = jnp.sqrt(dot(light_to_point, light_to_point)) + F32_EPSILON
        cos_in = dot(light_to_point, hit.normal[None, :, :]) / light_distance
        angle_pos = cos_in > 0.0
        att = 0.95 * (F32_EPSILON + light_distance + light_distance * light_distance)
        att_sigmoid = (jnp.tanh(att) + 1.0) / 2.0
        contrib_intensity = jnp.where(
            angle_pos,
            cos_in * lintensity[:, None] * jnp.clip(att_sigmoid, 0.0, 1.0),
            0.0,
        )
        contrib_color = jnp.where(
            angle_pos[..., None],
            material_color[None, :, :] * lcolor[:, None, :],
            0.0,
        )  # (C,R,3)

        # shadow filter division quirk (raytracer_renderer.rs:807-811)
        light_color_simd = jnp.where(
            can_reach[..., None], contrib_color / color_filter, contrib_color
        )

        diffuse_factor = jnp.maximum(dot(hit.normal[None, :, :], light_dir), 0.0)

        spec_reflect = reflected(light_dir, hit.normal[None, :, :])
        spec = (
            jnp.maximum(dot(normalized(spec_reflect), view_dir[None, :, :]), 0.0)
            ** spec_exponent[None, :]
        )
        specular_factor = jnp.where(has_specular[None, :], spec, 0.0)

        opacity_sel = jnp.where(can_reach, combined_opacity, 1.0)
        light_factor = diffuse_factor * contrib_intensity * opacity_sel
        spec_factor = contrib_intensity * opacity_sel * specular_factor

        light_valid = (diffuse_factor > 0.0) & can_reach

        diffuse_contribution = (
            material_color[None, :, :] * light_color_simd * light_factor[..., None]
        )
        spec_contribution = lcolor[:, None, :] * spec_factor[..., None]

        light_color = light_color + jnp.sum(
            jnp.where((light_valid & valid[None, :])[..., None], diffuse_contribution, 0.0),
            axis=0,
        )
        specular_color = specular_color + jnp.sum(
            jnp.where(
                (light_valid & valid[None, :] & has_specular[None, :])[..., None],
                spec_contribution,
                0.0,
            ),
            axis=0,
        )

    return ambient + light_color, specular_color
