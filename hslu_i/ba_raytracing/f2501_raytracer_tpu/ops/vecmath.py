"""Small 3D vector helpers over `(..., 3)` jnp arrays.

This replaces the reference's entire generic SIMD vector/matrix trait zoo
(ref: src/vector.rs, src/vector_traits.rs, src/matrix.rs, src/simd_compat.rs
— ~1,300 LoC): on TPU an N-wide masked vector is simply an array with a
leading ray axis, so only the handful of geometric operations remain.

Semantics match ultraviolet's Vec3 ops used by the reference:
`reflected` (vector.rs:306-312), `refracted` (vector.rs:335-341, GLSL
refract), `normalized`.
"""

from __future__ import annotations

import jax.numpy as jnp

F32_EPSILON = float(2.0**-23)  # approx::AbsDiffEq default epsilon for f32


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def mag(a):
    return jnp.sqrt(dot(a, a))


def normalized(a):
    """ultraviolet `normalized`: multiply by rsqrt(mag_sq); 0-vectors -> non-finite."""
    return a * jnp.reciprocal(jnp.sqrt(dot(a, a)))[..., None]


def reflected(v, n):
    """ultraviolet reflect: v - 2*(v.n)*n."""
    return v - (2.0 * dot(v, n))[..., None] * n


def refracted(i, n, eta):
    """GLSL-style refract (ultraviolet `refracted`).

    k = 1 - eta^2 (1 - (n.i)^2); returns 0-vector where k < 0 (the reference
    then normalizes it into NaN and the resulting ray never hits anything —
    callers should mask with the returned `valid`).
    """
    ndi = dot(n, i)
    k = 1.0 - eta * eta * (1.0 - ndi * ndi)
    k_pos = k >= 0.0
    k_safe = jnp.maximum(k, 0.0)
    out = i * eta[..., None] - (eta * ndi + jnp.sqrt(k_safe))[..., None] * n
    return jnp.where(k_pos[..., None], out, 0.0), k_pos


def lerp(a, b, t):
    return a + (b - a) * t


import dataclasses as _dataclasses

import jax as _jax


@_jax.tree_util.register_dataclass
@_dataclasses.dataclass(frozen=True)
class Ray:
    """Wavefront ray record (ref geometry/ray.rs:9-18): origins, normalized
    directions, the refraction index of the current medium, and per-ray
    validity. The invalid-lane sentinel is +inf (ray.rs:77-94)."""

    origin: _jax.Array  # (R, 3)
    direction: _jax.Array  # (R, 3), normalized on construction
    refraction_index: _jax.Array  # (R,)
    valid_mask: _jax.Array  # (R,) bool

    @classmethod
    def new(cls, origin, direction, refraction_index, valid_mask=None):
        import jax.numpy as jnp

        direction = normalized(direction)
        if valid_mask is None:
            valid_mask = jnp.ones(origin.shape[:-1], bool)
        return cls(origin, direction, refraction_index, valid_mask)

    def at(self, t):
        """dir*t + origin (ray.rs:60-66)."""
        return self.direction * t[..., None] + self.origin

    @staticmethod
    def invalid_value():
        return float("inf")
