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
