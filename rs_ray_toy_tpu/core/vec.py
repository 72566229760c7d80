"""Batched 3-vector helpers over trailing-dim-(3,) arrays.

The reference defines Point3/Vector3/Normal3 scalar structs
(geometry.rs:23-71); here everything is SoA: an array of N points is a
`(N, 3)` jnp array and all ops broadcast.  These helpers run both under jit
on device and eagerly on numpy arrays (jnp ops accept numpy inputs).
"""

import jax.numpy as jnp


def dot(a, b):
    """Batched dot product over the trailing axis (geometry.rs dot3)."""
    return jnp.sum(a * b, axis=-1)


def absdot(a, b):
    return jnp.abs(dot(a, b))


def cross(a, b):
    return jnp.cross(a, b)


def length_squared(v):
    return jnp.sum(v * v, axis=-1)


def length(v):
    return jnp.sqrt(length_squared(v))


def normalize(v):
    """Normalize; returns v/|v| (caller guards |v|=0 like the reference)."""
    return v / jnp.maximum(length(v), 1e-30)[..., None]


def faceforward(n, v):
    """Flip n to lie in the hemisphere of v (geometry.rs:1381)."""
    s = jnp.where(dot(n, v) < 0.0, -1.0, 1.0)
    return n * s[..., None]


def coordinate_system(v1):
    """Build an orthonormal basis around unit v1 (geometry.rs
    vec3_coordinate_system): branch on |x|>|y| like the reference so the
    basis matches bit-for-bit in the non-degenerate case."""
    x, y, z = v1[..., 0], v1[..., 1], v1[..., 2]
    use_x = jnp.abs(x) > jnp.abs(y)
    inv_a = 1.0 / jnp.sqrt(jnp.where(use_x, x * x + z * z, y * y + z * z))
    v2 = jnp.where(
        use_x[..., None],
        jnp.stack([-z, jnp.zeros_like(x), x], axis=-1) * inv_a[..., None],
        jnp.stack([jnp.zeros_like(x), z, -y], axis=-1) * inv_a[..., None],
    )
    v3 = cross(v1, v2)
    return v2, v3


def spherical_direction(sin_theta, cos_theta, phi):
    """(geometry.rs:1164)"""
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def reflect(wo, n):
    """Mirror wo about n (reflection.rs:115-117)."""
    return -wo + 2.0 * dot(wo, n)[..., None] * n


def refract(wi, n, eta):
    """Snell refraction (reflection.rs:122-134).

    Returns (wt, ok) where ok=False marks total internal reflection.
    wi points away from the surface, n is on the same side as wi.
    """
    cos_theta_i = dot(n, wi)
    sin2_theta_i = jnp.maximum(0.0, 1.0 - cos_theta_i * cos_theta_i)
    sin2_theta_t = eta * eta * sin2_theta_i
    ok = sin2_theta_t < 1.0
    cos_theta_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_theta_t))
    eta_b = jnp.broadcast_to(jnp.asarray(eta), cos_theta_i.shape)
    wt = -wi * eta_b[..., None] + n * (eta_b * cos_theta_i - cos_theta_t)[..., None]
    return wt, ok


def lerp(t, a, b):
    return a * (1.0 - t) + b * t


def distance(a, b):
    return length(a - b)
