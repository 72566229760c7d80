"""Scalar math helpers (misc.rs), batched.

quadratic() mirrors misc.rs:231-252 (numerically stable form); erf/erf_inv
mirror misc.rs:271-330 (the PBRT polynomial approximations) and are used by
the Beckmann visible-normal sampler.
"""

import jax.numpy as jnp


def clamp(x, lo, hi):
    return jnp.clip(x, lo, hi)


def lerp(t, a, b):
    return a * (1.0 - t) + b * t


def quadratic(a, b, c):
    """Solve a t^2 + b t + c = 0 (misc.rs:231-252).

    Returns (ok, t0, t1) with t0 <= t1; on no real root ok=False and
    t0/t1 are zeros (masked by callers).
    """
    discrim = b * b - 4.0 * a * c
    ok = discrim >= 0.0
    root = jnp.sqrt(jnp.maximum(discrim, 0.0))
    q = jnp.where(b < 0.0, -0.5 * (b - root), -0.5 * (b + root))
    safe_a = jnp.where(a == 0.0, 1.0, a)
    safe_q = jnp.where(q == 0.0, 1.0, q)
    t0 = q / safe_a
    t1 = c / safe_q
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    return ok, jnp.where(ok, lo, 0.0), jnp.where(ok, hi, 0.0)


def erf(x):
    """Polynomial erf approximation (misc.rs:301-330, A&S 7.1.26 style)."""
    a1 = 0.254829592
    a2 = -0.284496736
    a3 = 1.421413741
    a4 = -1.453152027
    a5 = 1.061405429
    p = 0.3275911
    sign = jnp.sign(x)
    x = jnp.abs(x)
    t = 1.0 / (1.0 + p * x)
    y = 1.0 - (((((a5 * t + a4) * t) + a3) * t + a2) * t + a1) * t * jnp.exp(-x * x)
    return sign * y


def erf_inv(x):
    """Inverse error function (misc.rs:271-299, Giles' approximation)."""
    x = jnp.clip(x, -0.99999, 0.99999)
    w = -jnp.log(jnp.maximum((1.0 - x) * (1.0 + x), 1e-30))
    w_small = w - 2.5
    p_small = 2.81022636e-08
    p_small = 3.43273939e-07 + p_small * w_small
    p_small = -3.5233877e-06 + p_small * w_small
    p_small = -4.39150654e-06 + p_small * w_small
    p_small = 0.00021858087 + p_small * w_small
    p_small = -0.00125372503 + p_small * w_small
    p_small = -0.00417768164 + p_small * w_small
    p_small = 0.246640727 + p_small * w_small
    p_small = 1.50140941 + p_small * w_small

    w_big = jnp.sqrt(jnp.maximum(w, 1e-30)) - 3.0
    p_big = -0.000200214257
    p_big = 0.000100950558 + p_big * w_big
    p_big = 0.00134934322 + p_big * w_big
    p_big = -0.00367342844 + p_big * w_big
    p_big = 0.00573950773 + p_big * w_big
    p_big = -0.0076224613 + p_big * w_big
    p_big = 0.00943887047 + p_big * w_big
    p_big = 1.00167406 + p_big * w_big
    p_big = 2.83297682 + p_big * w_big

    p = jnp.where(w < 5.0, p_small, p_big)
    return p * x


def next_float_up(x):
    """Bump to the next representable f32 (geometry epsilon walks)."""
    return jnp.nextafter(x, jnp.inf)


def next_float_down(x):
    return jnp.nextafter(x, -jnp.inf)
