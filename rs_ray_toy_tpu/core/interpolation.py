"""Catmull-Rom spline machinery (interpolation.rs:4-198).

Host-side (numpy, f64): these routines build and invert the
photon-beam-diffusion BSSRDF tables (bsdf/bssrdf_table.py) at scene-load
time; nothing here runs per-ray on device.  The reference's
TabulatedBSSRDF is never constructed by its scene loader (only
DisneyBSSRDF is wired, disney.rs:374), so this is table-construction
parity, kept exact to interpolation.rs semantics.
"""

import numpy as np


def find_interval(size, pred):
    """(misc.rs find_interval): largest index i in [0, size-2] with
    pred(i) true, clamped — binary search over a monotone predicate."""
    first, length = 0, size
    while length > 0:
        half = length >> 1
        middle = first + half
        if pred(middle):
            first = middle + 1
            length -= half + 1
        else:
            length = half
    return int(np.clip(first - 1, 0, size - 2))


def catmull_rom_weights(nodes, x):
    """(interpolation.rs:116-163): node weights of the not-a-knot
    Catmull-Rom interpolant at x.

    Returns (ok, offset, w) with w a length-4 array; contributions are
    values[offset+i] * w[i] (indices outside [0,n) always carry w=0).
    """
    nodes = np.asarray(nodes, np.float64)
    if not (nodes[0] <= x <= nodes[-1]):
        return False, 0, np.zeros(4)
    idx = find_interval(len(nodes), lambda i: nodes[i] <= x)
    offset = idx - 1
    x0, x1 = nodes[idx], nodes[idx + 1]
    t = (x - x0) / (x1 - x0)
    t2, t3 = t * t, t * t * t
    w = np.zeros(4)
    w[1] = 2.0 * t3 - 3.0 * t2 + 1.0
    w[2] = -2.0 * t3 + 3.0 * t2
    if idx > 0:
        w0 = (t3 - 2.0 * t2 + t) * (x1 - x0) / (x1 - nodes[idx - 1])
        w[0] = -w0
        w[2] += w0
    else:
        w0 = t3 - 2.0 * t2 + t
        w[0] = 0.0
        w[1] -= w0
        w[2] += w0
    if idx + 2 < len(nodes):
        w3 = (t3 - t2) * (x1 - x0) / (nodes[idx + 2] - x0)
        w[1] -= w3
        w[3] = w3
    else:
        w3 = t3 - t2
        w[1] -= w3
        w[2] += w3
        w[3] = 0.0
    return True, offset, w


def integrate_catmull_rom(x, values, offset, cdf):
    """(interpolation.rs:164-198): definite integral of the spline over
    [x[0], x[-1]], filling the running CDF into cdf[offset:offset+n].
    Returns the total."""
    x = np.asarray(x, np.float64)
    n = len(x)
    total = 0.0
    cdf[offset] = 0.0
    for i in range(n - 1):
        x0, x1 = x[i], x[i + 1]
        f0, f1 = values[offset + i], values[offset + i + 1]
        width = x1 - x0
        if i > 0:
            d0 = width * (f1 - values[offset + i - 1]) / (x1 - x[i - 1])
        else:
            d0 = f1 - f0
        if i + 2 < n:
            d1 = width * (values[offset + i + 2] - f0) / (x[i + 2] - x0)
        else:
            d1 = f1 - f0
        total += ((d0 - d1) * (1.0 / 12.0) + (f0 + f1) * 0.5) * width
        cdf[offset + i + 1] = total
    return total


def sample_catmull_rom_2d(nodes1, nodes2, values, cdf, alpha, u):
    """(interpolation.rs:4-114): sample the 1D spline r -> f(alpha, r)
    (alpha-interpolated between table rows) proportional to its value.

    values/cdf: flattened (len(nodes1), len(nodes2)) tables.
    Returns (sample, fval, pdf); (0, 0, 0) when alpha is out of bounds.
    """
    nodes2 = np.asarray(nodes2, np.float64)
    size2 = len(nodes2)
    ok, offset, weights = catmull_rom_weights(nodes1, alpha)
    if not ok:
        return 0.0, 0.0, 0.0

    def interpolate(array, idx):
        v = 0.0
        for i in range(4):
            if weights[i] != 0.0:
                v += array[(offset + i) * size2 + idx] * weights[i]
        return v

    maximum = interpolate(cdf, size2 - 1)
    if maximum <= 0.0:
        return 0.0, 0.0, 0.0
    u = u * maximum
    idx = find_interval(size2, lambda i: interpolate(cdf, i) <= u)
    f0 = interpolate(values, idx)
    f1 = interpolate(values, idx + 1)
    x0, x1 = nodes2[idx], nodes2[idx + 1]
    width = x1 - x0
    u = (u - interpolate(cdf, idx)) / width
    if idx > 0:
        d0 = width * (f1 - interpolate(values, idx - 1)) / (x1 - nodes2[idx - 1])
    else:
        d0 = f1 - f0
    if idx + 2 < size2:
        d1 = width * (interpolate(values, idx + 2) - f0) / (nodes2[idx + 2] - x0)
    else:
        d1 = f1 - f0

    # invert the definite integral over the segment: bisection + Newton
    t = (
        (f0 - np.sqrt(max(0.0, f0 * f0 + 2.0 * u * (f1 - f0)))) / (f0 - f1)
        if f0 != f1
        else u / f0
    )
    a, b = 0.0, 1.0
    while True:
        if not (a <= t <= b):
            t = 0.5 * (a + b)
        big_f = t * (
            f0
            + t
            * (
                0.5 * d0
                + t
                * (
                    (1.0 / 3.0) * (-2.0 * d0 - d1)
                    + f1
                    - f0
                    + t * (0.25 * (d0 + d1) + 0.5 * (f0 - f1))
                )
            )
        )
        f_hat = f0 + t * (
            d0 + t * (-2.0 * d0 - d1 + 3.0 * (f1 - f0) + t * (d0 + d1 + 2.0 * (f0 - f1)))
        )
        if abs(big_f - u) < 1e-6 or b - a < 1e-6:
            break
        if big_f - u < 0.0:
            a = t
        else:
            b = t
        t -= (big_f - u) / f_hat
    return x0 + width * t, f_hat, f_hat / maximum
