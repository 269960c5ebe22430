"""Interpolation helpers for the escape-function mapping.

reference: src/interpolate.f90 -- tri/bi/linear interpolation plus the
cylindrical volume-weighted (tri) and area-weighted (bi) variants.  All are
vectorised over leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp


def linear_interpolate(x0, x1, v0, v1, x):
    """reference: interpolate.f90:71-90"""
    xd = (x - x0) / jnp.where(x1 != x0, x1 - x0, 1.0)
    return v0 * (1.0 - xd) + v1 * xd


def bilinear_interpolate(x0, x1, y0, y1, v00, v01, v10, v11, x, y):
    """v{ij} at (x_i, y_j) (reference: interpolate.f90:44-69)."""
    xd = (x - x0) / jnp.where(x1 != x0, x1 - x0, 1.0)
    yd = (y - y0) / jnp.where(y1 != y0, y1 - y0, 1.0)
    c0 = v00 * (1.0 - xd) + v10 * xd
    c1 = v01 * (1.0 - xd) + v11 * xd
    return c0 * (1.0 - yd) + c1 * yd


def trilinear_interpolate(x0, x1, y0, y1, z0, z1, v, x, y, z):
    """``v[i, j, k]`` at the 8 corners as ``v[..., 2, 2, 2]``
    (reference: interpolate.f90:11-42)."""
    xd = (x - x0) / jnp.where(x1 != x0, x1 - x0, 1.0)
    yd = (y - y0) / jnp.where(y1 != y0, y1 - y0, 1.0)
    zd = (z - z0) / jnp.where(z1 != z0, z1 - z0, 1.0)
    c00 = v[..., 0, 0, 0] * (1 - xd) + v[..., 1, 0, 0] * xd
    c01 = v[..., 0, 0, 1] * (1 - xd) + v[..., 1, 0, 1] * xd
    c10 = v[..., 0, 1, 0] * (1 - xd) + v[..., 1, 1, 0] * xd
    c11 = v[..., 0, 1, 1] * (1 - xd) + v[..., 1, 1, 1] * xd
    c0 = c00 * (1 - yd) + c10 * yd
    c1 = c01 * (1 - yd) + c11 * yd
    return c0 * (1 - zd) + c1 * zd


def cyl_bilinear_interpolate(r0, r1, t0, t1, v00, v01, v10, v11, r, t):
    """Area-weighted bilinear in (r, theta); v{ij} at (r_i, theta_j)
    (reference: interpolate.f90:140-177)."""
    area = 0.5 * (t1 - t0) * (r1**2 - r0**2)
    safe = jnp.where(area != 0.0, area, 1.0)
    a00 = 0.5 * (t1 - t) * (r1**2 - r**2)  # weight for low r, low t corner
    a01 = 0.5 * (t - t0) * (r1**2 - r**2)
    a10 = 0.5 * (t1 - t) * (r**2 - r0**2)
    a11 = 0.5 * (t - t0) * (r**2 - r0**2)
    return (a00 * v00 + a01 * v01 + a10 * v10 + a11 * v11) / safe


def cyl_trilinear_interpolate(r0, r1, t0, t1, z0, z1, v, r, t, z):
    """Volume-weighted trilinear in (r, theta, z); ``v[..., 2, 2, 2]``
    indexed [ri, ti, zi] (reference: interpolate.f90:92-138)."""
    vol = 0.5 * (t1 - t0) * (r1**2 - r0**2) * (z1 - z0)
    safe = jnp.where(vol != 0.0, vol, 1.0)
    a00 = 0.5 * (t1 - t) * (r1**2 - r**2)
    a01 = 0.5 * (t - t0) * (r1**2 - r**2)
    a10 = 0.5 * (t1 - t) * (r**2 - r0**2)
    a11 = 0.5 * (t - t0) * (r**2 - r0**2)
    out = (
        a00 * (z1 - z) * v[..., 0, 0, 0] + a00 * (z - z0) * v[..., 0, 0, 1]
        + a01 * (z1 - z) * v[..., 0, 1, 0] + a01 * (z - z0) * v[..., 0, 1, 1]
        + a10 * (z1 - z) * v[..., 1, 0, 0] + a10 * (z - z0) * v[..., 1, 0, 1]
        + a11 * (z1 - z) * v[..., 1, 1, 0] + a11 * (z - z0) * v[..., 1, 1, 1]
    )
    return out / safe
