"""Signed distance functions for the 10 reference primitives.

Pure, batched, differentiable distance functions (Inigo Quilez formulas, as
used by the reference: src/sdfs/sdfs.f90:494-736).  Each takes a position
batch ``p [..., 3]`` plus scalar/vector parameters and returns ``d [...]``.

These are deliberately *functions on arrays*, not objects: the scene layer
stacks their parameters into pytrees so the whole distance field is a single
traced program that XLA can fuse, and so every parameter is a differentiable
leaf for the inverse-MCRT path.
"""

from __future__ import annotations

import jax.numpy as jnp


def _length(v):
    return jnp.sqrt(jnp.sum(v * v, axis=-1))


def _length_safe(v):
    """``|v|`` with a finite gradient at v = 0 (where plain sqrt yields
    NaN).  Used where the zero vector is a *reachable* evaluation point --
    inside a box, on a cone axis -- so ``jax.grad`` of the SDF (surface
    normals, inverse shape gradients) stays finite.  The where-guard
    keeps the VALUE exact (a +tiny bias under the sqrt would perturb the
    distance by 1e-15 and flip ``maxloc`` layer ties in f64)."""
    s = jnp.sum(v * v, axis=-1)
    pos = s > 0.0
    return jnp.sqrt(jnp.where(pos, s, 1.0)) * pos.astype(s.dtype)


def _clamp(x, lo, hi):
    return jnp.clip(x, lo, hi)


def sd_sphere(p, radius):
    """reference: src/sdfs/sdfs.f90:494-508"""
    return _length(p) - radius


def sd_box(p, half_lengths):
    """``half_lengths`` are the box half extents (the reference stores
    0.5*lengths at init, src/sdfs/sdfs.f90:433-461, eval :510-525)."""
    q = jnp.abs(p) - half_lengths
    outside = _length_safe(jnp.maximum(q, 0.0))
    inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
    return outside + inside


def sd_torus(p, oradius, iradius):
    """reference: src/sdfs/sdfs.f90:527-542"""
    qx = _length(jnp.stack([p[..., 0], p[..., 2]], axis=-1)) - oradius
    q = jnp.stack([qx, p[..., 1]], axis=-1)
    return _length(q) - iradius


def sd_cylinder(p, a, b, radius):
    """Capped cylinder from ``a`` to ``b`` (reference: sdfs.f90:544-581)."""
    ba = b - a
    pa = p - a
    baba = jnp.sum(ba * ba, axis=-1)
    paba = jnp.sum(pa * ba, axis=-1)
    x = _length(pa * baba[..., None] - ba * paba[..., None]) - radius * baba
    y = jnp.abs(paba - baba * 0.5) - baba * 0.5
    x2 = x * x
    y2 = y * y * baba
    inside = jnp.logical_and(x < 0.0, y < 0.0)
    d_in = -jnp.minimum(x2, y2)
    d_out = jnp.where(x > 0.0, x2, 0.0) + jnp.where(y > 0.0, y2, 0.0)
    d = jnp.where(inside, d_in, d_out)
    return jnp.sign(d) * jnp.sqrt(jnp.abs(d)) / baba


def sd_triprism(p, h1, h2):
    """Triangular prism; h1 = height, h2 = length (sdfs.f90:583-597)."""
    q = jnp.abs(p)
    return jnp.maximum(
        q[..., 2] - h2,
        jnp.maximum(q[..., 0] * 0.866025 + p[..., 1] * 0.5, -p[..., 1]) - h1 * 0.5,
    )


def sd_segment(p, a, b):
    """2D segment with the reference's fixed 0.1 thickness
    (sdfs.f90:599-626)."""
    return sd_capsule(p, a, b, 0.1)


def sd_capsule(p, a, b, r):
    """reference: src/sdfs/sdfs.f90:628-648"""
    pa = p - a
    ba = b - a
    h = _clamp(
        jnp.sum(pa * ba, axis=-1) / jnp.sum(ba * ba, axis=-1), 0.0, 1.0
    )
    return _length(pa - ba * h[..., None]) - r


def sd_cone(p, a, b, ra, rb):
    """Capped cone, base centre ``a`` radius ``ra``, tip ``b`` radius ``rb``
    (reference: sdfs.f90:650-686)."""
    rba = rb - ra
    ba = b - a
    baba = jnp.sum(ba * ba, axis=-1)
    papa = jnp.sum((p - a) * (p - a), axis=-1)
    paba = jnp.sum((p - a) * ba, axis=-1) / baba
    x2 = papa - baba * paba**2
    x2p = x2 > 0.0
    # exact 0 on the axis with a finite gradient (see _length_safe)
    x = jnp.sqrt(jnp.where(x2p, x2, 1.0)) * x2p.astype(x2.dtype)
    cax = jnp.maximum(0.0, x - jnp.where(paba < 0.5, ra, rb))
    cay = jnp.abs(paba - 0.5) - 0.5
    k = rba**2 + baba
    f = _clamp((rba * (x - ra) + paba * baba) / k, 0.0, 1.0)
    cbx = x - ra - f * rba
    cby = paba - f
    s = jnp.where(jnp.logical_and(cbx < 0.0, cay < 0.0), -1.0, 1.0)
    return s * jnp.sqrt(
        jnp.minimum(cax**2 + baba * cay**2, cbx**2 + baba * cby**2)
    )


def sd_egg(p, r1, r2, h):
    """Moss egg (reference: sdfs.f90:688-718); r1 = base radius, r2 = top
    radius, h = y of top circle.  Note the reference takes 3D lengths (the
    z component participates), matching its use under ``revolution``."""
    px = jnp.abs(p[..., 0])
    py = p[..., 1]
    pz = p[..., 2]
    r = r1 - r2
    h_in = h + r
    el = (h_in**2 - r**2) / (2.0 * r)

    d_bottom = jnp.sqrt(px * px + py * py + pz * pz) - r1
    d_top = jnp.sqrt(px * px + (py - h_in) ** 2 + pz * pz) - (
        (r1 + el) - jnp.sqrt(h_in**2 + el**2)
    )
    d_side = jnp.sqrt((px + el) ** 2 + py * py + pz * pz) - (r1 + el)

    use_top = (py - h_in) * el > px * h_in
    d_upper = jnp.where(use_top, d_top, d_side)
    return jnp.where(py <= 0.0, d_bottom, d_upper)


def sd_plane(p, a):
    """Half space with (normalised) normal ``a`` (reference: sdfs.f90:720-735)."""
    return jnp.sum(p * a, axis=-1)
