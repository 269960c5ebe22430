"""Analytic ray-surface intersection for the standard primitives.

TPU-first replacement for sphere-trace *creep*: the reference finds the next
surface by repeated conservative SDF steps (reference: src/inttau2.f90:155-192)
which converges linearly with factor ``1 - sin(theta)`` -- grazing rays need
hundreds of iterations, and rays that pass near a surface without crossing it
creep anyway.  For rigid-transformed primitives the first surface crossing
along a ray has a closed form, so the transport engine can jump the whole
segment in one step and land ``eps/2`` before the true crossing (or take the
full optical-depth step when the ray never crosses anything).

The physics is identical -- tracing is only a means of finding the next
surface along the ray (same role as the reference's analytic detector
intersectors, src/geometryMod.f90).

Primitives without a practical closed form (torus quartic, egg, triprism,
every modifier and CSG model) are *non-analytic*: the engine falls back to
capped sphere-trace marching for those, still bounded by the analytic
crossings of the other prims.

Assumes rigid transforms (rotation + translation), the same assumption the
SDF metric itself requires (distances are not preserved under scaling).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..maths.transforms import apply_rotation, apply_transform

_INF = jnp.inf

# prim kinds with closed-form ray crossings; everything else (torus/egg/
# triprism quartics, all modifiers, CSG models) falls back to sphere-trace
# marching
ANALYTIC_KINDS = ("sphere", "box", "plane", "cylinder", "capsule",
                  "segment", "cone")


def _first_pos(*ts):
    """Elementwise smallest strictly-positive among candidates (inf if none).
    Invalid candidates must already be +inf."""
    out = None
    for t in ts:
        t = jnp.where(t > 0.0, t, _INF)
        out = t if out is None else jnp.minimum(out, t)
    return out


def ray_sphere(p, d, radius):
    """First crossing of ``|p + t d| = radius`` (both sides)."""
    b = jnp.sum(p * d, axis=-1)
    c = jnp.sum(p * p, axis=-1) - radius * radius
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 1e-30))
    t1 = -b - sq
    t2 = -b + sq
    miss = disc < 0.0
    return jnp.where(miss, _INF, _first_pos(t1, t2))


def ray_box(p, d, half_lengths):
    """Slab method; first crossing of the box surface from either side."""
    safe_d = jnp.where(d == 0.0, 1.0, d)
    ta = (-half_lengths - p) / safe_d
    tb = (half_lengths - p) / safe_d
    # d == 0 on an axis: inside that slab -> (-inf, inf); outside -> empty
    inside_slab = jnp.abs(p) <= half_lengths
    lo = jnp.where(d == 0.0, jnp.where(inside_slab, -_INF, _INF),
                   jnp.minimum(ta, tb))
    hi = jnp.where(d == 0.0, jnp.where(inside_slab, _INF, -_INF),
                   jnp.maximum(ta, tb))
    tn = jnp.max(lo, axis=-1)
    tf = jnp.min(hi, axis=-1)
    miss = tn > tf
    return jnp.where(miss, _INF, _first_pos(tn, tf))


def ray_plane(p, d, a):
    """Crossing of the half-space boundary ``a . x = 0``."""
    dn = jnp.sum(d * a, axis=-1)
    s = jnp.sum(p * a, axis=-1)
    t = -s / jnp.where(dn == 0.0, 1.0, dn)
    return jnp.where(dn == 0.0, _INF, _first_pos(t))


def _axis_decomp(p, d, a, b):
    """Shared cylinder/capsule machinery: axial parameter u in [0, 1] and
    the radial quadratic coefficients."""
    ba = b - a
    m = p - a
    baba = jnp.sum(ba * ba, axis=-1)
    safe = jnp.where(baba == 0.0, 1.0, baba)
    u_m = jnp.sum(m * ba, axis=-1) / safe  # axial coord of ray origin
    u_d = jnp.sum(d * ba, axis=-1) / safe  # axial rate along ray
    mp = m - ba * u_m[..., None]
    dp = d - ba * u_d[..., None]
    A = jnp.sum(dp * dp, axis=-1)
    B = jnp.sum(mp * dp, axis=-1)
    return ba, m, baba, u_m, u_d, mp, dp, A, B


def _side_roots(A, B, C):
    disc = B * B - A * C
    safeA = jnp.where(A == 0.0, 1.0, A)
    sq = jnp.sqrt(jnp.maximum(disc, 1e-30))
    t1 = (-B - sq) / safeA
    t2 = (-B + sq) / safeA
    bad = jnp.logical_or(disc < 0.0, A == 0.0)
    t1 = jnp.where(bad, _INF, t1)
    t2 = jnp.where(bad, _INF, t2)
    # degenerate linear case (cone slant-parallel rays): A=0, B!=0
    lin = jnp.logical_and(A == 0.0, B != 0.0)
    t_lin = -C / jnp.where(B == 0.0, 1.0, 2.0 * B)
    return jnp.where(lin, t_lin, t1), t2


def ray_cylinder(p, d, a, b, radius):
    """Capped cylinder from ``a`` to ``b`` (reference sd_cylinder,
    src/sdfs/sdfs.f90:544)."""
    ba, m, baba, u_m, u_d, mp, dp, A, B = _axis_decomp(p, d, a, b)
    C = jnp.sum(mp * mp, axis=-1) - radius * radius
    t1, t2 = _side_roots(A, B, C)

    def side_ok(t):
        u = u_m + t * u_d
        return jnp.where(jnp.logical_and(u >= 0.0, u <= 1.0), t, _INF)

    def cap(u_target):
        safe = jnp.where(u_d == 0.0, 1.0, u_d)
        t = (u_target - u_m) / safe
        q = mp + dp * t[..., None]  # radial vector at the cap plane
        rr = jnp.sum(q * q, axis=-1)
        ok = jnp.logical_and(u_d != 0.0, rr <= radius * radius)
        return jnp.where(ok, t, _INF)

    return _first_pos(side_ok(t1), side_ok(t2), cap(0.0), cap(1.0))


def ray_capsule(p, d, a, b, r):
    """Capsule from ``a`` to ``b`` radius ``r`` (reference sd_capsule,
    src/sdfs/sdfs.f90:628)."""
    ba, m, baba, u_m, u_d, mp, dp, A, B = _axis_decomp(p, d, a, b)
    C = jnp.sum(mp * mp, axis=-1) - r * r
    t1, t2 = _side_roots(A, B, C)

    def side_ok(t):
        u = u_m + t * u_d
        return jnp.where(jnp.logical_and(u >= 0.0, u <= 1.0), t, _INF)

    def cap_sphere(center, beyond_hi):
        # BOTH sphere roots must be tested individually: a ray from inside
        # the capsule exiting axially has its first root inside the
        # cylindrical span (not capsule surface) and its true cap exit at
        # the second root
        pc = p - center
        bq = jnp.sum(pc * d, axis=-1)
        cq = jnp.sum(pc * pc, axis=-1) - r * r
        disc = bq * bq - cq
        sq = jnp.sqrt(jnp.maximum(disc, 1e-30))
        miss = disc < 0.0

        def ok(t):
            u = u_m + t * u_d
            on_cap = jnp.where(beyond_hi, u > 1.0, u < 0.0)
            return jnp.where(jnp.logical_or(miss,
                                            jnp.logical_not(on_cap)),
                             _INF, t)

        return ok(-bq - sq), ok(-bq + sq)

    ca1, ca2 = cap_sphere(a, False)
    cb1, cb2 = cap_sphere(b, True)
    return _first_pos(side_ok(t1), side_ok(t2), ca1, ca2, cb1, cb2)


def ray_cone(p, d, a, b, ra, rb):
    """Capped cone, radius ``ra`` at ``a`` linearly to ``rb`` at ``b``
    (reference sd_cone, src/sdfs/sdfs.f90:650).  Lateral sheet:
    ``|radial(t)| = ra + (rb-ra) u(t)`` -> a quadratic in t."""
    ba, m, baba, u_m, u_d, mp, dp, A, B = _axis_decomp(p, d, a, b)
    rba = rb - ra
    c0 = ra + rba * u_m
    c1 = rba * u_d
    qa = A - c1 * c1
    qb = B - c0 * c1
    qc = jnp.sum(mp * mp, axis=-1) - c0 * c0
    t1, t2 = _side_roots(qa, qb, qc)

    def side_ok(t):
        u = u_m + t * u_d
        ok = jnp.logical_and(
            jnp.logical_and(u >= 0.0, u <= 1.0),
            c0 + c1 * t >= 0.0,  # same nappe of the cone
        )
        return jnp.where(ok, t, _INF)

    def cap(u_target, radius):
        safe = jnp.where(u_d == 0.0, 1.0, u_d)
        t = (u_target - u_m) / safe
        q = mp + dp * t[..., None]
        rr = jnp.sum(q * q, axis=-1)
        ok = jnp.logical_and(u_d != 0.0, rr <= radius * radius)
        return jnp.where(ok, t, _INF)

    return _first_pos(side_ok(t1), side_ok(t2), cap(0.0, ra), cap(1.0, rb))


def _ray_prim(spec, params, pos, dirn):
    T = params["transform"]
    p = apply_transform(T, pos)
    d = apply_rotation(T, dirn)
    kind = spec.kind
    if kind == "sphere":
        return ray_sphere(p, d, params["radius"])
    if kind == "box":
        return ray_box(p, d, params["half_lengths"])
    if kind == "plane":
        return ray_plane(p, d, params["a"])
    if kind == "cylinder":
        return ray_cylinder(p, d, params["a"], params["b"], params["radius"])
    if kind == "capsule":
        return ray_capsule(p, d, params["a"], params["b"], params["r"])
    if kind == "segment":
        # fixed 0.1 thickness capsule (reference sdfs.f90:624)
        return ray_capsule(p, d, params["a"], params["b"],
                           jnp.asarray(0.1, pos.dtype))
    if kind == "cone":
        return ray_cone(p, d, params["a"], params["b"], params["ra"],
                        params["rb"])
    raise ValueError(f"no analytic raycast for {kind!r}")


def analytic_column_mask(scene) -> tuple:
    """Static per-prim (user order) bool: has closed-form crossing."""
    mask = [False] * scene.n_prims
    col = 0
    for spec, size in zip(scene.specs, scene.group_sizes):
        ok = spec.kind in ANALYTIC_KINDS
        for _ in range(size):
            mask[col] = ok
            col += 1
    # mask is in concatenated-group order; convert to user order via perm
    user = [False] * scene.n_prims
    for user_idx, c in enumerate(scene.perm):
        user[user_idx] = mask[c]
    return tuple(user)


def ray_bound(scene, pos, dirn):
    """Smallest positive crossing parameter over all *analytic* prims:
    ``pos [..., 3], dirn [..., 3] -> t [...]`` (+inf when none cross)."""
    best = None
    for spec, params, size in zip(scene.specs, scene.group_params,
                                  scene.group_sizes):
        if spec.kind not in ANALYTIC_KINDS:
            continue
        if size == 1:
            single = jax.tree_util.tree_map(lambda a: a[0], params)
            t = _ray_prim(spec, single, pos, dirn)
        else:
            ts = jax.vmap(
                lambda prm: _ray_prim(spec, prm, pos, dirn), in_axes=0,
                out_axes=-1,
            )(params)
            t = jnp.min(ts, axis=-1)
        best = t if best is None else jnp.minimum(best, t)
    if best is None:
        return jnp.full(pos.shape[:-1], _INF, pos.dtype)
    return best


def ray_bound_idx(scene, pos, dirn):
    """Like :func:`ray_bound` but also returns WHICH analytic prim owns the
    first crossing: ``(t [...], idx [...] int32)`` with ``idx`` in
    concatenated-group order (the order :func:`surface_normal` consumes).
    ``idx`` is 0 when nothing crosses (t = +inf)."""
    best = jnp.full(pos.shape[:-1], _INF, pos.dtype)
    bidx = jnp.zeros(pos.shape[:-1], jnp.int32)
    offset = 0
    for spec, params, size in zip(scene.specs, scene.group_params,
                                  scene.group_sizes):
        if spec.kind not in ANALYTIC_KINDS:
            offset += size
            continue
        if size == 1:
            single = jax.tree_util.tree_map(lambda a: a[0], params)
            t = _ray_prim(spec, single, pos, dirn)
            cand = jnp.full(pos.shape[:-1], offset, jnp.int32)
        else:
            ts = jax.vmap(
                lambda prm: _ray_prim(spec, prm, pos, dirn), in_axes=0,
                out_axes=-1,
            )(params)
            t = jnp.min(ts, axis=-1)
            cand = (offset + jnp.argmin(ts, axis=-1)).astype(jnp.int32)
        better = t < best
        best = jnp.where(better, t, best)
        bidx = jnp.where(better, cand, bidx)
        offset += size
    return best, bidx


def surface_normal(scene, pos, idx):
    """Exact outward-ish unit surface normal of the analytic prim ``idx``
    (concatenated-group order, from :func:`ray_bound_idx`) at world points
    ``pos [B, 3]`` -- the gradient of that prim's world-space SDF via
    ``jax.grad`` (exact where the reference uses a tetrahedron finite
    difference, src/sdfs/sdf_base.f90:166-190; sign conventions match
    since both are SDF gradients)."""
    from .scene import eval_spec

    out = jnp.zeros_like(pos)
    offset = 0
    for spec, params, size in zip(scene.specs, scene.group_params,
                                  scene.group_sizes):
        if spec.kind not in ANALYTIC_KINDS:
            offset += size
            continue
        def f(p, prm_single, spec=spec):
            return eval_spec(spec, prm_single, p)

        if size == 1:
            single = jax.tree_util.tree_map(lambda a: a[0], params)
            n = jax.vmap(jax.grad(f), in_axes=(0, None))(pos, single)
        else:
            member = jnp.clip(idx - offset, 0, size - 1)
            prm = jax.tree_util.tree_map(lambda a: a[member], params)
            n = jax.vmap(jax.grad(f))(pos, prm)
        # +1e-30: finite vjp at degenerate (zero-gradient) points
        norm = jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True) + 1e-30)
        n = n / norm
        sel = jnp.logical_and(idx >= offset, idx < offset + size)
        out = jnp.where(sel[..., None], n, out)
        offset += size
    return out
