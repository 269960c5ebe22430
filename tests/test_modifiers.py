"""Modifier golden tests with independently derived values.

The reference only ever tests `bend` (test/SDF/test_SDF.f90 comments the
rest out).  Here every modifier gets: hand-derived golden distances
and/or containment checks against first-principles geometry, plus
gradient-consistency (|grad d| = 1) where the modifier provably preserves
the SDF metric (revolution of an exact child, onion, elongate, repeat
away from cell boundaries).  Twist/bend/displacement only bound the true
distance, so they get containment + k=0-identity checks instead."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsmcrt_tpu.optics.properties import mono
from rsmcrt_tpu.sdfs import scene as S

OPT = mono(0.0, 0.0, 0.0, 0.0)


def ev_many(spec, points):
    sc = S.build_scene([spec])
    pts = jnp.asarray(points, jnp.float32)
    return np.asarray(S.eval_scene(sc, pts)[..., 0])


def grad_norms(spec, points):
    sc = S.build_scene([spec])

    def f(p):
        return S.eval_scene(sc, p[None])[0, 0]

    g = jax.vmap(jax.grad(f))(jnp.asarray(points, jnp.float32))
    return np.asarray(jnp.linalg.norm(g, axis=-1))


def _rand_points(n, lo=-1.5, hi=1.5, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(lo, hi, (n, 3)).astype(np.float32)


def test_revolution_of_sphere_is_a_torus():
    # revolving a radius-0.25 sphere at offset o=1.0 sweeps a torus with
    # major radius 1 in the xz-plane and tube radius 0.25; the analytic
    # torus distance is |(|p_xz| - 1, p_y)| - 0.25 (first principles)
    spec = S.revolution(S.sphere(0.25, OPT, 1), 1.0)
    pts = _rand_points(200)
    got = ev_many(spec, pts)
    pxz = np.sqrt(pts[:, 0] ** 2 + pts[:, 2] ** 2)
    want = np.sqrt((pxz - 1.0) ** 2 + pts[:, 1] ** 2) - 0.25
    np.testing.assert_allclose(got, want, atol=1e-6)
    # exact SDF -> unit gradient away from the axis/center singularities
    ok = np.abs(want) > 0.05
    assert np.allclose(grad_norms(spec, pts[ok]), 1.0, atol=1e-3)


def test_extrude_golden():
    # child = unit-radius sphere, slab half-height h=0.3.  Hand-derived:
    #   p=(0.7,0,0.9):  w=(|p|-0.5, 0.6)=(0.640175, 0.6) both>0
    #                   d = hypot = 0.877396
    #   p=(0,0,0):      w=(-0.5,-0.3) -> d = max = -0.3
    #   p=(0.2,0,0.35): w=(|p|-0.5,0.05)=(-0.09689,0.05) -> d = 0.05
    spec = S.extrude(S.sphere(0.5, OPT, 1), 0.3)
    got = ev_many(spec, [[0.7, 0.0, 0.9], [0.0, 0.0, 0.0],
                         [0.2, 0.0, 0.35]])
    np.testing.assert_allclose(
        got, [0.877396, -0.3, 0.05], atol=1e-5)


def test_onion_is_a_shell():
    # onion(sphere r=0.5, t=0.1): shell between radii 0.4 and 0.6;
    # d = ||p| - 0.5| - 0.1 from first principles
    spec = S.onion(S.sphere(0.5, OPT, 1), 0.1)
    pts = _rand_points(200, -0.8, 0.8, seed=1)
    r = np.linalg.norm(pts, axis=-1)
    want = np.abs(r - 0.5) - 0.1
    np.testing.assert_allclose(ev_many(spec, pts), want, atol=1e-6)
    ok = np.logical_and(np.abs(want) > 0.02, r > 0.05)
    assert np.allclose(grad_norms(spec, pts[ok]), 1.0, atol=1e-3)


def test_twist_containment_and_identity():
    child = S.box([1.0, 0.2, 1.0], OPT, 1)  # half extents (.5,.1,.5)
    pts = _rand_points(100, -0.6, 0.6, seed=2)
    # k=0 twist is the identity
    np.testing.assert_allclose(
        ev_many(S.twist(child, 0.0), pts), ev_many(child, pts), atol=1e-6)
    # the twisted shape contains p iff R(k z) p_xy lies in the box slice:
    # map box points back through the inverse rotation
    k = 1.2
    spec = S.twist(child, k)
    # points whose forward-map lands inside/outside the box slice
    zs = np.array([0.45, 0.2, -0.4], np.float32)
    qx = np.array([0.45, -0.3, 0.1], np.float32)
    c, s = np.cos(k * zs), np.sin(k * zs)
    # eval computes q = (c x - s y, s x + c y, z); choose (x, y) so that
    # q = (qx, 0.05, z) (inside) by inverting the rotation
    x = c * qx + s * 0.05
    y = -s * qx + c * 0.05
    inside = np.stack([x, y, zs], axis=-1)
    assert np.all(ev_many(spec, inside) < 0.0)
    x2 = c * 0.8 + s * 0.0
    y2 = -s * 0.8 + c * 0.0
    outside = np.stack([x2, y2, zs], axis=-1)
    assert np.all(ev_many(spec, outside) > 0.0)


def test_bend_containment_and_identity():
    child = S.box([1.0, 0.2, 1.0], OPT, 1)
    pts = _rand_points(100, -0.6, 0.6, seed=3)
    np.testing.assert_allclose(
        ev_many(S.bend(child, 0.0), pts), ev_many(child, pts), atol=1e-6)
    # bend rotates xy by angle k*x: q = (c x - s y, s x + c y, z)
    k = 0.8
    spec = S.bend(child, k)
    xs = np.array([0.3, -0.2, 0.45], np.float32)
    c, s = np.cos(k * xs), np.sin(k * xs)
    # want q = (qx, 0.05, 0.1) inside: invert the rotation at angle k*x
    qx = np.array([0.3, -0.2, 0.45], np.float32)
    x = c * qx + s * 0.05
    y = -s * qx + c * 0.05
    inside = np.stack([x, y, np.full(3, 0.1, np.float32)], axis=-1)
    assert np.all(ev_many(spec, inside) < 0.0)
    qy = np.full(3, 0.5, np.float32)  # way outside the 0.1 half-width
    x2 = c * qx + s * qy
    y2 = -s * qx + c * qy
    outside = np.stack([x2, y2, np.full(3, 0.1, np.float32)], axis=-1)
    assert np.all(ev_many(spec, outside) > 0.0)


def test_elongate_golden():
    # elongate(sphere r=0.2, size=(0.3,0,0)): a capsule along x with
    # half-length 0.3 and radius 0.2 (first principles):
    #   (0.6,0,0): distance 0.1;  (0,0.15,0): -0.05;  (0.3,0,0): -0.2
    spec = S.elongate(S.sphere(0.2, OPT, 1), [0.3, 0.0, 0.0])
    got = ev_many(spec, [[0.6, 0.0, 0.0], [0.0, 0.15, 0.0],
                         [0.3, 0.0, 0.0]])
    np.testing.assert_allclose(got, [0.1, -0.05, -0.2], atol=1e-6)
    # exact SDF away from the elongation crease
    pts = _rand_points(200, -0.8, 0.8, seed=4)
    d = ev_many(spec, pts)
    ok = np.abs(d) > 0.05
    assert np.allclose(grad_norms(spec, pts[ok]), 1.0, atol=1e-3)


def test_displacement_golden():
    def f(p):
        return 0.05 * jnp.sin(10.0 * p[..., 0])

    spec = S.displacement(S.sphere(0.5, OPT, 1), f)
    pts = _rand_points(100, -0.8, 0.8, seed=5)
    want = (np.linalg.norm(pts, axis=-1) - 0.5
            + 0.05 * np.sin(10.0 * pts[:, 0]))
    np.testing.assert_allclose(ev_many(spec, pts), want, atol=1e-5)


def test_repeat_lattice():
    # finite repetition of a radius-0.1 sphere on a unit lattice clamped
    # to cells -1..1: inside cell (1,0,0) the distance is to the sphere
    # at (1,0,0); beyond the clamp the nearest sphere stays the edge one
    spec = S.repeat(S.sphere(0.1, OPT, 1), 1.0, -1.0, 1.0)
    got = ev_many(spec, [[1.0, 0.0, 0.0],      # center of edge sphere
                         [0.5, 0.0, 0.0],      # midway between spheres
                         [2.5, 0.0, 0.0],      # beyond clamp: 1.5 from
                                               # the (1,0,0) sphere
                         [0.0, 1.2, 0.0]])     # near (0,1,0) sphere
    np.testing.assert_allclose(
        got, [-0.1, 0.4, 1.4, 0.1], atol=1e-6)
    # exact SDF within the clamped region, away from cell boundaries
    pts = np.array([[0.2, 0.1, 0.0], [1.1, -0.2, 0.3],
                    [-0.8, 0.9, 1.1]], np.float32)
    assert np.allclose(grad_norms(spec, pts), 1.0, atol=1e-3)


@pytest.mark.slow
def test_onion_transport_matches_csg_shell():
    """Physics-level modifier check: transporting through an
    onion(sphere) shell matches the identical region built as CSG
    subtraction (both run the capped-march path)."""
    from rsmcrt_tpu.grid import cart_grid
    from rsmcrt_tpu.sources.sources import build_source
    from rsmcrt_tpu.transport.engine import TransportConfig, simulate

    opt = mono(5.0, 0.5, 0.0, 1.0)
    vac = mono(0.0, 0.0, 0.0, 1.0)
    shell_onion = [S.onion(S.sphere(0.5, opt, 1), 0.1),
                   S.box([2.0, 2.0, 2.0], vac, 2)]
    # model subtraction folds op(d_prev, d_next) = max(-d_prev, d_next):
    # shell = subtraction(inner 0.4, outer 0.6).  The model's optical
    # properties come from children[0], so the inner sphere carries the
    # shell optics (its interior is OUTSIDE the model and never used).
    shell_csg = [S.model([S.sphere(0.4, opt, 1),
                          S.sphere(0.6, opt, 1)], "subtraction"),
                 S.box([2.0, 2.0, 2.0], vac, 2)]

    grid = cart_grid(32, 32, 32, 1.0, 1.0, 1.0)
    src = build_source("point", position=[0.0, 0.0, 0.0])

    def run(prims):
        sc = S.build_scene(prims)
        cfg = TransportConfig(nphotons=4000, n_lanes=1024)
        t, _, launched, _ = simulate(sc, src, grid, jax.random.key(2),
                                     cfg)
        return (float(jnp.sum(t.jmean)) / int(launched),
                float(t.nscatt) / int(launched))

    j1, n1 = run(shell_onion)
    j2, n2 = run(shell_csg)
    assert abs(j1 - j2) / j1 < 0.05, (j1, j2)
    assert abs(n1 - n2) / max(n1, 1e-9) < 0.1, (n1, n2)
