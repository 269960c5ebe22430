"""SDF golden tests, values mirrored from reference test/SDF/test_SDF.f90."""

import numpy as np
import jax.numpy as jnp

from rsmcrt_tpu.optics.properties import mono
from rsmcrt_tpu.sdfs import scene as S

OPT = mono(0.0, 0.0, 0.0, 0.0)


def ev(spec, pos):
    sc = S.build_scene([spec])
    return float(S.eval_scene(sc, jnp.asarray(pos, jnp.float32))[..., 0])


def ev_many(spec, points):
    sc = S.build_scene([spec])
    pts = jnp.asarray(points, jnp.float32)
    return np.asarray(S.eval_scene(sc, pts)[..., 0])


def test_sphere():
    sph = S.sphere(1.0, OPT, 1)
    surface = [
        [0, 1, 0], [0, 0, 1], [1, 0, 0], [0, -1, 0], [0, 0, -1], [-1, 0, 0],
        [np.sqrt(1 / 3)] * 3,
    ]
    assert ev(sph, [0.0, 0.0, 0.0]) == -1.0
    assert np.allclose(ev_many(sph, surface), 0.0, atol=1e-6)


def test_box():
    bx = S.box([2.0, 2.0, 2.0], OPT, 1)
    assert ev(bx, [0.0, 0.0, 0.0]) == -1.0
    surface = [
        [0, 1, 0], [0, 0, 1], [1, 0, 0], [0, -1, 0], [0, 0, -1], [-1, 0, 0],
        [1, 1, 1],
    ]
    assert np.allclose(ev_many(bx, surface), 0.0, atol=1e-6)


def test_cylinder():
    cyl = S.cylinder([0, 0, -1.0], [0, 0, 1.0], 1.0, OPT, 1)
    assert np.isclose(ev(cyl, [0.0, 0.0, 0.0]), -1.0, atol=1e-6)
    s = np.sqrt(0.5)
    surface = [
        [0, 1, 0], [0, 0, 1], [1, 0, 0], [0, -1, 0], [0, 0, -1], [-1, 0, 0],
        [s, s, 0],
    ]
    assert np.allclose(ev_many(cyl, surface), 0.0, atol=1e-6)


def test_torus():
    tor = S.torus(0.5, 1.0, OPT, 1)
    assert np.isclose(ev(tor, [0.0, 0.0, 0.0]), -0.5, atol=1e-6)
    assert np.isclose(ev(tor, [1.5, 0.0, 0.0]), 0.0, atol=1e-6)


def test_segment():
    seg = S.segment([-1.0, 0, 0], [1.0, 0, 0], OPT, 1)
    assert np.isclose(ev(seg, [0.0, 0.0, 0.0]), -0.1, atol=1e-6)
    assert np.isclose(ev(seg, [-1.0, 0.0, 0.0]), -0.1, atol=1e-6)
    assert np.isclose(ev(seg, [1.0, 0.0, 0.0]), -0.1, atol=1e-6)
    assert np.isclose(ev(seg, [1.0, 1.1, 0.0]), 1.0, atol=1e-6)
    assert np.isclose(ev(seg, [0.0, 1.1, 0.0]), 1.0, atol=1e-6)
    assert np.isclose(ev(seg, [0.0, 0.0, 1.1]), 1.0, atol=1e-6)


def test_triprism():
    tri = S.triprism(1.0, 5.0, OPT, 1)
    assert np.isclose(ev(tri, [0.0, 0.0, 5.0]), 0.0, atol=1e-6)
    assert np.isclose(ev(tri, [0.0, 1.0, 0.0]), 0.0, atol=1e-6)


def test_capsule():
    cap = S.capsule([-1.0, 0, 0], [1.0, 0, 0], 1.0, OPT, 1)
    assert np.isclose(ev(cap, [0.0, 0.0, 0.0]), -1.0, atol=1e-6)
    assert np.isclose(ev(cap, [0.0, 1.0, 0.0]), 0.0, atol=1e-6)
    assert np.isclose(ev(cap, [2.0, 0.0, 0.0]), 0.0, atol=1e-6)


def test_plane():
    pl = S.plane([0.0, 0.0, 1.0], OPT, 1)
    assert np.isclose(ev(pl, [0.0, 0.0, 0.0]), 0.0, atol=1e-6)
    assert np.isclose(ev(pl, [0.0, 1.0, 0.0]), 0.0, atol=1e-6)
    assert np.isclose(ev(pl, [2.0, 0.0, 0.0]), 0.0, atol=1e-6)
    assert np.isclose(ev(pl, [0.0, 0.0, -1.0]), -1.0, atol=1e-6)
    assert np.isclose(ev(pl, [0.0, 0.0, 1.0]), 1.0, atol=1e-6)


def test_cone():
    con = S.cone([0.0, 0, 0], [0.0, 0, 1.0], 5.0, 0.0, OPT, 1)
    assert np.isclose(ev(con, [0.0, 0.0, 1.0]), 0.0, atol=1e-6)
    assert np.isclose(ev(con, [1.0, 1.0, 0.0]), 0.0, atol=1e-6)


def test_egg():
    r1, r2, h = 2.5, 0.75, 1.5
    eg = S.egg(r1, r2, h, OPT, 1)
    assert np.isclose(ev(eg, [0.0, 0.0, 0.0]), -r1, atol=1e-6)
    assert np.isclose(ev(eg, [r1, 0.0, 0.0]), 0.0, atol=1e-6)
    assert np.isclose(ev(eg, [0.0, r1 + 2 * r2, 0.0]), 0.0, atol=1e-5)
    assert np.isclose(ev(eg, [r1, r1, 0.0]), 0.630294, atol=1e-5)


def test_intersection_model():
    sph = S.sphere(0.25, OPT, 1)
    bx = S.box([1.0, 1.0, 1.0], OPT, 1)
    mod = S.model([sph, bx], "intersection", 1.0)
    assert np.isclose(ev(mod, [0.0, 0.0, 0.0]), -0.25, atol=1e-6)
    assert np.isclose(ev(mod, [0.25, 0.0, 0.0]), 0.0, atol=1e-6)
    assert ev(mod, [0.4, 0.0, 0.0]) > 0.0


def test_subtraction_model():
    sph = S.sphere(0.25, OPT, 1)
    bx = S.box([1.0, 1.0, 1.0], OPT, 1)
    mod = S.model([sph, bx], "subtraction", 1.0)
    assert np.isclose(ev(mod, [0.0, 0.0, 0.0]), 0.25, atol=1e-6)
    assert np.isclose(ev(mod, [0.25, 0.0, 0.0]), 0.0, atol=1e-6)


def test_bend_modifier():
    bx = S.box([1.0, 1.0, 1.0], OPT, 1)
    bent = S.bend(bx, 10.0)
    assert ev(bent, [0.0, 0.0, 0.0]) < 0.0
    assert ev(bent, [0.6, 0.0, 0.0]) > 0.0
    assert ev(bent, [0.4, -0.4, -0.4]) > 0.0
    assert ev(bx, [0.4, -0.4, -0.4]) < 0.0


def test_translated_sphere():
    from rsmcrt_tpu.maths import transforms as T

    t = T.invert(T.translate(jnp.asarray([1.0, 0.0, 0.0], jnp.float32)))
    sph = S.sphere(1.0, OPT, 1, transform=t)
    assert np.isclose(ev(sph, [1.0, 0.0, 0.0]), -1.0, atol=1e-5)
    assert np.isclose(ev(sph, [2.0, 0.0, 0.0]), 0.0, atol=1e-5)


def test_scene_layer_and_grouping():
    opt2 = mono(1.0, 2.0, 0.5, 1.4)
    prims = [
        S.sphere(0.5, opt2, 1),
        S.box([2.0, 2.0, 2.0], OPT, 2),
        S.sphere(2.0, OPT, 3),
    ]
    sc = S.build_scene(prims)
    # two groups: spheres (stacked x2) and box
    assert sc.group_sizes == (2, 1)
    pos = jnp.asarray([[0.0, 0.0, 0.0], [0.8, 0.0, 0.0], [5.0, 0.0, 0.0]],
                      jnp.float32)
    ds = S.eval_scene(sc, pos)
    assert ds.shape == (3, 3)
    # order preserved: column 0 is the small sphere
    assert np.isclose(float(ds[0, 0]), -0.5, atol=1e-6)
    assert np.isclose(float(ds[0, 1]), -1.0, atol=1e-6)
    layer = S.scene_layer(ds)
    assert int(layer[0]) == 1  # innermost = small sphere
    assert int(layer[1]) == 2  # inside box + big sphere; box is closer inside
    assert int(layer[2]) == 0  # outside everything
    # optical table row lookup
    assert np.isclose(float(sc.tables.mus[1]), 1.0)
    assert np.isclose(float(sc.tables.albedo[1]), 1.0 / 3.0)
    assert np.isclose(float(sc.tables.n[0]), 1.0)  # sentinel


def test_calc_normals():
    sph = S.sphere(1.0, OPT, 1)
    sc = S.build_scene([sph])
    pts = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]],
                      jnp.float32)
    n = np.asarray(S.calc_normals(sc, pts, h=1e-4))
    assert n.shape == (3, 1, 3)
    assert np.allclose(n[0, 0], [1, 0, 0], atol=1e-3)
    assert np.allclose(n[1, 0], [0, 1, 0], atol=1e-3)
    assert np.allclose(n[2, 0], [0, 0, 1], atol=1e-3)
