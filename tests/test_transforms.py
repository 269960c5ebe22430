"""Transform helper tests (model: reference test/SDF/test_SDF.f90:71-78)."""

import numpy as np
import jax.numpy as jnp

from rsmcrt_tpu.maths import transforms as T


def apply(m, p):
    return np.asarray(T.apply_transform(m, jnp.asarray(p, jnp.float32)))


def test_identity():
    p = [1.0, 2.0, 3.0]
    assert np.allclose(apply(T.identity(), p), p)


def test_translate():
    # SDFs store inverted transforms: invert(translate(o)) moves points by -o
    m = T.translate(jnp.asarray([1.0, 2.0, 3.0], jnp.float32))
    assert np.allclose(apply(m, [0.0, 0.0, 0.0]), [1.0, 2.0, 3.0])
    minv = T.invert(m)
    assert np.allclose(apply(minv, [1.0, 2.0, 3.0]), [0.0, 0.0, 0.0],
                       atol=1e-6)


def test_rotations_90deg():
    # rotate_x(90): +y -> +z under the reference row-vector convention
    p = [0.0, 1.0, 0.0]
    assert np.allclose(apply(T.rotate_x(90.0), p), [0.0, 0.0, 1.0], atol=1e-6)
    # rotate_y(90): +z -> +x
    assert np.allclose(apply(T.rotate_y(90.0), [0.0, 0.0, 1.0]),
                       [1.0, 0.0, 0.0], atol=1e-6)
    # rotate_z(90): +x -> +y
    assert np.allclose(apply(T.rotate_z(90.0), [1.0, 0.0, 0.0]),
                       [0.0, 1.0, 0.0], atol=1e-6)


def test_rotmat_matches_axis_rotation():
    axis = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    m1 = T.rotmat(axis, 37.0)
    m2 = T.rotate_z(37.0)
    assert np.allclose(np.asarray(m1), np.asarray(m2), atol=1e-6)


def test_rotation_align():
    a = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)
    b = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)
    m = T.rotation_align(a, b)
    out = apply(m, [1.0, 0.0, 0.0])
    assert np.allclose(out, [0.0, 1.0, 0.0], atol=1e-6)

    rng = np.random.default_rng(1)
    for _ in range(5):
        a = rng.normal(size=3)
        b = rng.normal(size=3)
        a = a / np.linalg.norm(a)
        b = b / np.linalg.norm(b)
        m = T.rotation_align(jnp.asarray(a, jnp.float32),
                             jnp.asarray(b, jnp.float32))
        assert np.allclose(apply(m, a), b, atol=1e-5)


def test_skew_symm():
    v = jnp.asarray([1.0, 2.0, 3.0], jnp.float32)
    m = np.asarray(T.skew_symm(v))
    assert np.allclose(m[:3, :3], -m[:3, :3].T)
