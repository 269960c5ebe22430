"""Fresnel tests (model: reference test/fresnel/test_fresnel.f90)."""

import jax
import jax.numpy as jnp
import numpy as np

from rsmcrt_tpu.transport.fresnel import fresnel_coeff, reflect, refract


def test_reflect_mirror():
    # reference: test_fresnel.f90:182-186
    i = jnp.asarray([[1.0, -1.0, 0.0]]) / np.sqrt(2.0)
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    r = np.asarray(reflect(i, n))[0]
    assert np.allclose(r, [1.0 / np.sqrt(2.0), 1.0 / np.sqrt(2.0), 0.0],
                       atol=1e-6)


def test_refract_snell_angle():
    # reference: test_fresnel.f90:149 -- exact Snell angle
    n1, n2 = 1.0, 1.33
    theta_i = np.deg2rad(30.0)
    i = jnp.asarray([[np.sin(theta_i), -np.cos(theta_i), 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    t = np.asarray(refract(i, n, n1 / n2))[0]
    theta_t = np.arcsin(np.clip(abs(t[0]), 0, 1))
    expected = np.arcsin(n1 * np.sin(theta_i) / n2)
    assert abs(theta_t - expected) < 1e-6
    assert t[1] < 0.0  # continues through the interface


def test_fresnel_coefficient_limits():
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    # exact normal incidence transmits in the reference's convention
    # (surfaces.f90:111-114 special-cases costt == 1 to tir = 0)
    i = jnp.asarray([[0.0, 0.0, -1.0]])
    r = float(fresnel_coeff(i, n, 1.0, 1.5)[0])
    assert r == 0.0
    # near-normal incidence: R ~ ((n1-n2)/(n1+n2))^2
    th = np.deg2rad(1.0)
    i = jnp.asarray([[np.sin(th), 0.0, -np.cos(th)]])
    r = float(fresnel_coeff(i, n, 1.0, 1.5)[0])
    assert abs(r - ((1.0 - 1.5) / (1.0 + 1.5)) ** 2) < 1e-4
    # perpendicular incidence special-case transmits (reference :111-114)
    # TIR beyond the critical angle going dense -> rare
    theta = np.deg2rad(60.0)
    i = jnp.asarray([[np.sin(theta), 0.0, -np.cos(theta)]])
    r = float(fresnel_coeff(i, n, 1.5, 1.0)[0])
    assert r == 1.0  # past critical angle (41.8 deg)


def test_reflect_refract_frequency():
    """Monte Carlo reflect/refract frequency matches the Fresnel coefficient
    (reference: test_fresnel.f90:72,114 -- 5e-4 at 1e6 samples)."""
    n1, n2 = 1.0, 1.33
    theta = np.deg2rad(45.0)
    i = jnp.asarray([np.sin(theta), 0.0, -np.cos(theta)])
    n = jnp.asarray([0.0, 0.0, 1.0])
    ri = float(fresnel_coeff(i, n, n1, n2))
    u = jax.random.uniform(jax.random.key(0), (1_000_000,))
    frac = float(jnp.mean((u <= ri).astype(jnp.float32)))
    assert abs(frac - ri) < 5e-4


def test_energy_conservation_direction_norms():
    rng = np.random.default_rng(3)
    i = rng.normal(size=(100, 3))
    i /= np.linalg.norm(i, axis=-1, keepdims=True)
    n = np.tile([0.0, 0.0, 1.0], (100, 1))
    r = np.asarray(reflect(jnp.asarray(i, jnp.float32),
                           jnp.asarray(n, jnp.float32)))
    assert np.allclose(np.linalg.norm(r, axis=-1), 1.0, atol=1e-5)
