"""HG scattering statistical tests (model: reference
test/random/test_random.f90 + photon scatter behavior)."""

import jax
import jax.numpy as jnp
import numpy as np

from rsmcrt_tpu.transport.scatter import (
    hg_scatter,
    sample_hg_cost,
    scatter_direction,
)


def test_hg_mean_cost():
    """<cos theta> = g for Henyey-Greenstein."""
    for g in (0.0, 0.5, 0.9, -0.4):
        u = jax.random.uniform(jax.random.key(42), (500_000,))
        cost = np.asarray(sample_hg_cost(u, g))
        assert abs(cost.mean() - g) < 3e-3, (g, cost.mean())
        assert cost.min() >= -1.0 and cost.max() <= 1.0


def test_scatter_preserves_norm():
    key = jax.random.key(7)
    d = jax.random.normal(key, (1000, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    u1 = jax.random.uniform(jax.random.key(8), (1000,))
    u2 = jax.random.uniform(jax.random.key(9), (1000,))
    out = np.asarray(hg_scatter(d, u1, u2, 0.9))
    assert np.allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)


def test_scatter_deflection_angle_matches_cost():
    """The angle between in/out directions equals acos(cost)."""
    key = jax.random.key(11)
    d = jax.random.normal(key, (2000, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    cost = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, 2000),
                       jnp.float32)
    phi = jnp.asarray(np.random.default_rng(2).uniform(0, 2 * np.pi, 2000),
                      jnp.float32)
    out = scatter_direction(d, cost, phi)
    got = np.asarray(jnp.sum(out * d, axis=-1))
    assert np.allclose(got, np.asarray(cost), atol=1e-4)


def test_scatter_from_vertical():
    """Photons travelling exactly along +/-z must still deflect (this was
    an f32 threshold bug against the reference's 1e-12 guard)."""
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (1000, 1))
    u1 = jax.random.uniform(jax.random.key(3), (1000,))
    u2 = jax.random.uniform(jax.random.key(4), (1000,))
    out = np.asarray(hg_scatter(d, u1, u2, 0.9))
    assert np.std(out[:, 0]) > 0.05
    assert np.std(out[:, 1]) > 0.05
