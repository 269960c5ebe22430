"""Quasi-Monte Carlo source sampling (reference random_mod.f90:9-42 seq;
partial-sum gates modelled on reference test/random/test_random.f90:173-191
which checks Halton partial sums)."""

import jax
import jax.numpy as jnp
import numpy as np

from rsmcrt_tpu.maths.qmc import halton_block, radical_inverse


def test_radical_inverse_base2_golden():
    idx = jnp.arange(1, 9, dtype=jnp.int32)
    got = np.asarray(radical_inverse(idx, 2))
    want = [0.5, 0.25, 0.75, 0.125, 0.625, 0.375, 0.875, 0.0625]
    assert np.allclose(got, want, atol=1e-7), got


def test_radical_inverse_base3_golden():
    idx = jnp.arange(1, 7, dtype=jnp.int32)
    got = np.asarray(radical_inverse(idx, 3))
    want = [1 / 3, 2 / 3, 1 / 9, 4 / 9, 7 / 9, 2 / 9]
    assert np.allclose(got, want, atol=1e-6), got


def test_partial_sums_converge_to_half():
    """Halton partial means converge to 1/2 much faster than 1/sqrt(N)
    (the reference gates partial sums of its seq the same way)."""
    for base in (2, 3, 5):
        idx = jnp.arange(1, 4097, dtype=jnp.int32)
        u = np.asarray(radical_inverse(idx, base))
        assert abs(u.mean() - 0.5) < 2e-3, (base, u.mean())


def test_base2_stratification_exact():
    """The first 2^k base-2 points place exactly one point per 2^-k bin."""
    k = 8
    idx = jnp.arange(0, 1 << k, dtype=jnp.int32)
    u = np.asarray(radical_inverse(idx, 2))
    bins = np.floor(u * (1 << k)).astype(int)
    assert sorted(bins.tolist()) == list(range(1 << k))


def test_halton_block_rotation_unbiased_and_in_range():
    idx = jnp.arange(0, 2048, dtype=jnp.int32)
    u = np.asarray(halton_block(idx, 4, jax.random.key(3)))
    assert u.shape == (2048, 4)
    assert (u > 0.0).all() and (u <= 1.0).all()
    # rotation preserves uniformity per dimension
    assert np.abs(u.mean(axis=0) - 0.5).max() < 5e-3
    # different rotation keys give different streams
    v = np.asarray(halton_block(idx, 4, jax.random.key(4)))
    assert not np.allclose(u, v)


def test_qmc_source_variance_reduction_slab():
    """End-to-end lever: uniform-beam slab transmission estimated with
    the QMC source block has lower replicate variance than threefry at
    equal photon count (recorded claim of VERDICT r2 next #8)."""
    from rsmcrt_tpu.grid import cart_grid
    from rsmcrt_tpu.optics.properties import mono
    from rsmcrt_tpu.sdfs import scene as S
    from rsmcrt_tpu.sources.sources import build_source
    from rsmcrt_tpu.transport.engine import TransportConfig, simulate

    # thin absorbing slab, uniform beam over the face: the estimand
    # (total path length) is dominated by the 2D source position +
    # first-tau draw, exactly what the Halton block stratifies
    scene = S.build_scene([
        S.box([2.0, 2.0, 0.4], mono(0.0, 2.0, 0.0, 1.0), 1),
        S.box([2.2, 2.2, 2.2], mono(0.0, 0.0, 0.0, 1.0), 2),
    ])
    grid = cart_grid(16, 16, 16, 1.1, 1.1, 1.1)
    src = build_source(
        "uniform",
        point1=[-0.9, -0.9, -0.15], point2=[0.9, -0.9, -0.15],
        point3=[-0.9, 0.9, -0.15], direction=[0.0, 0.0, 1.0],
    )

    def replicate_var(qmc):
        cfg = TransportConfig(nphotons=512, n_lanes=512,
                              dda_substeps=8, qmc_source=qmc)
        vals = []
        for s in range(8):
            t, _, n, _ = simulate(scene, src, grid, jax.random.key(s),
                                  cfg, chunk_steps=256)
            vals.append(float(jnp.sum(t.jmean)) / int(n))
        return float(np.var(vals)), float(np.mean(vals))

    v_prng, m_prng = replicate_var(False)
    v_qmc, m_qmc = replicate_var(True)
    # unbiased: means agree
    assert abs(m_qmc - m_prng) < 0.1 * m_prng, (m_qmc, m_prng)
    # variance reduced (seeded replicates; gate leaves slack under the
    # >= 1.5x typically observed)
    assert v_qmc < 0.9 * v_prng, (v_qmc, v_prng)
