"""Survival-bias (weighted packet + roulette) mode tests
(reference: survivalBiasPropagation, kernelsMod.f90:1979-2067)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsmcrt_tpu.grid import cart_grid
from rsmcrt_tpu.optics.properties import mono
from rsmcrt_tpu.sdfs import scene as S
from rsmcrt_tpu.sources.sources import build_source
from rsmcrt_tpu.transport.engine import TransportConfig, simulate


def _run(survival_bias, n=6000, seed=11):
    scene = S.build_scene([
        S.sphere(1.0, mono(5.0, 0.5, 0.5, 1.0), 1),
        S.box([2.0, 2.0, 2.0], mono(0.0, 0.0, 0.0, 1.0), 2),
    ])
    grid = cart_grid(32, 32, 32, 1.0, 1.0, 1.0)
    src = build_source("point", position=[0.0, 0.0, 0.0])
    cfg = TransportConfig(nphotons=n, n_lanes=2048,
                          survival_bias=survival_bias)
    tallies, _, launched, _ = simulate(scene, src, grid,
                                       jax.random.key(seed), cfg)
    return tallies, int(launched)


@pytest.mark.slow
def test_survival_bias_matches_analog():
    """The weighted estimator is unbiased: fluence and absorbed energy
    agree with analog transport within Monte Carlo noise."""
    t_a, n_a = _run(False)
    t_b, n_b = _run(True)

    j_a = float(jnp.sum(t_a.jmean)) / n_a
    j_b = float(jnp.sum(t_b.jmean)) / n_b
    assert abs(j_a - j_b) / j_a < 0.05, (j_a, j_b)

    # analog mode records 1.0 per absorption event; weighted mode records
    # the absorbed weight.  Both estimate total absorbed energy/photon.
    a_a = float(jnp.sum(t_a.absorb)) / n_a
    a_b = float(jnp.sum(t_b.absorb)) / n_b
    assert abs(a_a - a_b) < 0.06, (a_a, a_b)
    # absorbed fraction must be sensible (0 < A < 1)
    assert 0.1 < a_b < 0.9
