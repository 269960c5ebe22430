"""Bounce-indexed Russian roulette (opt-in straggler mitigation).

The reference hard-kills photons at 1000 reflections
(src/inttau2.f90:313-315) -- biased, and TIR-trapped photons in
pure-refractive scenes serialise the wavefront.  The opt-in roulette
kills trapped lanes early but re-weights survivors, so every weighted
tally stays unbiased."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsmcrt_tpu.grid import cart_grid
from rsmcrt_tpu.optics.properties import mono
from rsmcrt_tpu.sdfs import scene as S
from rsmcrt_tpu.sources.sources import build_source
from rsmcrt_tpu.transport.engine import TransportConfig, simulate


def _tir_scene():
    # high-index scattering sphere: internal reflections are common
    return S.build_scene([
        S.sphere(0.8, mono(3.0, 0.3, 0.0, 1.6), 1),
        S.box([2.0, 2.0, 2.0], mono(0.0, 0.0, 0.0, 1.0), 2),
    ])


@pytest.mark.slow
def test_roulette_is_unbiased():
    scene = _tir_scene()
    grid = cart_grid(32, 32, 32, 1.0, 1.0, 1.0)
    src = build_source("point", position=[0.0, 0.0, 0.0])
    n = 6000

    def run(roulette, key):
        cfg = TransportConfig(nphotons=n, n_lanes=1024,
                              roulette_bounces=roulette)
        t, _, launched, _ = simulate(scene, src, grid, key, cfg)
        return (float(jnp.sum(t.jmean)) / int(launched),
                float(jnp.sum(t.absorb)) / int(launched))

    j0, a0 = run(0, jax.random.key(10))
    j1, a1 = run(8, jax.random.key(11))
    # weighted tallies agree within MC noise (SE ~ 1-2% at 6e3 photons)
    assert abs(j1 - j0) / j0 < 0.06, (j0, j1)
    assert abs(a1 - a0) / a0 < 0.08, (a0, a1)


@pytest.mark.slow
def test_roulette_kills_stragglers_faster():
    """With roulette on, the same budget finishes in fewer megasteps
    (the straggler tail is the 50-sphere cliff in miniature)."""
    scene = _tir_scene()
    grid = cart_grid(32, 32, 32, 1.0, 1.0, 1.0)
    src = build_source("point", position=[0.0, 0.0, 0.0])

    def steps(roulette):
        cfg = TransportConfig(nphotons=3000, n_lanes=1024,
                              roulette_bounces=roulette)
        _, _, _, s = simulate(scene, src, grid, jax.random.key(5), cfg)
        return int(s)

    assert steps(8) < steps(0)
