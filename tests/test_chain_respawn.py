"""Multi-candidate in-chain respawn (round 5): `chain_respawns` > 1
lets a lane relaunch several photons inside one megastep (one analog
absorption slot per hosted photon).  Gates:

- launch count stays EXACT under heavy multi-consumption,
- tallies statistically match the single-candidate walk,
- emission records every consumed candidate's launch voxel.
"""

import jax
import jax.numpy as jnp
import pytest

from rsmcrt_tpu.grid import cart_grid
from rsmcrt_tpu.optics.properties import mono
from rsmcrt_tpu.sdfs import scene as S
from rsmcrt_tpu.sources.sources import build_source
from rsmcrt_tpu.transport.engine import TransportConfig, simulate


def _run(C, key=1, n=8000):
    # strongly absorbing sphere: photons die after ~2 interactions, so
    # K=16 rounds host several photons per lane when C allows it
    # (K=16 keeps the unrolled chained program's CPU compile < ~2 min)
    scene = S.build_scene([
        S.sphere(1.0, mono(5.0, 5.0, 0.0, 1.0), 1),
        S.box([2.0, 2.0, 2.0], mono(0.0, 0.0, 0.0, 1.0), 2),
    ])
    grid = cart_grid(16, 16, 16, 1.0, 1.0, 1.0)
    src = build_source("point", position=[0.0, 0.0, 0.0])
    cfg = TransportConfig(nphotons=n, n_lanes=128, chain_scatter=True,
                          dda_substeps=16, chain_respawns=C,
                          record_emission=True)
    t, _, launched, steps = simulate(scene, src, grid,
                                     jax.random.key(key), cfg,
                                     chunk_steps=64)
    return t, int(launched), int(steps)


@pytest.mark.slow
def test_multi_respawn_exact_count_and_stats():
    t1, n1, s1 = _run(1)
    t3, n3, s3 = _run(3)
    assert n1 == n3 == 8000
    # multi-candidate lanes host more photons per megastep
    assert s3 < s1, (s3, s1)
    # per-photon physics statistically identical (absorbing scene:
    # absorbed weight ~ 1 - escape fraction)
    a1 = float(jnp.sum(t1.absorb)) / n1
    a3 = float(jnp.sum(t3.absorb)) / n3
    assert a1 > 0.5  # most photons absorb in this scene
    assert abs(a1 - a3) < 0.03, (a1, a3)
    j1 = float(jnp.sum(t1.jmean)) / n1
    j3 = float(jnp.sum(t3.jmean)) / n3
    assert abs(j1 - j3) / j1 < 0.05, (j1, j3)
    ns1 = float(t1.nscatt) / n1
    ns3 = float(t3.nscatt) / n3
    assert abs(ns1 - ns3) < 0.1, (ns1, ns3)
    # every launch (analysis spawn or consumed candidate) recorded
    e3 = float(jnp.sum(t3.emission))
    assert e3 == pytest.approx(n3, abs=1), (e3, n3)
