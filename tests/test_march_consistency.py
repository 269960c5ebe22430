"""Integrator-path consistency: analytic raycast vs sphere-trace march.

The engine picks a segment-length mechanism per scene (exact raycast for
closed-form prims, capped march otherwise -- engine.py segment selection).
Identical geometry run through BOTH paths must agree statistically; this
is the only coverage of the march path with mixed analytic/non-analytic
scenes (the physics gates use all-analytic scenes).
"""

import jax
import numpy as np
import pytest

from rsmcrt_tpu.grid import cart_grid
from rsmcrt_tpu.optics.properties import mono
from rsmcrt_tpu.sdfs import raycast, scene as S
from rsmcrt_tpu.sources.sources import build_source
from rsmcrt_tpu.transport.engine import TransportConfig, simulate


def _run(scene, nphotons=6000, march_iters=6, seed=11):
    grid = cart_grid(100, 100, 100, 1.0, 1.0, 1.0)
    src = build_source("point", position=[0.0, 0.0, 0.0])
    cfg = TransportConfig(nphotons=nphotons, n_lanes=2048,
                          march_iters=march_iters, dda_substeps=12)
    tallies, _, launched, _ = simulate(scene, src, grid,
                                       jax.random.key(seed), cfg,
                                       chunk_steps=128, min_lanes=512)
    n = int(launched)
    return (float(tallies.nscatt) / n,
            float(np.asarray(tallies.jmean).sum()) / n)


def test_analytic_vs_march_same_geometry():
    """The tau=10 sphere gate scene, twice: plain prims (raycast path) vs
    the bounding box wrapped in a single-child CSG union (structurally
    identical SDF, but kind='model' forces the hybrid march)."""
    opt_s = mono(10.0, 0.0, 0.0, 1.0)
    opt_v = mono(0.0, 0.0, 0.0, 1.0)
    analytic = S.build_scene([
        S.sphere(1.0, opt_s, 1),
        S.box([2.0, 2.0, 2.0], opt_v, 2),
    ])
    mixed = S.build_scene([
        S.sphere(1.0, opt_s, 1),
        S.model([S.box([2.0, 2.0, 2.0], opt_v, 2)], "union"),
    ])
    assert raycast.analytic_column_mask(analytic) == (True, True)
    assert raycast.analytic_column_mask(mixed) == (True, False)

    ns_a, jm_a = _run(analytic)
    ns_m, jm_m = _run(mixed, seed=12)
    # both must satisfy the physics gate and agree with each other
    assert abs(ns_a - 57.5) < 2.0, ns_a
    assert abs(ns_m - 57.5) < 2.0, ns_m
    assert jm_m == pytest.approx(jm_a, rel=0.05), (jm_a, jm_m)


def test_fully_nonanalytic_march():
    """Same geometry built ONLY from model-wrapped prims: no analytic
    bound at all, pure march (the engine's elif branch with
    d_na over every prim)."""
    opt_s = mono(10.0, 0.0, 0.0, 1.0)
    opt_v = mono(0.0, 0.0, 0.0, 1.0)
    scene = S.build_scene([
        S.model([S.sphere(1.0, opt_s, 1)], "union"),
        S.model([S.box([2.0, 2.0, 2.0], opt_v, 2)], "union"),
    ])
    assert not any(raycast.analytic_column_mask(scene))
    ns, jm = _run(scene, nphotons=4000)
    assert abs(ns - 57.5) < 2.5, ns
    assert jm > 0.0


@pytest.mark.slow
def test_egg_scene_march_runs():
    """The egg scene (revolution modifiers -> non-analytic) propagates
    photons without NaNs and deposits fluence."""
    from rsmcrt_tpu.scenes import setup_egg

    scene = S.build_scene(setup_egg({
        "mus": [10.0, 1.0, 5.0], "mua": [0.1, 0.01, 0.1],
        "hgg": [0.0, 0.0, 0.9], "n": [1.4, 1.35, 1.37],
        "boundinglength": [8.0, 8.0, 8.0],
    }))
    grid = cart_grid(64, 64, 64, 4.0, 4.0, 4.0)
    src = build_source("point", position=[0.0, 0.0, -0.2])
    cfg = TransportConfig(nphotons=1500, n_lanes=1024, march_iters=6,
                          dda_substeps=12)
    tallies, _, launched, _ = simulate(scene, src, grid,
                                       jax.random.key(3), cfg,
                                       chunk_steps=128, min_lanes=256)
    jm = np.asarray(tallies.jmean)
    assert int(launched) == 1500
    assert np.isfinite(jm).all()
    assert jm.sum() > 0.0
