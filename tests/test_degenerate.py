"""Degenerate-geometry robustness (VERDICT r2 next #10).

The reference's eps-nudge loop (inttau2.f90:73-146, 213-241) exists for
exactly these cases: tangent rays, photons launched on a surface, corner
hits, coincident faces.  Gates: the run terminates well under the step
cap (no stuck lanes), every tally is finite, and the photon budget is
fully consumed.  Chained and plain walks are both exercised."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsmcrt_tpu.grid import cart_grid
from rsmcrt_tpu.optics.properties import mono
from rsmcrt_tpu.sdfs import scene as S
from rsmcrt_tpu.sources.sources import build_source
from rsmcrt_tpu.transport.engine import TransportConfig, simulate


GRID = cart_grid(24, 24, 24, 1.2, 1.2, 1.2)


def _run(scene, src, chain, nphotons=1500, **kw):
    cfg = TransportConfig(nphotons=nphotons, n_lanes=256, dda_substeps=8,
                          max_steps=20_000, chain_scatter=chain, **kw)
    t, _, n, s = simulate(scene, src, GRID, jax.random.key(11), cfg,
                          chunk_steps=512)
    assert int(n) == nphotons
    # termination: no stuck lanes burning to the step cap
    assert int(s) < 20_000, int(s)
    for arr in (t.jmean, t.absorb, t.nscatt):
        assert bool(jnp.all(jnp.isfinite(arr))), "non-finite tally"
    return t, int(s)


def _sphere_scene(n_inner=1.38):
    return S.build_scene([
        S.sphere(1.0, mono(10.0, 0.1, 0.9, n_inner), 1),
        S.box([2.4, 2.4, 2.4], mono(0.0, 0.0, 0.0, 1.0), 2),
    ])


@pytest.mark.parametrize(
    "chain",
    [False, pytest.param(True, marks=pytest.mark.slow)],
)
def test_tangent_ray(chain):
    # pencil exactly tangent to the sphere (impact parameter == radius):
    # the raycast discriminant is ~0; must neither NaN nor creep forever
    src = build_source("pencil", position=[1.0, 0.0, -1.15],
                       direction=[0.0, 0.0, 1.0])
    _run(_sphere_scene(), src, chain)


@pytest.mark.parametrize(
    "chain",
    [False, pytest.param(True, marks=pytest.mark.slow)],
)
def test_launch_exactly_on_surface(chain):
    # point source ON the sphere surface: d_sdf = 0 at emission -- the
    # analysis-phase boundary branch must resolve the layer by nudging
    src = build_source("point", position=[1.0, 0.0, 0.0])
    t, _ = _run(_sphere_scene(), src, chain)
    assert float(jnp.sum(t.jmean)) > 0.0


@pytest.mark.parametrize(
    "chain",
    [False, pytest.param(True, marks=pytest.mark.slow)],
)
def test_corner_hit(chain):
    # pencil aimed exactly at a box corner (SDF subgradient point)
    scene = S.build_scene([
        S.box([1.0, 1.0, 1.0], mono(5.0, 0.5, 0.0, 1.2), 1),
        S.box([2.4, 2.4, 2.4], mono(0.0, 0.0, 0.0, 1.0), 2),
    ])
    d = np.asarray([1.0, 1.0, 1.0]) / np.sqrt(3.0)
    src = build_source("pencil",
                       position=[-1.1, -1.1, -1.1], direction=list(d))
    _run(scene, src, chain)


@pytest.mark.parametrize(
    "chain",
    [False, pytest.param(True, marks=pytest.mark.slow)],
)
def test_coincident_faces(chain):
    # nested boxes sharing the z = +0.5 face (the exp scene's nested
    # cylinders have the same structure): crossing the shared face is a
    # double layer change at one point
    scene = S.build_scene([
        S.box([1.0, 1.0, 1.0], mono(8.0, 0.2, 0.5, 1.33), 1),
        S.box([2.0, 2.0, 1.0], mono(1.0, 0.1, 0.0, 1.2), 2),
        S.box([2.4, 2.4, 2.4], mono(0.0, 0.0, 0.0, 1.0), 3),
    ])
    src = build_source("point", position=[0.0, 0.0, 0.0])
    _run(scene, src, chain)


@pytest.mark.parametrize(
    "chain",
    [False, pytest.param(True, marks=pytest.mark.slow)],
)
def test_exact_normal_incidence_transmits(chain):
    # reference parity quirk: costt == 1 -> coefficient 0 -> transmit
    # (surfaces.f90:111-114).  A pencil along the sphere axis in a
    # non-scattering absorber must deposit beyond the far surface.
    scene = S.build_scene([
        S.sphere(0.5, mono(0.0, 1.0, 0.0, 1.5), 1),
        S.box([2.4, 2.4, 2.4], mono(0.0, 0.05, 0.0, 1.0), 2),
    ])
    src = build_source("pencil", position=[0.0, 0.0, -1.1],
                       direction=[0.0, 0.0, 1.0])
    t, _ = _run(scene, src, chain, nphotons=800)
    vol = np.asarray(t.jmean).reshape(24, 24, 24)
    beyond = vol[:, :, 16:].sum()  # z > ~0.5: past the sphere
    assert beyond > 0.0


@pytest.mark.parametrize(
    "chain",
    [False, pytest.param(True, marks=pytest.mark.slow)],
)
def test_grazing_fresnel_tir_terminates(chain):
    # wide-angle source inside a high-index sphere: many TIR bounces at
    # grazing incidence; the 1000-bounce cap must terminate every lane
    scene = _sphere_scene(n_inner=2.6)
    src = build_source("point", position=[0.9, 0.0, 0.0])
    _run(scene, src, chain, nphotons=500)
