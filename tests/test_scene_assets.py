"""Logo and vessels scenes must build and run from a fresh checkout
(VERDICT: the reference ships res/crest-simple.svg and vessel data; this
repo ships an original logo SVG and procedurally generated vessel data,
see tools/gen_vessels.py)."""

import jax
import jax.numpy as jnp
import pytest

from rsmcrt_tpu.grid import cart_grid
from rsmcrt_tpu.scenes import setup_simulation
from rsmcrt_tpu.sdfs.scene import build_scene, eval_scene, scene_layer
from rsmcrt_tpu.sources.sources import build_source
from rsmcrt_tpu.transport.engine import TransportConfig, simulate


def _run_some_photons(prims, nphotons=300, half=1.0):
    scene = build_scene(prims)
    grid = cart_grid(24, 24, 24, half, half, half)
    src = build_source("point", position=[0.0, 0.0, 0.0])
    cfg = TransportConfig(nphotons=nphotons, n_lanes=256,
                          max_steps=20000)
    tallies, _, launched, _ = simulate(
        scene, src, grid, jax.random.key(3), cfg, tail_shrink=False)
    assert int(launched) == nphotons
    return tallies


@pytest.mark.slow
def test_logo_scene_builds_and_runs():
    prims = setup_simulation("logo", {})
    # the shipped logo.svg: diamond(4 incl. Z-close) + rays(1+3+1) +
    # M(4) + C(3) + 6 tick segments = 22 extruded segments + bounding box
    assert len(prims) == 23
    scene = build_scene(prims)
    # the point source sits inside SOME prim (scene_layer returns the
    # 1-based prim column of the innermost containing SDF)
    lay0 = int(scene_layer(eval_scene(
        scene, jnp.asarray([[0.0, 0.0, 0.0]])))[0])
    assert 1 <= lay0 <= len(prims)
    t = _run_some_photons(prims, nphotons=200)
    assert float(jnp.sum(t.jmean)) > 0.0


@pytest.mark.slow
def test_vessels_scene_builds_and_runs():
    prims = setup_simulation("vessels", {})
    assert len(prims) == 32  # 31 capsules + dermis box
    t = _run_some_photons(prims, nphotons=200, half=0.2)
    assert float(jnp.sum(t.jmean)) > 0.0


def test_logo_svg_parser_counts_segments():
    from rsmcrt_tpu.scenes import _parse_svg_segments
    segs = _parse_svg_segments("res/logo.svg")
    assert len(segs) == 22
