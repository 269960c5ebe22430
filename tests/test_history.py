"""Photon history recording tests (reference: src/historyStack.f90; the
reference cannot run history under OpenMP -- here it is wavefront-native)."""

import jax
import jax.numpy as jnp
import numpy as np

from rsmcrt_tpu.detectors.detectors import CircleDetectors, DetectorBank
from rsmcrt_tpu.grid import cart_grid
from rsmcrt_tpu.io.history import write_history
from rsmcrt_tpu.optics.properties import mono
from rsmcrt_tpu.sdfs import scene as S
from rsmcrt_tpu.sources.sources import build_source
from rsmcrt_tpu.transport.engine import TransportConfig, simulate


def _sim(tmp_path=None):
    scene = S.build_scene([
        S.sphere(1.0, mono(5.0, 0.0, 0.0, 1.0), 1),
        S.box([2.0, 2.0, 2.0], mono(0.0, 0.0, 0.0, 1.0), 2),
    ])
    grid = cart_grid(32, 32, 32, 1.0, 1.0, 1.0)
    src = build_source("point", position=[0.0, 0.0, 0.0])
    circle = CircleDetectors(
        pos=jnp.asarray([[0.0, 0.0, 0.95]]),
        dir=jnp.asarray([[0.0, 0.0, 1.0]]),
        radius=jnp.asarray([0.9]),
        bin_wid=jnp.asarray([0.09]),
        data=jnp.zeros((1, 11), jnp.float32),
        nbins=10,
    )
    bank = DetectorBank(
        circle=circle, annulus=None, fibre=None, camera=None,
        target_values=jnp.asarray([-1.0]), order=(("circle", 0),),
        ids=("c",), layers=(1,),
    )
    cfg = TransportConfig(nphotons=300, n_lanes=128, history_len=32,
                          max_tracks=256)
    tallies, bank_out, launched, _ = simulate(
        scene, src, grid, jax.random.key(4), cfg, bank=bank
    )
    return tallies


def test_history_records_detected_paths(tmp_path):
    tallies = _sim()
    count = int(tallies.track_count)
    tracks = np.asarray(tallies.tracks)
    assert count > 0
    # first recorded point of each track is the launch (origin)
    t0 = tracks[0]
    assert np.allclose(t0[0, :3], 0.0, atol=1e-5)
    # writers produce non-trivial files
    p_obj = write_history(tracks, count, tmp_path / "paths.obj")
    txt = p_obj.read_text()
    assert txt.count("v ") >= count
    assert "l " in txt
    p_ply = write_history(tracks, count, tmp_path / "paths.ply")
    assert "element vertex" in p_ply.read_text()
    p_json = write_history(tracks, count, tmp_path / "paths.json")
    import json

    data = json.loads(p_json.read_text())
    assert len(data) >= 1
    assert "pos" in data[0][0]


def test_history_unbounded_across_chunks():
    """History v2 (round 4): tracks drain to the host every chunk, so a
    run can keep MORE detected paths than max_tracks (the reference's
    unbounded stack, historyStack.f90:60-130); losses are counted, not
    silent."""
    scene = S.build_scene([
        S.sphere(1.0, mono(5.0, 0.0, 0.0, 1.0), 1),
        S.box([2.0, 2.0, 2.0], mono(0.0, 0.0, 0.0, 1.0), 2),
    ])
    grid = cart_grid(32, 32, 32, 1.0, 1.0, 1.0)
    src = build_source("point", position=[0.0, 0.0, 0.0])
    circle = CircleDetectors(
        pos=jnp.asarray([[0.0, 0.0, 0.95]]),
        dir=jnp.asarray([[0.0, 0.0, 1.0]]),
        radius=jnp.asarray([0.9]),
        bin_wid=jnp.asarray([0.09]),
        data=jnp.zeros((1, 11), jnp.float32),
        nbins=10,
    )
    bank = DetectorBank(
        circle=circle, annulus=None, fibre=None, camera=None,
        target_values=jnp.asarray([-1.0]), order=(("circle", 0),),
        ids=("c",), layers=(1,),
    )
    # tiny device slot buffer + short chunks: the drain must still keep
    # every track recorded in distinct chunks
    cfg = TransportConfig(nphotons=400, n_lanes=64, history_len=16,
                          max_tracks=1024)
    t_big, _, _, _ = simulate(scene, src, grid, jax.random.key(4), cfg,
                              bank=jax.tree_util.tree_map(jnp.array, bank),
                              chunk_steps=16)
    big = int(t_big.track_count)
    assert big > 0
    assert t_big.tracks.shape[0] == big  # host-spliced exact buffer
    # deep photons exceed the 16-event ring -> truncation is COUNTED
    assert int(t_big.track_dropped[0]) > 0
    # slot overflow within a chunk is counted too (tiny buffer run)
    cfg_s = TransportConfig(nphotons=400, n_lanes=64, history_len=16,
                            max_tracks=2)
    t_small, _, _, _ = simulate(
        scene, src, grid, jax.random.key(4), cfg_s,
        bank=jax.tree_util.tree_map(jnp.array, bank), chunk_steps=512)
    assert int(t_small.track_dropped[1]) > 0


def test_history_sharded_gathers_per_shard():
    """Sharded history (round 4): the chunked sharded driver gathers
    per-shard track buffers at the reduce instead of refusing."""
    from jax.sharding import Mesh
    import numpy as onp

    from rsmcrt_tpu.parallel.mesh import simulate_sharded_chunked

    scene = S.build_scene([
        S.sphere(1.0, mono(5.0, 0.0, 0.0, 1.0), 1),
        S.box([2.0, 2.0, 2.0], mono(0.0, 0.0, 0.0, 1.0), 2),
    ])
    grid = cart_grid(16, 16, 16, 1.0, 1.0, 1.0)
    src = build_source("point", position=[0.0, 0.0, 0.0])
    circle = CircleDetectors(
        pos=jnp.asarray([[0.0, 0.0, 0.95]]),
        dir=jnp.asarray([[0.0, 0.0, 1.0]]),
        radius=jnp.asarray([0.9]),
        bin_wid=jnp.asarray([0.09]),
        data=jnp.zeros((1, 11), jnp.float32),
        nbins=10,
    )
    bank = DetectorBank(
        circle=circle, annulus=None, fibre=None, camera=None,
        target_values=jnp.asarray([-1.0]), order=(("circle", 0),),
        ids=("c",), layers=(1,),
    )
    mesh = Mesh(onp.array(jax.devices()), ("dp",))
    cfg = TransportConfig(nphotons=400, n_lanes=64, history_len=16,
                          max_tracks=256)
    t, _, launched, _ = simulate_sharded_chunked(
        scene, src, grid, jax.random.key(4), cfg, bank=bank, mesh=mesh,
        chunk_steps=128)
    count = int(t.track_count)
    assert count > 0
    assert t.tracks.shape[0] == count
    # gathered tracks are real paths: shallow ones (ring not wrapped)
    # start at the launch point (origin)
    tr = np.asarray(t.tracks)
    starts_origin = np.all(np.abs(tr[:, 0, :3]) < 1e-5, axis=-1)
    assert starts_origin.sum() > 0
