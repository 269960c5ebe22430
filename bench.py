"""Headline benchmark: photons/s on the sphere scene (single chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no performance numbers (BASELINE.md); the
north-star target is 1e9 photons/s on a v5e-8 slice, i.e. 1.25e8
photons/s/chip, which we report against.  Scene: mus=10, mua=0.1, g=0.9,
n=1.38 sphere of radius 1 in a vacuum bounding box, point source at the
centre, 200^3 fluence grid (res/sphere.toml).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

try:  # persistent compile cache: the K=64 ladder is expensive to build
    jax.config.update("jax_compilation_cache_dir",
                      str(__file__).rsplit("/", 1)[0] + "/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass


PER_CHIP_TARGET = 1e9 / 8.0  # north-star 1e9 photons/s on v5e-8


def bench_case(dtype=None):
    """The headline benchmark scene/grid/source (res/sphere.toml), shared
    with the sweep/profiling tools so they stay comparable."""
    from rsmcrt_tpu.grid import cart_grid
    from rsmcrt_tpu.optics.properties import mono
    from rsmcrt_tpu.sdfs import scene as S
    from rsmcrt_tpu.sources.sources import build_source

    scene = S.build_scene([
        S.sphere(1.0, mono(10.0, 0.1, 0.9, 1.38), 1),
        S.box([2.0, 2.0, 2.0], mono(0.0, 0.0, 0.0, 1.0), 2),
    ])
    grid = cart_grid(200, 200, 200, 1.0, 1.0, 1.0)
    src = build_source("point", position=[0.0, 0.0, 0.0])
    return scene, grid, src


def main_sharded():
    """Photon-sharded bench over every visible device (watchdog-safe
    chunked driver; the reference's MPI analogue).  Reports aggregate and
    per-chip photons/s -- the BASELINE.md "1 chip / 1 host / >=2 hosts"
    measurement path; on the virtual CPU mesh it exercises the same
    program the driver dryrun compiles."""
    import numpy as np
    from jax.sharding import Mesh

    from rsmcrt_tpu.parallel.mesh import simulate_sharded_chunked
    from rsmcrt_tpu.transport.engine import TransportConfig

    scene, grid, src = bench_case()
    devices = jax.devices()
    n_dev = len(devices)
    mesh = Mesh(np.array(devices), ("dp",))
    from rsmcrt_tpu.kernels import fast_path_defaults

    on_tpu = jax.default_backend() in ("tpu", "axon")
    lanes = 32768 if on_tpu else 512
    nphotons = (1_000_000 if on_tpu else 2_000) * n_dev
    chunk = 96 if not on_tpu else 48
    cfg = TransportConfig(nphotons=nphotons, n_lanes=lanes,
                          **fast_path_defaults())

    # warmup compiles the chunk program (same shapes, traced budget)
    simulate_sharded_chunked(scene, src, grid, jax.random.key(0), cfg,
                             mesh=mesh, chunk_steps=chunk,
                             nphotons=max(lanes // 8, 1) * n_dev)

    t0 = time.perf_counter()
    tallies, _, launched, steps = simulate_sharded_chunked(
        scene, src, grid, jax.random.key(1), cfg, mesh=mesh,
        chunk_steps=chunk,
    )
    jax.block_until_ready(tallies.jmean)
    float(jnp.sum(tallies.nscatt))  # force a host read (axon gotcha)
    dt = time.perf_counter() - t0

    value = int(launched) / dt
    print(json.dumps({
        "metric": f"photons_per_second_sphere_scene_{n_dev}dev_sharded",
        "value": round(value, 1),
        "unit": "photons/s",
        "per_device": round(value / n_dev, 1),
        "n_devices": n_dev,
        "vs_baseline": round(value / (n_dev * PER_CHIP_TARGET), 6),
    }))


def bench_bank():
    """A circle detector inside the bench box (for --detector): the
    chained walk must keep detector workloads within ~25% of the
    detector-free rate (VERDICT r2 next #2 acceptance)."""
    import jax.numpy as jnp

    from rsmcrt_tpu.detectors.detectors import (CircleDetectors,
                                                DetectorBank)

    arr = lambda v: jnp.asarray(v, jnp.float32)
    circ = CircleDetectors(
        pos=arr([[0.0, 0.0, 0.8]]), dir=arr([[0.0, 0.0, -1.0]]),
        radius=arr([1.0]), bin_wid=arr([1.0 / 32]),
        data=jnp.zeros((1, 33), jnp.float32), nbins=32,
    )
    return DetectorBank(
        circle=circ, annulus=None, fibre=None, camera=None,
        target_values=jnp.full((1,), -1.0), order=(("circle", 0),),
        ids=("d0",), layers=(2,),
    )


def run_fluenceless(nphotons=None):
    """Detector-workload (fluenceless) rate: the path-length estimator
    OFF regime of escape functions / detector / inverse / validation
    runs (reference without -Dpathlength, inttau2.f90:446-462).  No
    voxel deposits -> the scatter wall does not exist; each chained
    round consumes a whole segment event.  Sphere scene + the bench
    circle detector; K=64 measured fastest (tools/profile_fluenceless.py:
    1.6M @ K=32, 4.0M @ K=64, 2.1M @ K=128 on v5e), and 3 in-chain
    respawn candidates let each lane host several photons per megastep
    (C=1 4.0M / C=2 4.3M / C=3 8.1M ph/s, v5e)."""
    from rsmcrt_tpu.transport.engine import (
        TransportConfig, simulate, warmup,
    )

    scene, grid, src = bench_case()
    bank = bench_bank()
    on_tpu = jax.default_backend() in ("tpu", "axon")
    lanes = 32768 if on_tpu else 2048
    # 32M budget: at ~5M ph/s the fixed dispatch + straggler tail only
    # amortise past ~10 s of main phase (2.3M/s at a 2M budget vs 5.4M/s
    # at 32M, measured on v5e)
    n = int(nphotons or (32_000_000 if on_tpu else 8_000))
    chunk = 48
    cfg = TransportConfig(nphotons=n, n_lanes=lanes,
                          record_fluence=False, record_emission=False,
                          chain_scatter=True, dda_substeps=64,
                          chain_respawns=3 if on_tpu else 1)
    warmup(scene, src, grid, jax.random.key(0), cfg, bank=bank,
           chunk_steps=chunk, min_lanes=64)
    t0 = time.perf_counter()
    tallies, bank_out, launched, steps = simulate(
        scene, src, grid, jax.random.key(1), cfg, bank=bank,
        nphotons=n, min_lanes=64, chunk_steps=chunk,
    )
    float(jnp.sum(tallies.nscatt))  # force a host read (axon gotcha)
    dt = time.perf_counter() - t0
    return int(launched) / dt


def main(with_detector: bool = False):
    from rsmcrt_tpu.transport.engine import (
        TransportConfig, simulate, warmup,
    )

    scene, grid, src = bench_case()
    bank = bench_bank() if with_detector else None

    from rsmcrt_tpu.kernels import fast_path_defaults

    on_tpu = jax.default_backend() in ("tpu", "axon")
    lanes = 32768 if on_tpu else 2048
    # 16M budget (round 5; was 4M): the ramp chunk + straggler tail are
    # fixed costs -- 215.5k at 4M vs 228.0k at 16M measured on v5e, and
    # the steady state IS the deposit-scatter wall (~12 ns/row x 307
    # rows/photon; decomposition in STATUS.md)
    nphotons = 16_000_000 if on_tpu else 4_000
    chunk = 48
    min_lanes = 64
    # the bench runs the PRODUCT transport configuration (same chaining /
    # dda_substeps knobs + emission recording as kernels.run_MCRT), so
    # the headline number is what default_MCRT users actually get
    cfg = TransportConfig(nphotons=nphotons, n_lanes=lanes,
                          record_emission=True, **fast_path_defaults())

    # compile every program of the tail-shrink ladder before timing
    warmup(scene, src, grid, jax.random.key(0), cfg, bank=bank,
           chunk_steps=chunk, min_lanes=min_lanes)

    t0 = time.perf_counter()
    tallies, bank_out, launched, steps = simulate(
        scene, src, grid, jax.random.key(1), cfg, bank=bank,
        nphotons=nphotons, min_lanes=min_lanes, chunk_steps=chunk
    )
    jax.block_until_ready(tallies.jmean)
    dt = time.perf_counter() - t0

    value = int(launched) / dt
    out = {
        "metric": ("photons_per_second_sphere_scene_1chip"
                   + ("_circle_detector" if with_detector else "")),
        "value": round(value, 1),
        "unit": "photons/s",
        "vs_baseline": round(value / PER_CHIP_TARGET, 6),
    }
    if with_detector:
        from rsmcrt_tpu.detectors.detectors import totals

        out["detector_total"] = round(float(totals(bank_out)[0]), 1)
    else:
        # record the fluenceless (detector-workload) headline alongside
        # the fluence-map headline (VERDICT r4 next #1): half the
        # reference's real workloads run with the path-length estimator
        # off, where the deposit wall does not exist
        out["fluenceless_photons_per_second"] = round(run_fluenceless(), 1)
    print(json.dumps(out))


def main_fluenceless():
    value = run_fluenceless()
    print(json.dumps({
        "metric": "photons_per_second_sphere_fluenceless_detector_1chip",
        "value": round(value, 1),
        "unit": "photons/s",
        "vs_baseline": round(value / PER_CHIP_TARGET, 6),
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sharded", action="store_true",
                    help="photon-shard over all visible devices")
    ap.add_argument("--detector", action="store_true",
                    help="bench with a circle detector in the scene")
    ap.add_argument("--fluenceless", action="store_true",
                    help="detector-workload bench, path-length estimator "
                         "off (no fluence deposits)")
    args = ap.parse_args()
    if args.sharded:
        main_sharded()
    elif args.fluenceless:
        main_fluenceless()
    else:
        main(with_detector=args.detector)
