"""Scaling sweep over the random-sphere scene: photons/s vs sphere count
(model: reference tools/run_sphere_scene.py, which regenerated TOML files
and timed `fpm` runs; here the library is driven directly).

Writes ``times.dat`` rows: num_spheres, seconds, photons/s.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main(counts=(1, 5, 10, 25, 50), nphotons=100_000, cpu=False,
         roulette=0):
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")

    from rsmcrt_tpu.grid import cart_grid
    from rsmcrt_tpu.scenes import setup_sphere_scene
    from rsmcrt_tpu.sdfs.scene import build_scene
    from rsmcrt_tpu.sources.sources import build_source
    from rsmcrt_tpu.transport.engine import (
        TransportConfig, simulate, warmup,
    )

    grid = cart_grid(200, 200, 200, 1.0, 1.0, 1.0)
    src = build_source("uniform", point1=[-1.0, -1.0, 1.0],
                       point2=[2.0, 0.0, 0.0], point3=[0.0, 2.0, 0.0],
                       direction=[0.0, 0.0, -1.0])
    B = 2048 if cpu else 32768
    n = min(nphotons, 4000) if cpu else nphotons
    rows = []
    for num in counts:
        prims = build_scene(
            setup_sphere_scene({"num_spheres": num,
                                "musb": 0.0, "muab": 0.01,
                                "musc": 0.0, "muac": 0.01, "hgga": 0.7})
        )
        # PRODUCT fast path (round 5): the chained walk consumes the
        # refractive spheres' TIR bounces inline (K boundary events per
        # lane per megastep); the old plain K=16 walk needed ~20
        # megasteps per near-transparent segment and ONE megastep per
        # bounce -- 2.4k ph/s at N=50 vs 28.8k chained (12x, rr off)
        cfg = TransportConfig(nphotons=n, n_lanes=B, dda_substeps=64,
                              roulette_bounces=roulette,
                              chain_scatter=True)
        warmup(prims, src, grid, jax.random.key(0), cfg, chunk_steps=24,
               min_lanes=256)
        t0 = time.perf_counter()
        tallies, _, launched, _ = simulate(prims, src, grid,
                                           jax.random.key(1), cfg,
                                           chunk_steps=24, min_lanes=256)
        jax.block_until_ready(tallies.jmean)
        dt = time.perf_counter() - t0
        pps = int(launched) / dt
        rows.append((num, dt, pps))
        print(f"num_spheres={num:4d}  {dt:7.2f}s  {pps/1e3:8.1f}k ph/s",
              flush=True)
    with open("times.dat", "w") as fh:
        for num, dt, pps in rows:
            fh.write(f"{num}, {dt:.2f}, {pps:.1f}\n")
    print("-> times.dat")


if __name__ == "__main__":
    cpu = "--cpu" in sys.argv
    n = int(sys.argv[sys.argv.index("-n") + 1]) if "-n" in sys.argv \
        else 100_000
    rr = (int(sys.argv[sys.argv.index("--roulette") + 1])
          if "--roulette" in sys.argv else 0)
    counts = (tuple(int(c) for c in
                    sys.argv[sys.argv.index("--counts") + 1].split(","))
              if "--counts" in sys.argv else (1, 5, 10, 25, 50))
    main(counts=counts, nphotons=n, cpu=cpu, roulette=rr)
