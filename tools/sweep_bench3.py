"""Sweep (n_lanes, dda_substeps, chunk_steps) on the bench sphere scene.

The dispatch tunnel costs ~30 ms per chunk, so chunk_steps trades
watchdog headroom against dispatch amortisation; B trades per-lane rest
cost against straggler-tail length; K trades scatter slots (cost
~10 ns/slot including zeros) against megasteps/photon.
"""

from __future__ import annotations

import argparse
import time

import jax


def run_one(B, K, chunk, nphotons, min_lanes=64, chain=False):
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from bench import bench_case
    from rsmcrt_tpu.transport.engine import (
        TransportConfig, simulate, warmup,
    )

    scene, grid, src = bench_case()
    cfg = TransportConfig(nphotons=nphotons, n_lanes=B, dda_substeps=K,
                          chain_scatter=chain)
    warmup(scene, src, grid, jax.random.key(0), cfg, chunk_steps=chunk,
           min_lanes=min_lanes)
    t0 = time.perf_counter()
    tallies, _, launched, steps = simulate(
        scene, src, grid, jax.random.key(1), cfg, nphotons=nphotons,
        min_lanes=min_lanes, chunk_steps=chunk)
    jax.block_until_ready(tallies.jmean)
    float(tallies.nscatt)  # force host read through the tunnel
    dt = time.perf_counter() - t0
    return int(launched) / dt, int(steps)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-n", type=int, default=1_000_000)
    p.add_argument("--grid", type=str,
                   default="32768:16:96,32768:16:384,32768:12:384,"
                           "65536:16:192,65536:12:192,32768:20:384")
    p.add_argument("--chain", action="store_true")
    args = p.parse_args()
    for bkc in args.grid.split(","):
        B, K, c = (int(x) for x in bkc.split(":"))
        pps, steps = run_one(B, K, c, args.n, chain=args.chain)
        print(f"B={B:6d} K={K:3d} chunk={c:4d}  {pps/1e3:8.1f}k ph/s  "
              f"steps={steps}", flush=True)


if __name__ == "__main__":
    main()
