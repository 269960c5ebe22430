"""Sweep march_iters x dda_substeps on the bench sphere scene (TPU)."""

from __future__ import annotations

import argparse
import time

import jax


def run_one(M, K, B, nphotons):
    from bench import bench_case
    from rsmcrt_tpu.transport.engine import (
        TransportConfig, simulate, warmup,
    )

    scene, grid, src = bench_case()
    cfg = TransportConfig(nphotons=nphotons, n_lanes=B, dda_substeps=K,
                          march_iters=M)
    chunk = 96
    warmup(scene, src, grid, jax.random.key(0), cfg, chunk_steps=chunk,
           min_lanes=512)
    t0 = time.perf_counter()
    tallies, _, launched, steps = simulate(
        scene, src, grid, jax.random.key(1), cfg, nphotons=nphotons,
        min_lanes=512, chunk_steps=chunk)
    jax.block_until_ready(tallies.jmean)
    dt = time.perf_counter() - t0
    return int(launched) / dt, int(steps)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-B", type=int, default=32768)
    p.add_argument("-n", type=int, default=200_000)
    p.add_argument("--grid", type=str,
                   default="4:8,6:8,6:16,8:16,8:24,12:16")
    args = p.parse_args()
    for mk in args.grid.split(","):
        M, K = (int(x) for x in mk.split(":"))
        pps, steps = run_one(M, K, args.B, args.n)
        print(f"M={M:3d} K={K:3d}  {pps/1e3:8.1f}k ph/s  steps={steps}",
              flush=True)


if __name__ == "__main__":
    main()
