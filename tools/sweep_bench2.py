"""Phase-resolved bench: time in full-width phase vs straggler tail."""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp


def run_one(M, K, B, nphotons, chunk=128):
    from bench import bench_case
    from rsmcrt_tpu.transport.engine import (
        TransportConfig, simulate, warmup,
    )

    scene, grid, src = bench_case()
    cfg = TransportConfig(nphotons=nphotons, n_lanes=B, dda_substeps=K,
                          march_iters=M)
    warmup(scene, src, grid, jax.random.key(0), cfg, chunk_steps=chunk,
           min_lanes=512)

    events = []
    t0 = time.perf_counter()

    def prog(launched, target, step, carry):
        n_alive = int(jnp.sum(carry.state.alive))
        events.append((time.perf_counter() - t0, launched, step, n_alive,
                       carry.state.alive.shape[0]))

    tallies, _, launched, steps = simulate(
        scene, src, grid, jax.random.key(1), cfg, nphotons=nphotons,
        min_lanes=512, chunk_steps=chunk, progress=prog)
    jax.block_until_ready(tallies.jmean)
    dt = time.perf_counter() - t0

    # phase split: first event where launched >= target
    t_full = next((t for t, l, s, a, b in events if l >= nphotons), dt)
    s_full = next((s for t, l, s, a, b in events if l >= nphotons), steps)
    print(f"M={M} K={K} B={B} n={nphotons}: total {dt:.2f}s "
          f"({int(launched)/dt/1e3:.1f}k ph/s) | full-width {t_full:.2f}s "
          f"{s_full} steps | tail {dt-t_full:.2f}s {int(steps)-s_full} steps")
    import numpy as np
    p = np.asarray(tallies.perf) / int(launched)
    print(f"  per photon: deposits {p[0]:.1f}  alive-steps {p[1]:.1f}  "
          f"analyses {p[2]:.1f}  interactions {p[3]:.1f}  "
          f"slot-util {p[0]/(p[1]*K):.2f}")
    for t, l, s, a, b in events:
        print(f"  t={t:7.2f}s launched={l:8d} step={s:6d} alive={a:6d} B={b}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-B", type=int, default=32768)
    p.add_argument("-n", type=int, default=200_000)
    p.add_argument("-M", type=int, default=4)
    p.add_argument("-K", type=int, default=8)
    args = p.parse_args()
    run_one(args.M, args.K, args.B, args.n)


if __name__ == "__main__":
    main()
