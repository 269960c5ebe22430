"""Scaling of the non-deposit megastep cost with B and K, plus the
fori_loop per-iteration floor on this backend."""

import sys
import os
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
from _timing import timed  # noqa: E402


def main():
    from bench import bench_case
    from rsmcrt_tpu.transport.engine import (
        TransportConfig, init_carry, transport_step,
    )

    N = 64
    key = jax.random.key(0)

    # per-iteration floor: trivial bodies
    @jax.jit
    def empty(c):
        return jax.lax.fori_loop(0, N, lambda i, c: c + 1.0, c)
    t = timed(empty, jnp.zeros(())) / N
    print(f"fori floor scalar carry : {t*1e3:8.3f} ms/iter")

    big = jnp.zeros((32768, 32), jnp.float32)

    @jax.jit
    def passthru(c):
        s, b = c
        return jax.lax.fori_loop(0, N, lambda i, c: (c[0] + 1.0, c[1]), c)
    t = timed(passthru, (jnp.zeros(()), big)) / N
    print(f"fori floor big carry    : {t*1e3:8.3f} ms/iter")

    @jax.jit
    def touch(c):
        s, b = c
        return jax.lax.fori_loop(
            0, N, lambda i, c: (c[0] + 1.0, c[1] * 1.0001), c)
    t = timed(touch, (jnp.zeros(()), big)) / N
    print(f"fori touch [32768,32]   : {t*1e3:8.3f} ms/iter")

    scene, grid, src = bench_case()

    def steps_fn(cfg):
        @jax.jit
        def run(carry):
            def body(_, c):
                return transport_step(c, scene, src, grid, key, cfg,
                                      jnp.asarray(1 << 30, jnp.int32))
            return jax.lax.fori_loop(0, N, body, carry)
        return run

    for B in (16384, 32768, 65536, 131072):
        cfg = TransportConfig(nphotons=1 << 30, n_lanes=B, dda_substeps=16,
                              record_fluence=False)
        t = timed(steps_fn(cfg), init_carry(grid, cfg)) / N
        print(f"no-fluence B={B:6d} K=16: {t*1e3:8.3f} ms "
              f"({t/B*1e9:6.2f} ns/lane)")

    for K in (8, 32, 64):
        cfg = TransportConfig(nphotons=1 << 30, n_lanes=32768,
                              dda_substeps=K, record_fluence=False)
        t = timed(steps_fn(cfg), init_carry(grid, cfg)) / N
        print(f"no-fluence B=32768 K={K:2d}: {t*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
