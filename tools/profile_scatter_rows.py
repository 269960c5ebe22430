"""Row-scatter cost model: is XLA scatter-add per-ROW or per-SCALAR?

The deposit wall (STATUS.md roofline) is the ~10 ns/scalar XLA scatter.
If scattering an [N, w] row block into a [Gb, w] block-major target costs
~per-row rather than per-scalar, the fluence grid can be stored
block-major (2x2x2 or 4x4x4 voxel blocks) and the chained DDA can flush
one dense row per block-run (~3-6 voxel steps stay inside a block),
cutting scatter rows 3-6x.

Also measures row GATHER (for compaction schemes) and int16 vs int32
indices.
"""
import argparse
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
from _timing import timed  # noqa: E402


def run_case(N, w, Gb, iters):
    key = jax.random.key(1)
    rows = jax.random.randint(key, (N,), 0, Gb)
    vals = jax.random.uniform(jax.random.key(2), (N, w), jnp.float32)

    @jax.jit
    def scat(g, r, v):
        def it(i, g):
            ri = (r + i) % Gb
            return g.at[ri].add(v)
        return jax.lax.fori_loop(0, iters, it, g)

    g0 = jnp.zeros((Gb, w), jnp.float32)
    t = timed(scat, g0, rows, vals) / iters
    return t


def run_gather(N, w, Gb, iters):
    rows = jax.random.randint(jax.random.key(1), (N,), 0, Gb)
    g = jax.random.uniform(jax.random.key(2), (Gb, w), jnp.float32)

    @jax.jit
    def gath(g, r):
        def it(i, acc):
            ri = (r + i) % Gb
            return acc + jnp.sum(g[ri], axis=0)
        return jax.lax.fori_loop(0, iters, it, jnp.zeros((w,), jnp.float32))

    t = timed(gath, g, rows) / iters
    return t


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-n", type=int, default=8, help="iters per timing")
    args = p.parse_args()
    G_SCAL = 200 ** 3

    print("=== scatter-add rows: [N,w] updates into [G/w, w] target ===")
    print(f"{'w':>4} {'N':>9} {'ms':>9} {'ns/row':>8} {'ns/elem':>8}")
    for w in (1, 2, 8, 64, 128, 256):
        Gb = max(G_SCAL // max(w, 1), 1024)
        for N in (32768, 262144, 1048576):
            if w == 1:
                # scalar baseline via [N] indexing (engine path)
                key = jax.random.key(1)
                rows = jax.random.randint(key, (N,), 0, Gb)
                vals = jax.random.uniform(jax.random.key(2), (N,),
                                          jnp.float32)

                @jax.jit
                def scat(g, r, v):
                    def it(i, g):
                        ri = (r + i) % Gb
                        return g.at[ri].add(v)
                    return jax.lax.fori_loop(0, args.n, it, g)

                g0 = jnp.zeros((Gb,), jnp.float32)
                t = timed(scat, g0, rows, vals) / args.n
            else:
                t = run_case(N, w, Gb, args.n)
            print(f"{w:>4} {N:>9} {t*1e3:9.3f} {t/N*1e9:8.1f} "
                  f"{t/(N*w)*1e9:8.2f}", flush=True)

    print("=== row gather: [N] rows from [G/w, w] ===")
    for w in (8, 64, 128):
        Gb = max(G_SCAL // w, 1024)
        for N in (262144,):
            t = run_gather(N, w, Gb, args.n)
            print(f"{w:>4} {N:>9} {t*1e3:9.3f} {t/N*1e9:8.1f} ns/row",
                  flush=True)


if __name__ == "__main__":
    main()
