"""Row-scatter cost model, part 2: width limits, sortedness, duplicates.

Follow-up to profile_scatter_rows.py (which established ~flat per-row
cost for w in 64..256).  Questions:
- does flatness extend to w = 512 / 1024?
- do SORTED row indices scatter faster (XLA specialization)?
- do heavy duplicates (few distinct rows) change the cost?
- fixed per-call overhead with a pure precomputed index stream.
"""
import argparse
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
from _timing import timed  # noqa: E402

G_SCAL = 200 ** 3


def bench(rows, vals, Gb, w, iters, label):
    @jax.jit
    def scat(g, r, v):
        def it(i, g):
            return g.at[r].add(v + jnp.asarray(i, v.dtype))
        return jax.lax.fori_loop(0, iters, it, g)

    shape = (Gb,) if w == 1 else (Gb, w)
    g0 = jnp.zeros(shape, jnp.float32)
    t = timed(scat, g0, rows, vals) / iters
    N = rows.shape[0]
    print(f"{label:28s} w={w:5d} N={N:8d} {t*1e3:9.3f} ms "
          f"{t/N*1e9:8.1f} ns/row", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-n", type=int, default=8)
    args = p.parse_args()
    it = args.n

    for w in (256, 512, 1024):
        Gb = max(G_SCAL // w, 1024)
        for N in (262144, 1048576):
            rows = jax.random.randint(jax.random.key(1), (N,), 0, Gb)
            vals = jax.random.uniform(jax.random.key(2), (N, w),
                                      jnp.float32)
            bench(rows, vals, Gb, w, it, "width sweep")

    # sorted vs unsorted, w=64 and w=1
    for w in (1, 64):
        Gb = max(G_SCAL // w, 1024)
        N = 1048576
        rows = jax.random.randint(jax.random.key(1), (N,), 0, Gb)
        shape = (N,) if w == 1 else (N, w)
        vals = jax.random.uniform(jax.random.key(2), shape, jnp.float32)
        bench(rows, vals, Gb, w, it, "unsorted")
        bench(jnp.sort(rows), vals, Gb, w, it, "sorted")

    # heavy duplicates: all rows land in 64 distinct targets
    for w in (1, 64):
        Gb = max(G_SCAL // w, 1024)
        N = 1048576
        rows = jax.random.randint(jax.random.key(1), (N,), 0, 64)
        shape = (N,) if w == 1 else (N, w)
        vals = jax.random.uniform(jax.random.key(2), shape, jnp.float32)
        bench(rows, vals, Gb, w, it, "dup-64-targets")

    # garbage-row pattern: 60% of rows point at one sentinel row
    w, Gb, N = 64, G_SCAL // 64, 1048576
    rows = jax.random.randint(jax.random.key(1), (N,), 0, Gb)
    mask = jax.random.uniform(jax.random.key(3), (N,)) < 0.6
    rows = jnp.where(mask, Gb - 1, rows)
    vals = jnp.where(mask[:, None], 0.0,
                     jax.random.uniform(jax.random.key(2), (N, w)))
    bench(rows, vals, Gb, w, it, "60pct-sentinel")


if __name__ == "__main__":
    main()
