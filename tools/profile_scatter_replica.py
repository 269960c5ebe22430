"""Design probe: multi-replica scatter (VERDICT r3 design (d)).

Split the deposit stream into R independent scatters against R replica
grids, then tree-add the replicas.  On a single TPU core all R scatters
run back-to-back on the same serialized scatter unit, so the prediction
is no gain (R x fixed cost + same per-row total + dense adds); this
measures it.
"""
import argparse
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
from _timing import timed  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-N", type=int, default=1048576)
    p.add_argument("-G", type=int, default=200 ** 3)
    p.add_argument("-n", type=int, default=8)
    args = p.parse_args()
    N, G, it = args.N, args.G, args.n
    idx = jax.random.randint(jax.random.key(1), (N,), 0, G, jnp.int32)
    val = jax.random.uniform(jax.random.key(2), (N,), jnp.float32)

    for R in (1, 2, 4):
        @jax.jit
        def run(g, f, v, R=R):
            def body(i, g):
                fi = (f + i) % G
                parts = [
                    jnp.zeros((G,), jnp.float32)
                    .at[fi[k::R]].add(v[k::R])
                    for k in range(R)
                ] if R > 1 else None
                if R == 1:
                    return g.at[fi].add(v)
                acc = parts[0]
                for prt in parts[1:]:
                    acc = acc + prt
                return g + acc
            return jax.lax.fori_loop(0, it, body, g)

        g0 = jnp.zeros((G,), jnp.float32)
        t = timed(run, g0, idx, val) / it
        print(f"replicas R={R}: {t*1e3:9.3f} ms  {t/N*1e9:6.2f} ns/elem",
              flush=True)


if __name__ == "__main__":
    main()
