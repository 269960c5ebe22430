"""Microbenchmark of XLA scatter-add variants on TPU.

Questions: is scatter cost per-element or per-byte (bf16 vs f32)?  Does
the target buffer size matter?  Does a fresh-buffer scatter + dense add
beat accumulating scatter?
"""
import argparse
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
from _timing import timed  # noqa: E402  (forces a host read per timing)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-M", type=int, default=524288, help="updates")
    p.add_argument("-G", type=int, default=200**3, help="bins")
    p.add_argument("-n", type=int, default=20, help="iters per timing")
    args = p.parse_args()
    M, G, N = args.M, args.G, args.n
    key = jax.random.key(0)
    flat = jax.random.randint(key, (M,), 0, G)
    vals = jax.random.uniform(key, (M,), jnp.float32)

    def loop(body, init):
        # indices/values must vary per iteration or XLA hoists the
        # scatter out of the loop entirely
        @jax.jit
        def run(x, f, v):
            def it(i, g):
                fi = (f + i) % f.shape[0]
                vi = v + jnp.asarray(i, v.dtype) * jnp.asarray(1e-6, v.dtype)
                return body(g, fi, vi)
            return jax.lax.fori_loop(0, N, it, x)
        return run

    for name, dtype in [("f32", jnp.float32), ("bf16", jnp.bfloat16),
                        ("f16", jnp.float16)]:
        g0 = jnp.zeros((G,), dtype)
        v = vals.astype(dtype)
        run = loop(lambda g, f, vv: g.at[f].add(vv), g0)
        t = timed(run, g0, flat, v) / N
        print(f"scatter-add {name:5s} M={M} G={G}: {t*1e3:8.3f} ms "
              f"({t/M*1e9:.2f} ns/elem)")

    # smaller target
    for Gs in (64**3, 32**3):
        g0 = jnp.zeros((Gs,), jnp.float32)
        f2 = jax.random.randint(key, (M,), 0, Gs)
        run = loop(lambda g, f, vv: g.at[f].add(vv), g0)
        t = timed(run, g0, f2, vals) / N
        print(f"scatter-add f32  M={M} G={Gs}: {t*1e3:8.3f} ms "
              f"({t/M*1e9:.2f} ns/elem)")

    # scatter into fresh buffer + dense add
    @jax.jit
    def fresh(gacc, f, v):
        def body(i, g):
            fi = (f + i) % f.shape[0]
            staged = jnp.zeros((G,), jnp.float32).at[fi].add(v)
            return g + staged
        return jax.lax.fori_loop(0, N, body, gacc)
    g0 = jnp.zeros((G,), jnp.float32)
    t = timed(fresh, g0, flat, vals) / N
    print(f"fresh-buffer + add f32: {t*1e3:8.3f} ms")

    # half the updates (utilization experiment)
    run = loop(lambda g, f, vv: g.at[f].add(vv), None)
    for frac in (2, 4):
        Mi = M // frac
        t = timed(run, jnp.zeros((G,), jnp.float32), flat[:Mi],
                  vals[:Mi]) / N
        print(f"scatter-add f32  M={Mi} G={G}: {t*1e3:8.3f} ms "
              f"({t/Mi*1e9:.2f} ns/elem)")


if __name__ == "__main__":
    main()
