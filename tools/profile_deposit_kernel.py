"""Benchmark deposit_delta (Pallas) vs XLA scatter on realistic deposits.

Simulates the bench workload: B lanes at positions drawn from a diffusion
ball inside a 200^3 grid, each emitting K deposits along a random ray,
~60% of slots valid.  Compares the sorted (engine behaviour) and unsorted
chunk locality, and the cost of the sort itself.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from rsmcrt_tpu.transport.deposit import deposit_delta, morton_key_xy

M = 32


def timed_loop(body, init, iters=3):
    @jax.jit
    def run(c):
        return jax.lax.fori_loop(0, M, lambda i, c: body(c), c)

    run(init)
    out = run(init)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(init)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    return (time.perf_counter() - t0) / iters / M


def make_deposits(B=32768, K=16, n=200, sigma=35.0, seed=0):
    rng = np.random.default_rng(seed)
    c = n / 2
    lane = np.clip(rng.normal(c, sigma, (B, 3)), 1, n - 2).astype(np.int32)
    d = rng.normal(size=(B, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    steps = np.arange(K)
    vox = np.clip(
        lane[:, None, :] + np.round(d[:, None, :] * steps[None, :, None]),
        0, n - 1,
    ).astype(np.int32)
    val = rng.uniform(0.001, 0.01, (B, K)).astype(np.float32)
    val[rng.uniform(size=(B, K)) > 0.6] = 0.0  # ~60% slot utilisation
    return vox, val


def main():
    n = 200
    vox, val = make_deposits(n=n)
    B, K = val.shape
    key = morton_key_xy(jnp.asarray(vox[:, 0, 0]), jnp.asarray(vox[:, 0, 1]))
    order = np.asarray(jnp.argsort(key))
    vox_s, val_s = vox[order], val[order]

    G = n * n * n
    for name, (vx, vl) in [("sorted", (vox_s, val_s)),
                           ("unsorted", (vox, val))]:
        x = jnp.asarray(vx[..., 0].reshape(-1))
        y = jnp.asarray(vx[..., 1].reshape(-1))
        z = jnp.asarray(vx[..., 2].reshape(-1))
        v = jnp.asarray(vl.reshape(-1))

        flat = (x * n + y) * n + z
        t = timed_loop(
            lambda c: (c[0].at[flat].add(v), c[1] + 1),
            (jnp.zeros((G,), jnp.float32), jnp.zeros(())),
        )
        print(f"scatter   {name:9s}: {t*1e3:7.3f} ms")

        if name == "unsorted":
            combos = [(2048, 16, 16, jnp.float32)]
        else:
            combos = [
                (1024, 16, 16, jnp.float32),
                (2048, 16, 16, jnp.float32),
                (4096, 16, 16, jnp.float32),
                (2048, 16, 16, jnp.bfloat16),
                (4096, 16, 16, jnp.bfloat16),
                (2048, 8, 16, jnp.float32),
                (2048, 16, 8, jnp.float32),
                (2048, 32, 32, jnp.float32),
            ]
        for chunk, tx, ty, dt in combos:
            t = timed_loop(
                lambda c: (c[0] + deposit_delta(
                    (n, n, n), x, y, z, v, chunk=chunk, tx=tx, ty=ty,
                    dot_dtype=dt).reshape(-1),
                    c[1] + 1),
                (jnp.zeros((G,), jnp.float32), jnp.zeros(())),
            )
            print(f"pallas C={chunk:4d} t={tx}x{ty} "
                  f"{jnp.dtype(dt).name[:4]} {name:9s}: {t*1e3:7.3f} ms")

    # correctness on-device
    x = jnp.asarray(vox_s[..., 0].reshape(-1))
    y = jnp.asarray(vox_s[..., 1].reshape(-1))
    z = jnp.asarray(vox_s[..., 2].reshape(-1))
    v = jnp.asarray(val_s.reshape(-1))
    got = deposit_delta((n, n, n), x, y, z, v).reshape(-1)
    want = jnp.zeros((G,), jnp.float32).at[(x * n + y) * n + z].add(
        jnp.where(v > 0, v, 0.0))
    err = float(jnp.max(jnp.abs(got - want)))
    print("max |pallas - scatter| =", err)

    # sort cost (argsort + row-gather of the deposit arrays)
    vox_j = jnp.asarray(vox.reshape(B, K * 3))
    val_j = jnp.asarray(val)
    key0 = jnp.asarray(np.asarray(key))

    def body(c):
        k, vj, vlj = c
        o = jnp.argsort(k)
        return k[o] + 1, vj[o], vlj[o]

    t = timed_loop(body, (key0, vox_j, val_j))
    print(f"argsort + deposit-row gathers: {t*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
