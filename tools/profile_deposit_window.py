"""Benchmark deposit_window_packed (rep-anchored window Pallas kernel)
vs the XLA scatter and the fixed-supertile deposit_delta kernel on the
realistic bench workload (diffusion-ball lanes, K deposits along a ray,
~60% live slots), plus the lane-level 3D-Morton sort the engine adds.

Run on the TPU: PYTHONPATH=/root/repo:/root/.axon_site python
tools/profile_deposit_window.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from rsmcrt_tpu.transport.deposit import (
    deposit_delta, deposit_window_packed, morton_key_3d, pack_deposit_key,
)

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
    val[rng.uniform(size=(B, K)) > 0.6] = 0.0
    return lane, vox, val


def main():
    n = 200
    lane, vox, val = make_deposits(n=n)
    B, K = val.shape
    G = n * n * n

    # lane-level 3D Morton sort (what the engine does per megastep)
    lkey = morton_key_3d(jnp.asarray(lane[:, 0]), jnp.asarray(lane[:, 1]),
                         jnp.asarray(lane[:, 2]))
    order = np.asarray(jnp.argsort(lkey))
    vox_s, val_s = vox[order], val[order]

    x = jnp.asarray(vox_s[..., 0].reshape(-1))
    y = jnp.asarray(vox_s[..., 1].reshape(-1))
    z = jnp.asarray(vox_s[..., 2].reshape(-1))
    v = jnp.asarray(val_s.reshape(-1))
    flat = (x * n + y) * n + z
    keys = pack_deposit_key(x, y, z, v > 0.0)

    t = timed_loop(
        lambda c: (c[0].at[flat].add(jnp.where(v > 0, v, 0.0)), c[1] + 1),
        (jnp.zeros((G,), jnp.float32), jnp.zeros(())))
    print(f"xla scatter               : {t*1e3:7.3f} ms")

    t = timed_loop(
        lambda c: (c[0] + deposit_delta(
            (n, n, n), x, y, z, v, chunk=2048).reshape(-1), c[1] + 1),
        (jnp.zeros((G,), jnp.float32), jnp.zeros(())))
    print(f"supertile C=2048 f32      : {t*1e3:7.3f} ms")

    for C, win, dt in [
        (1024, (16, 16, 16), jnp.float32),
        (1024, (32, 32, 32), jnp.float32),
        (2048, (32, 32, 32), jnp.float32),
        (2048, (32, 32, 32), jnp.bfloat16),
        (2048, (32, 32, 16), jnp.float32),
        (4096, (32, 32, 32), jnp.float32),
        (4096, (48, 48, 32), jnp.float32),
        (4096, (32, 32, 32), jnp.bfloat16),
    ]:
        try:
            t = timed_loop(
                lambda c: (c[0] + deposit_window_packed(
                    (n, n, n), keys, v, chunk=C, window=win,
                    dot_dtype=dt).reshape(-1), c[1] + 1),
                (jnp.zeros((G,), jnp.float32), jnp.zeros(())))
            print(f"window C={C:4d} w={win} {jnp.dtype(dt).name[:4]}"
                  f": {t*1e3:7.3f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"window C={C:4d} w={win}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}")

    # correctness on-device (f32)
    got = deposit_window_packed((n, n, n), keys, v).reshape(-1)
    want = jnp.zeros((G,), jnp.float32).at[flat].add(
        jnp.where(v > 0, v, 0.0))
    err = float(jnp.max(jnp.abs(got - want)))
    print("max |window - scatter| =", err)

    # engine-side sort cost: argsort [B] lane keys + gather of the
    # [B, K+1] packed-key and value rows
    keys_rows = jnp.asarray(
        pack_deposit_key(jnp.asarray(vox[..., 0]), jnp.asarray(vox[..., 1]),
                         jnp.asarray(vox[..., 2]),
                         jnp.asarray(val) > 0.0))
    val_rows = jnp.asarray(val)
    lk = jnp.asarray(np.asarray(lkey))

    def body(c):
        k, kr, vr = c
        o = jnp.argsort(k)
        return k[o] + 1, kr[o], vr[o]

    t = timed_loop(body, (lk, keys_rows, val_rows))
    print(f"lane argsort + row gathers: {t*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
