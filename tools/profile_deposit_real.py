"""Replay REAL bench-scene wavefront deposits through the deposition
candidates.  Captures live carries from a bench-scene run via the
progress callback, reconstructs each lane's next-megastep voxel
crossings (the DDA stream), and measures XLA scatter vs the Pallas
supertile kernel on the true spatial distribution."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

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


def crossings_numpy(pos, dirs, walk, weight, alive, n, K=16):
    """Reproduce the closed-form DDA voxel stream (engine phase 2)."""
    B = pos.shape[0]
    half = 1.0
    dv = 2.0 * half / n
    pc = pos + half
    cell = np.floor(pc / dv)
    safe_d = np.where(dirs == 0.0, 1.0, dirs)
    t_up = ((cell + 1.0) * dv - pc) / safe_d
    t_dn = (cell * dv - pc) / safe_d
    big = 3.4e38
    t0_ax = np.where(dirs > 0.0, t_up, np.where(dirs < 0.0, t_dn, big))
    t0_ax = np.maximum(t0_ax, 0.0)
    dt_ax = np.where(dirs == 0.0, big, dv / np.abs(safe_d))
    walk = np.where(alive & (walk > 0.0), walk, 0.0)
    t_next = np.minimum(t0_ax, big)
    cuts = np.zeros((B, K), np.float64)
    for k in range(K):
        c = t_next.min(axis=-1)
        sel = t_next == c[:, None]
        first = np.cumsum(sel, axis=-1) == 1
        t_next = np.minimum(t_next + np.where(sel & first, dt_ax, 0.0),
                            big)
        cuts[:, k] = c
    cuts = np.where(cuts < walk[:, None], cuts, big)
    end = np.minimum(np.where(cuts[:, K - 1] < big, cuts[:, K - 1], walk),
                     walk)
    lo = np.concatenate([np.zeros((B, 1)), cuts[:, :K - 1]], axis=1)
    hi = np.minimum(np.where(cuts < big, cuts, walk[:, None]),
                    walk[:, None])
    hi[:, K - 1] = end
    lengths = np.maximum(hi - lo, 0.0)
    mids = pos[:, None, :] + dirs[:, None, :] * (0.5 * (lo + hi))[..., None]
    vox = np.floor((mids + half) / dv).astype(np.int32)
    valid = np.all((vox >= 0) & (vox < n), axis=-1)
    val = np.where(valid & (lengths > 0), lengths * weight[:, None], 0.0)
    vox = np.clip(vox, 0, n - 1)
    return vox, val.astype(np.float32)


def main():
    from bench import bench_case
    from rsmcrt_tpu.transport.engine import TransportConfig, simulate
    from rsmcrt_tpu.transport.deposit import deposit_delta, morton_key_xy

    scene, grid, src = bench_case()
    n = 200
    cfg = TransportConfig(nphotons=300_000, n_lanes=32768, dda_substeps=16)
    captures = []

    def progress(launched, target, step, carry):
        if len(captures) < 3 and carry.state.pos.shape[0] == 32768:
            st = carry.state
            captures.append((np.asarray(st.pos), np.asarray(st.dir),
                             np.asarray(st.seg_rem),
                             np.asarray(st.weight),
                             np.asarray(st.alive)))

    simulate(scene, src, grid, jax.random.key(1), cfg, chunk_steps=48,
             progress=progress, tail_shrink=False, nphotons=300_000)

    G = n * n * n
    for ci, (pos, dirs, seg, w, alive) in enumerate(captures):
        # lanes whose segment continues this step may have seg_rem=0
        # (need analysis); give those a fresh pseudo-walk along dir so the
        # stream is representative of a walk step
        vox, val = crossings_numpy(pos.astype(np.float64),
                                   dirs.astype(np.float64),
                                   np.where(seg > 0, seg, 0.16), w,
                                   alive, n)
        util = float((val > 0).mean())
        key = morton_key_xy(jnp.asarray(vox[:, 0, 0]),
                            jnp.asarray(vox[:, 0, 1]))
        order = np.asarray(jnp.argsort(key))
        vox_s, val_s = vox[order], val[order]

        # tile-per-chunk stats
        x = vox_s[..., 0].reshape(-1)
        y = vox_s[..., 1].reshape(-1)
        live = val_s.reshape(-1) > 0
        stile = np.where(live, (x // 16) * 13 + (y // 16), -1)
        for C in (1024, 2048):
            st = stile.reshape(-1, C)
            r = [len(np.unique(row[row >= 0])) for row in st]
            print(f"cap{ci} util={util:.2f} C={C}: "
                  f"rounds mean {np.mean(r):.2f} p90 "
                  f"{np.percentile(r, 90):.0f}")

        xs = jnp.asarray(x)
        ys = jnp.asarray(y)
        zs = jnp.asarray(vox_s[..., 2].reshape(-1))
        vs = jnp.asarray(val_s.reshape(-1))
        flat = (xs * n + ys) * n + zs

        t = timed_loop(
            lambda c: (c[0].at[flat].add(jnp.where(vs > 0, vs, 0.0)),
                       c[1] + 1),
            (jnp.zeros((G,), jnp.float32), jnp.zeros(())))
        print(f"  scatter        : {t*1e3:7.3f} ms")
        for C, dt in ((1024, jnp.float32), (2048, jnp.float32),
                      (2048, jnp.bfloat16)):
            t = timed_loop(
                lambda c: (c[0] + deposit_delta(
                    (n, n, n), xs, ys, zs, vs, chunk=C,
                    dot_dtype=dt).reshape(-1), c[1] + 1),
                (jnp.zeros((G,), jnp.float32), jnp.zeros(())))
            print(f"  pallas C={C} {jnp.dtype(dt).name[:4]}: "
                  f"{t*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
