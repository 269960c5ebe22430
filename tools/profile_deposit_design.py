"""Measure the primitives for a Pallas/MXU deposition kernel design.

Candidates to replace the per-megastep XLA scatter-add of [B*K] deposits
into the 200^3 fluence grid (the measured ~10 ns/element wall):
  1. baseline scatter-add (current engine path)
  2. jnp.sort of packed (tileid | slot) int32 keys + payload gathers
  3. the MXU one-hot two-sided matmul that accumulates C deposits into a
     [H, 128] tile: acc += onehot_hi(idx).T * val @ onehot_lo(idx)
  4. pallas_call sanity on this backend

Per-dispatch axon tunnel latency is ~30 ms, so each candidate runs M
iterations inside a single jitted fori_loop (like the real engine's
megastep loop) and we report (t(M) - t(0-ish)) / M.  A host read inside
the timed region forces synchronization.
"""

import time

import jax
import jax.numpy as jnp

M = 64


def timed_loop(body, init, iters=3):
    """body: carry -> carry, run M times inside one dispatch."""

    @jax.jit
    def run(c):
        return jax.lax.fori_loop(0, M, lambda i, c: body(c), c)

    run(init)  # compile
    out = run(init)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(init)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    return (time.perf_counter() - t0) / iters / M


def main():
    B, K = 32768, 16
    N = B * K
    G = 200 * 200 * 200
    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    idx = jax.random.randint(k1, (N,), 0, G, dtype=jnp.int32)
    val = jax.random.uniform(k2, (N,), jnp.float32)
    grid = jnp.zeros((G,), jnp.float32)

    # null loop: carry churn baseline
    t_null = timed_loop(lambda c: (c[0], c[1] + 1.0, c[2]),
                        (grid, val, idx))
    print(f"null loop        : {t_null*1e3:8.3f} ms/iter")

    # 1. baseline scatter
    t = timed_loop(lambda c: (c[0].at[c[2]].add(c[1]), c[1], c[2]),
                   (grid, val, idx))
    print(f"scatter-add  N={N}: {t*1e3:8.3f} ms ({t/N*1e9:.2f} ns/elem)")

    # 2. sort + gather.  tile id fits 8 bits (169 tiles), slot 19 bits.
    n_tiles = 169
    tileid = idx % n_tiles

    def body_sort(c):
        g, v, i, tid = c
        packed = tid * (1 << 19) + jnp.arange(N, dtype=jnp.int32)
        s = jnp.sort(packed)
        order = s & ((1 << 19) - 1)
        return g + 1.0, v[order], i[order], tid

    t = timed_loop(body_sort, (grid, val, idx, tileid))
    print(f"sort+2 gathers   : {t*1e3:8.3f} ms")

    # histogram of tile ids (for chunk offsets) + cumsum
    def body_hist(c):
        g, tid = c
        oh = (tid[:, None] == jnp.arange(n_tiles)[None, :])
        h = jnp.sum(oh.astype(jnp.float32), axis=0)
        return g + jnp.cumsum(h)[-1], tid

    t = timed_loop(body_hist, (jnp.zeros(()), tileid))
    print(f"tile histogram   : {t*1e3:8.3f} ms")

    # 3. MXU two-sided one-hot accumulation, batched over chunks
    C = 1024
    H = 400  # tile = 16x16x200 = 51200 = 400*128
    nchunk = N // C
    local = idx % (H * 128)
    hi = (local // 128).reshape(nchunk, C)
    lo = (local % 128).reshape(nchunk, C)
    vc = val.reshape(nchunk, C)

    def mk_mxu(dt):
        def body(c):
            acc, hi, lo, vc = c
            ohi = (hi[..., None] == jnp.arange(H)[None, None, :]).astype(
                dt) * vc[..., None].astype(dt)
            olo = (lo[..., None] == jnp.arange(128)[None, None, :]).astype(dt)
            acc = acc + jnp.einsum("nch,ncw->nhw", ohi, olo,
                                   preferred_element_type=jnp.float32)
            return acc, hi, lo, vc
        return body

    acc0 = jnp.zeros((nchunk, H, 128), jnp.float32)
    macs = nchunk * C * H * 128
    t = timed_loop(mk_mxu(jnp.float32), (acc0, hi, lo, vc))
    print(f"mxu onehot f32   : {t*1e3:8.3f} ms ({macs/t/1e12:.1f} Tmac/s)")
    t = timed_loop(mk_mxu(jnp.bfloat16), (acc0, hi, lo, vc))
    print(f"mxu onehot bf16  : {t*1e3:8.3f} ms ({macs/t/1e12:.1f} Tmac/s)")

    # one-hot building alone (VPU cost)
    def body_oh(c):
        s, hi, vc = c
        ohi = (hi[..., None] == jnp.arange(H)[None, None, :]).astype(
            jnp.float32) * vc[..., None]
        return s + jnp.sum(ohi), hi, vc

    t = timed_loop(body_oh, (jnp.zeros(()), hi, vc))
    print(f"onehot build only: {t*1e3:8.3f} ms")

    # 4. pallas matmul-accumulate prototype: grid over chunks, VMEM acc
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def kern(hi_ref, lo_ref, v_ref, o_ref, acc):
            c = pl.program_id(0)

            @pl.when(c == 0)
            def _():
                acc[:] = jnp.zeros_like(acc)

            hi = hi_ref[0]  # [C]
            lo = lo_ref[0]
            v = v_ref[0]
            ohi = (hi[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (C, H), 1)).astype(jnp.float32) * v[:, None]
            olo = (lo[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (C, 128), 1)).astype(jnp.float32)
            acc[:] += jax.lax.dot_general(
                ohi, olo, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

            @pl.when(c == pl.num_programs(0) - 1)
            def _():
                o_ref[:] = acc[:]

        f = pl.pallas_call(
            kern,
            grid=(nchunk,),
            in_specs=[
                pl.BlockSpec((1, C), lambda c: (c, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda c: (c, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda c: (c, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((H, 128), lambda c: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((H, 128), jnp.float32)],
        )

        def body_pl(c):
            s, hi, lo, vc = c
            out = f(hi, lo, vc)
            return s + out, hi, lo, vc

        t = timed_loop(body_pl, (jnp.zeros((H, 128)), hi, lo, vc))
        print(f"pallas mxu accum : {t*1e3:8.3f} ms ({macs/t/1e12:.1f} Tmac/s)")
    except Exception as e:  # noqa: BLE001
        print("pallas FAILED:", repr(e))


if __name__ == "__main__":
    main()
