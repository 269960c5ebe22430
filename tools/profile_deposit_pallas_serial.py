"""Design probe: Pallas serial scatter into a VMEM-resident fluence grid.

The XLA scatter-add is row-serialized at ~12.7 ns/row (profile_scatter_rows).
This kernel tests whether a hand-written Mosaic loop doing the same serial
random-index RMW against a VMEM-resident [G] f32 grid can beat that rate
(i.e. whether XLA's per-row constant is loop overhead we can shave, or the
hardware floor for dependent dynamic VMEM accesses).

Grid lives fully in VMEM (200^3 f32 = 32 MB fits on v5e, proven by
transport/deposit.py); deposits stream through in VMEM blocks.
"""
import argparse
import functools
import os
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(__file__))
from _timing import timed  # noqa: E402


def _kernel(idx_ref, val_ref, grid_ref, *, n_per_block, unroll):
    """grid_ref is [G/128, 128]; each deposit RMWs one (1,128) row with a
    one-hot add (Mosaic forbids scalar VMEM stores -- VMEM access is
    vector-granule, the same reason the XLA scatter is ~10 ns/row)."""
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        grid_ref[:] = jnp.zeros_like(grid_ref)

    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def body(i, _):
        base = i * unroll
        for u in range(unroll):
            j = base + u
            k = idx_ref[0, j]  # scalar read from SMEM
            row = k // 128
            col = k - row * 128
            oh = jnp.where(lanes == col, val_ref[0, j], 0.0)
            grid_ref[pl.ds(row, 1), :] = grid_ref[pl.ds(row, 1), :] + oh
        return 0

    jax.lax.fori_loop(0, n_per_block // unroll, body, 0)


@functools.partial(jax.jit, static_argnames=("G", "block", "unroll"))
def serial_deposit(idx, val, G, block=4096, unroll=8):
    N = idx.shape[0]
    nblk = N // block
    Gr = -(-G // 128)
    return pl.pallas_call(
        functools.partial(_kernel, n_per_block=block, unroll=unroll),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, block), lambda c: (0, c),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block), lambda c: (0, c),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Gr, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(110 * 2 ** 20)
        ),
    )(idx.reshape(1, -1), val.reshape(1, -1))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-N", type=int, default=1048576)
    p.add_argument("-G", type=int, default=200 ** 3)
    p.add_argument("--interpret", action="store_true")
    args = p.parse_args()
    N, G = args.N, args.G
    idx = jax.random.randint(jax.random.key(1), (N,), 0, G, jnp.int32)
    val = jax.random.uniform(jax.random.key(2), (N,), jnp.float32)

    if args.interpret:
        small_n, small_g = 4096, 1024
        i2, v2 = idx[:small_n] % small_g, val[:small_n]
        out = pl.pallas_call(
            functools.partial(_kernel, n_per_block=small_n, unroll=8),
            grid=(1,),
            in_specs=[pl.BlockSpec((1, small_n), lambda c: (0, c),
                                   memory_space=pltpu.SMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((small_g // 128, 128),
                                           jnp.float32),
            interpret=True,
        )(i2.reshape(1, -1), v2.reshape(1, -1))
        ref = jnp.zeros(small_g).at[i2].add(v2).reshape(-1, 128)
        print("exact:", bool(jnp.allclose(out, ref, atol=1e-4)),
              float(jnp.max(jnp.abs(out - ref))))
        return

    for unroll in (4, 8, 16):
        t = timed(lambda: serial_deposit(idx, val, G, unroll=unroll))
        print(f"pallas serial unroll={unroll:3d}: {t*1e3:9.3f} ms "
              f"{t/N*1e9:7.2f} ns/elem", flush=True)
    # XLA baseline, same stream
    t = timed(lambda: jnp.zeros(G, jnp.float32).at[idx].add(val))
    print(f"xla scatter baseline     : {t*1e3:9.3f} ms "
          f"{t/N*1e9:7.2f} ns/elem")


if __name__ == "__main__":
    main()
