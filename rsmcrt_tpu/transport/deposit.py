"""Pallas TPU fluence-deposition kernel.

Replaces the XLA scatter-add of per-megastep voxel path-length deposits
(the reference's ``!$omp atomic`` DDA accumulation, src/inttau2.f90:408-445)
with an MXU-based tiled accumulation.  The XLA scatter on TPU is
serialized (~10 ns/element); this kernel instead processes deposits in
chunks of ``C`` against axis-aligned ``tx x ty x nz`` grid supertiles,
turning the scatter into a dense one-hot contraction

    tile[r, z] += sum_c val_c * [tile_c == tile][r_c == r] * [z_c == z]

i.e. one ``[R, C] @ [C, nz]`` matmul per (chunk, touched supertile) on the
MXU (~25/50 Tmac/s f32/bf16 measured on v5e, vs the 10 ns/element scatter
wall).  Because supertiles are axis-aligned and disjoint, each deposit
belongs to exactly one tile: no remaining-set bookkeeping is needed and
the only loop state is the current tile id (a scalar), which walks the
chunk's distinct tile ids in increasing order via masked min-reductions.

Locality: the transport engine sorts each megastep's deposit rows by a
Morton key of the lane position, so a chunk touches only a few
supertiles.  Exactness holds for any ordering -- unsorted input is just
slower.  Deposits with ``val <= 0`` (dead/padded lanes) get tile id
``BIG`` and are never visited; fully dead chunks cost one reduction.

The kernel emits a full delta grid (zero-initialised on the first chunk,
accumulated in VMEM across the sequential chunk grid, written back once);
the caller adds it to the running fluence tally.  The delta grid lives in
VMEM, so grids up to ~256^3 f32 fit on a v5e core.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 2**30  # sentinel beyond any supertile id


def _round_up(a: int, b: int) -> int:
    return -(-a // b) * b


def _deposit_kernel(stile_row_ref, stile_ref, rkey_ref, z_ref, v_ref,
                    out_ref, *, nsy, nz, tx, ty, dot_dtype):
    """One chunk of deposits accumulated into the VMEM delta grid."""
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    stile_row = stile_row_ref[:]  # [C//128, 128] for fast reductions
    stile = stile_ref[:]          # [C, 1] for the one-hot compare
    rkey = rkey_ref[:]            # [C, 1] cell-within-tile row id
    z = z_ref[:]                  # [C, 1]
    v_f32 = v_ref[:]

    C = stile.shape[0]
    R = tx * ty
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (C, R), 1)
    iota_z = jax.lax.broadcasted_iota(jnp.int32, (C, nz), 1)
    olo = jnp.where(z == iota_z, 1.0, 0.0).astype(dot_dtype)  # [C, nz]
    oh_r = rkey == iota_r  # [C, R] bool, tile-independent

    def tile_round(s_cur):
        # accumulate every deposit of supertile s_cur in one matmul.
        # (select in f32 then cast: Mosaic cannot legalize a bf16 select
        # against an (8,128)-tiled bool here)
        ohi = jnp.where(
            jnp.logical_and(stile == s_cur, oh_r), v_f32, 0.0
        ).astype(dot_dtype)  # [C, R]
        acc = jax.lax.dot_general(
            ohi, olo, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [R, nz]
        cx = (s_cur // nsy) * tx
        cy = (s_cur % nsy) * ty
        cy = pl.multiple_of(cy, 8)  # ty is a multiple of 8
        acc3 = acc.reshape(tx, ty, nz)
        cur = out_ref[pl.ds(cx, tx), pl.ds(cy, ty), :]
        out_ref[pl.ds(cx, tx), pl.ds(cy, ty), :] = cur + acc3
        # next distinct tile id in the chunk (BIG when exhausted)
        return jnp.min(jnp.where(stile_row > s_cur, stile_row, _BIG))

    s0 = jnp.min(stile_row)
    jax.lax.while_loop(lambda s: s < _BIG, tile_round, s0)


@functools.partial(
    jax.jit,
    static_argnames=("grid_shape", "chunk", "tx", "ty", "interpret",
                     "dot_dtype"),
)
def deposit_delta(grid_shape, x, y, z, val, *, chunk: int = 2048,
                  tx: int = 16, ty: int = 16, interpret: bool = False,
                  dot_dtype=jnp.float32) -> jnp.ndarray:
    """Accumulate N deposits into a fresh [nx, ny, nz] delta grid.

    x/y/z: [N] int32 voxel coordinates (anything with val <= 0 ignored);
    val:   [N] f32 deposit values.
    N is padded up to a multiple of ``chunk`` internally.  ``dot_dtype``
    bf16 runs the one-hot contraction at 2x MXU rate; deposits are then
    rounded to 8-bit mantissa before the f32 accumulation (~0.2% rms
    noise per deposit, far below MC noise for fluence tallies).
    """
    nx, ny, nz = grid_shape
    if ty % 8:
        raise ValueError(f"ty={ty} must be a multiple of 8")
    if chunk % 128:
        raise ValueError(f"chunk={chunk} must be a multiple of 128")
    NX, NY = _round_up(nx, tx), _round_up(ny, ty)
    nsy = NY // ty
    n = x.shape[0]
    nchunk = -(-n // chunk)
    pad = nchunk * chunk - n
    if pad:
        x = jnp.pad(x, (0, pad))
        y = jnp.pad(y, (0, pad))
        z = jnp.pad(z, (0, pad))
        val = jnp.pad(val, (0, pad))

    live = val > 0.0
    sx = jnp.where(live, x // tx, 0)
    sy = jnp.where(live, y // ty, 0)
    stile = jnp.where(live, sx * nsy + sy, _BIG).astype(jnp.int32)
    rkey = ((x - sx * tx) * ty + (y - sy * ty)).astype(jnp.int32)

    def col(a):
        return a.reshape(-1, 1)

    spec_col = pl.BlockSpec((chunk, 1), lambda c: (c, 0),
                            memory_space=pltpu.VMEM)
    spec_row = pl.BlockSpec((chunk // 128, 128), lambda c: (c, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_deposit_kernel, nsy=nsy, nz=nz, tx=tx, ty=ty,
                          dot_dtype=dot_dtype),
        grid=(nchunk,),
        in_specs=[spec_row, spec_col, spec_col, spec_col, spec_col],
        out_specs=pl.BlockSpec((NX, NY, nz), lambda c: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NX, NY, nz), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(110 * 2**20)
        ),
        interpret=interpret,
    )(stile.reshape(-1, 128), col(stile), col(rkey),
      col(z.astype(jnp.int32)), col(val))
    if NX != nx or NY != ny:
        out = out[:nx, :ny, :]
    return out


def morton_key_xy(ix: jnp.ndarray, iy: jnp.ndarray) -> jnp.ndarray:
    """Interleave the low 16 bits of two int32 coordinate arrays into a
    Morton (z-order) key.  Used to sort lanes so consecutive deposit
    chunks are spatially local (a Morton prefix is exactly the Morton
    code of the containing aligned supertile)."""

    def part1by1(a):
        a = jnp.bitwise_and(a, 0xFFFF)
        a = jnp.bitwise_and(
            jnp.bitwise_or(a, jnp.left_shift(a, 8)), 0x00FF00FF
        )
        a = jnp.bitwise_and(
            jnp.bitwise_or(a, jnp.left_shift(a, 4)), 0x0F0F0F0F
        )
        a = jnp.bitwise_and(
            jnp.bitwise_or(a, jnp.left_shift(a, 2)), 0x33333333
        )
        a = jnp.bitwise_and(
            jnp.bitwise_or(a, jnp.left_shift(a, 1)), 0x55555555
        )
        return a

    ix = jnp.maximum(ix, 0)
    iy = jnp.maximum(iy, 0)
    return jnp.bitwise_or(
        part1by1(ix), jnp.left_shift(part1by1(iy), 1)
    )
