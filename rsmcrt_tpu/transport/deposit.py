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


def _window_kernel(krow_ref, kcol_ref, v_ref, out_ref, krow_s, kcol_s, *,
                   nx, ny_pad, nz, wx, wy, wz, dot_dtype):
    """One chunk of packed deposits accumulated into the VMEM delta grid.

    Deposits are identified by a packed key ``(ix << 20) | (iy << 10) | iz``
    (``_BIG`` = dead/processed).  Each round anchors a ``wx x wy x wz``
    window on the lexicographic-min remaining deposit (so that deposit is
    always covered and the loop terminates), accumulates every remaining
    in-window deposit with a two-stage one-hot contraction

        accw[rxy, rz] = sum_c val_c [rxy_c == rxy][rz_c == rz]   (MXU)
        acc[rxy, z]   = accw @ shift(bz)                          (MXU)

    and adds ``acc`` into the full-z column at the window's xy offset
    (the z placement rides the second matmul, keeping the dynamic-slice
    write lane-aligned).  Rounds repeat until no deposit remains; with
    Morton-sorted input a chunk's deposits share one or two windows.
    """
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # per-chunk mutable remaining-set state (scratch persists across the
    # sequential grid, so re-init for every chunk)
    krow_s[:] = krow_ref[:]
    kcol_s[:] = kcol_ref[:]
    v = v_ref[:]  # [C, 1] f32

    C = kcol_ref.shape[0]
    RXY = wx * wy
    iota_rxy = jax.lax.broadcasted_iota(jnp.int32, (C, RXY), 1)
    iota_wz = jax.lax.broadcasted_iota(jnp.int32, (C, wz), 1)
    iota_z_out = jax.lax.broadcasted_iota(jnp.int32, (wz, nz), 1)
    iota_z_w = jax.lax.broadcasted_iota(jnp.int32, (wz, nz), 0)

    def decode(k):
        return (jax.lax.shift_right_logical(k, 20),
                jax.lax.shift_right_logical(k, 10) & 1023,
                k & 1023)

    def tile_round(k0):
        rx, ry, rz = decode(k0)
        bx = jnp.clip(rx - wx // 2, 0, nx - wx)
        # y is the sublane dim of the out block: keep the offset 8-aligned
        # (ny_pad and wy are multiples of 8, so the clamp range is aligned)
        by = jnp.clip(ry - wy // 2, 0, ny_pad - wy) & ~7
        by = pl.multiple_of(by, 8)
        bz = jnp.clip(rz - wz // 2, 0, nz - wz)

        kc = kcol_s[:]
        ix, iy, iz = decode(kc)  # _BIG decodes out-of-range -> never in-win
        relx = ix - bx
        rely = iy - by
        relz = iz - bz
        inwin = jnp.logical_and(
            jnp.logical_and(
                jnp.logical_and(relx >= 0, relx < wx),
                jnp.logical_and(rely >= 0, rely < wy),
            ),
            jnp.logical_and(relz >= 0, relz < wz),
        )  # [C, 1]
        rxy = relx * wy + rely
        ohi = jnp.where(
            jnp.logical_and(inwin, rxy == iota_rxy), v, 0.0
        ).astype(dot_dtype)  # [C, RXY]
        olo = jnp.where(
            jnp.logical_and(inwin, relz == iota_wz), 1.0, 0.0
        ).astype(dot_dtype)  # [C, wz]
        accw = jax.lax.dot_general(
            ohi, olo, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [RXY, wz]
        shift = (iota_z_out == bz + iota_z_w).astype(jnp.float32)
        acc = jax.lax.dot_general(
            accw, shift, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [RXY, nz]
        cur = out_ref[pl.ds(bx, wx), pl.ds(by, wy), :]
        out_ref[pl.ds(bx, wx), pl.ds(by, wy), :] = \
            cur + acc.reshape(wx, wy, nz)

        kcol_s[:] = jnp.where(inwin, _BIG, kc)
        kr = krow_s[:]
        ixr, iyr, izr = decode(kr)
        inwin_r = jnp.logical_and(
            jnp.logical_and(
                jnp.logical_and(ixr - bx >= 0, ixr - bx < wx),
                jnp.logical_and(iyr - by >= 0, iyr - by < wy),
            ),
            jnp.logical_and(izr - bz >= 0, izr - bz < wz),
        )
        krow_s[:] = jnp.where(inwin_r, _BIG, kr)
        return jnp.min(krow_s[:])

    k0 = jnp.min(krow_s[:])
    jax.lax.while_loop(lambda k: k < _BIG, tile_round, k0)


def pack_deposit_key(ix, iy, iz, live) -> jnp.ndarray:
    """Pack int32 voxel coordinates into the window kernel's deposit key
    (lexicographic order = x-major); dead deposits get ``_BIG``."""
    key = (
        jnp.left_shift(ix, 20)
        | jnp.left_shift(iy, 10)
        | iz
    )
    return jnp.where(live, key, _BIG).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("grid_shape", "chunk", "window", "interpret",
                     "dot_dtype"),
)
def deposit_window_packed(grid_shape, keys, val, *, chunk: int = 2048,
                          window=(32, 32, 32), interpret: bool = False,
                          dot_dtype=jnp.float32) -> jnp.ndarray:
    """Accumulate N packed deposits into a fresh [nx, ny, nz] delta grid.

    keys: [N] int32 from :func:`pack_deposit_key` (``_BIG`` = dead; the
    caller should order rows so spatially-near deposits are adjacent --
    e.g. lanes sorted by :func:`morton_key_3d`).
    val:  [N] f32 deposit values (dead rows must also have val <= 0).

    Replaces the reference's ``!$omp atomic`` voxel DDA accumulation
    (src/inttau2.f90:408-445).  Unlike :func:`deposit_delta` (fixed
    supertiles, full-z columns) the windows here follow the deposit
    cloud in all three axes, so the per-deposit matmul work is ~25x
    smaller on diffuse wavefronts.
    """
    nx, ny, nz = grid_shape
    if max(nx, ny, nz) > 1024:
        raise ValueError("grid dims must be <= 1024 for packed keys")
    if chunk % 128:
        raise ValueError(f"chunk={chunk} must be a multiple of 128")
    wx, wy, wz = window
    wx = min(wx, nx)
    wy = min(wy, _round_up(ny, 8))
    wz = min(wz, nz)
    if wy % 8:
        raise ValueError(f"wy={wy} must be a multiple of 8")
    ny_pad = _round_up(ny, 8)

    n = keys.shape[0]
    nchunk = -(-n // chunk)
    pad = nchunk * chunk - n
    if pad:
        keys = jnp.pad(keys, (0, pad), constant_values=_BIG)
        val = jnp.pad(val, (0, pad))

    out = pl.pallas_call(
        functools.partial(_window_kernel, nx=nx, ny_pad=ny_pad, nz=nz,
                          wx=wx, wy=wy, wz=wz, dot_dtype=dot_dtype),
        grid=(nchunk,),
        in_specs=[
            pl.BlockSpec((chunk // 128, 128), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nx, ny_pad, nz), lambda c: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nx, ny_pad, nz), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((chunk // 128, 128), jnp.int32),
            pltpu.VMEM((chunk, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(120 * 2**20)
        ),
        interpret=interpret,
    )(keys.reshape(-1, 128), keys.reshape(-1, 1), val.reshape(-1, 1))
    if ny_pad != ny:
        out = out[:, :ny, :]
    return out


def deposit_window_delta(grid_shape, x, y, z, val, *, chunk: int = 2048,
                         window=(32, 32, 32), interpret: bool = False,
                         dot_dtype=jnp.float32) -> jnp.ndarray:
    """xyz-coordinate convenience wrapper over
    :func:`deposit_window_packed` (same contract as
    :func:`deposit_delta`)."""
    keys = pack_deposit_key(x.astype(jnp.int32), y.astype(jnp.int32),
                            z.astype(jnp.int32), val > 0.0)
    return deposit_window_packed(grid_shape, keys, val, chunk=chunk,
                                 window=window, interpret=interpret,
                                 dot_dtype=dot_dtype)


def morton_key_3d(ix: jnp.ndarray, iy: jnp.ndarray,
                  iz: jnp.ndarray) -> jnp.ndarray:
    """Interleave the low 10 bits of three int32 coordinate arrays into a
    30-bit Morton (z-order) key; the lane sort key for
    :func:`deposit_window_packed` chunk locality."""

    def part1by2(a):
        a = jnp.bitwise_and(a, 0x3FF)
        a = jnp.bitwise_and(
            jnp.bitwise_or(a, jnp.left_shift(a, 16)), 0x030000FF
        )
        a = jnp.bitwise_and(
            jnp.bitwise_or(a, jnp.left_shift(a, 8)), 0x0300F00F
        )
        a = jnp.bitwise_and(
            jnp.bitwise_or(a, jnp.left_shift(a, 4)), 0x030C30C3
        )
        a = jnp.bitwise_and(
            jnp.bitwise_or(a, jnp.left_shift(a, 2)), 0x09249249
        )
        return a

    ix = jnp.clip(ix, 0, 1023)
    iy = jnp.clip(iy, 0, 1023)
    iz = jnp.clip(iz, 0, 1023)
    return (
        part1by2(ix)
        | jnp.left_shift(part1by2(iy), 1)
        | jnp.left_shift(part1by2(iz), 2)
    )


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
