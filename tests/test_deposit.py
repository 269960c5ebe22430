"""Pallas deposition kernel vs XLA scatter-add (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsmcrt_tpu.transport.deposit import (
    deposit_delta, deposit_window_delta, morton_key_3d, morton_key_xy,
)

INTERP = jax.default_backend() == "cpu"


def _scatter_ref(shape, x, y, z, val):
    nx, ny, nz = shape
    keep = val > 0.0
    flat = (x * ny + y) * nz + z
    flat = np.where(keep, flat, 0)
    val = np.where(keep, val, 0.0)
    out = np.zeros(nx * ny * nz, np.float32)
    np.add.at(out, flat, val)
    return out.reshape(shape)


def _check_window(shape, x, y, z, val, chunk=128, window=(16, 16, 16)):
    got = deposit_window_delta(
        shape,
        jnp.asarray(x, jnp.int32), jnp.asarray(y, jnp.int32),
        jnp.asarray(z, jnp.int32), jnp.asarray(val, jnp.float32),
        chunk=chunk, window=window, interpret=INTERP,
    )
    want = _scatter_ref(shape, np.asarray(x), np.asarray(y),
                        np.asarray(z), np.asarray(val))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)


def _check(shape, x, y, z, val, chunk=128, tx=8, ty=8):
    got = deposit_delta(
        shape,
        jnp.asarray(x, jnp.int32), jnp.asarray(y, jnp.int32),
        jnp.asarray(z, jnp.int32), jnp.asarray(val, jnp.float32),
        chunk=chunk, tx=tx, ty=ty, interpret=INTERP,
    )
    want = _scatter_ref(shape, np.asarray(x), np.asarray(y),
                        np.asarray(z), np.asarray(val))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)


def test_clustered_deposits():
    rng = np.random.default_rng(0)
    shape = (24, 24, 16)
    n = 512
    # clustered: lanes near a few centers, like sorted wavefront chunks
    cx = rng.integers(0, 20, (4,))
    lane = rng.integers(0, 4, (n,))
    x = np.clip(cx[lane] + rng.integers(0, 4, (n,)), 0, 23)
    y = np.clip(cx[lane] + rng.integers(0, 4, (n,)), 0, 23)
    z = rng.integers(0, 16, (n,))
    val = rng.uniform(0.1, 1.0, (n,)).astype(np.float32)
    _check(shape, x, y, z, val)


def test_scattered_worst_case():
    rng = np.random.default_rng(1)
    shape = (32, 24, 16)
    n = 256
    x = rng.integers(0, 32, (n,))
    y = rng.integers(0, 24, (n,))
    z = rng.integers(0, 16, (n,))
    val = rng.uniform(0.1, 1.0, (n,)).astype(np.float32)
    _check(shape, x, y, z, val)


def test_collisions_and_padding():
    shape = (16, 16, 16)
    # many deposits into the same voxel + zero-value padding rows
    n = 200
    x = np.full(n, 7)
    y = np.full(n, 9)
    z = np.full(n, 3)
    val = np.ones(n, np.float32)
    val[50:100] = 0.0  # padded / dead lanes must be ignored
    x[50:100] = -1  # garbage coordinates on dead lanes
    _check(shape, x, y, z, val)


def test_corner_extremes():
    # deposits at grid corners exercise the cx/cy clamping
    shape = (24, 24, 8)
    x = np.array([0, 23, 0, 23, 12])
    y = np.array([0, 0, 23, 23, 12])
    z = np.array([0, 7, 7, 0, 4])
    val = np.array([1.0, 2.0, 3.0, 4.0, 5.0], np.float32)
    _check(shape, x, y, z, val, chunk=128)


def test_all_dead_chunk():
    shape = (16, 16, 8)
    n = 64
    _check(shape, np.zeros(n, int), np.zeros(n, int), np.zeros(n, int),
           np.zeros(n, np.float32))


def test_morton_key_orders_locally():
    ix = jnp.asarray([0, 1, 0, 1, 8], jnp.int32)
    iy = jnp.asarray([0, 0, 1, 1, 8], jnp.int32)
    k = morton_key_xy(ix, iy)
    assert list(np.asarray(k)) == [0, 1, 2, 3, 192]


@pytest.mark.slow
def test_large_random_vs_scatter():
    rng = np.random.default_rng(2)
    shape = (40, 40, 24)
    n = 4096
    # mix: 90% clustered along short rays (like DDA output), 10% scattered
    n_lane = n // 8
    lx = rng.integers(0, 39, (n_lane,))
    ly = rng.integers(0, 39, (n_lane,))
    lz = rng.integers(0, 23, (n_lane,))
    d = rng.integers(-1, 2, (n_lane, 3))
    steps = np.arange(8)
    x = np.clip(lx[:, None] + d[:, 0:1] * steps, 0, 39).reshape(-1)
    y = np.clip(ly[:, None] + d[:, 1:2] * steps, 0, 39).reshape(-1)
    z = np.clip(lz[:, None] + d[:, 2:3] * steps, 0, 23).reshape(-1)
    val = rng.uniform(0.01, 1.0, (n,)).astype(np.float32)
    val[rng.uniform(size=n) < 0.3] = 0.0
    # sort rows by morton key like the engine does
    key = np.asarray(morton_key_xy(jnp.asarray(x // 8, jnp.int32),
                                   jnp.asarray(y // 8, jnp.int32)))
    order = np.argsort(key, kind="stable")
    _check(shape, x[order], y[order], z[order], val[order], chunk=256)


def test_window_clustered_and_garbage():
    rng = np.random.default_rng(3)
    shape = (40, 37, 24)  # deliberately 8-unaligned ny
    m = 96
    lx = rng.integers(0, 40, (m,))
    ly = rng.integers(0, 37, (m,))
    lz = rng.integers(0, 24, (m,))
    d = rng.integers(-1, 2, (m, 3))
    steps = np.arange(8)
    x = np.clip(lx[:, None] + d[:, 0:1] * steps, 0, 39).reshape(-1)
    y = np.clip(ly[:, None] + d[:, 1:2] * steps, 0, 36).reshape(-1)
    z = np.clip(lz[:, None] + d[:, 2:3] * steps, 0, 23).reshape(-1)
    val = rng.uniform(0.01, 1.0, x.shape).astype(np.float32)
    val[rng.uniform(size=x.shape) < 0.3] = 0.0
    x = np.where(val == 0, -7, x)  # garbage coords on dead rows
    key = np.asarray(morton_key_3d(jnp.asarray(x, jnp.int32),
                                   jnp.asarray(y, jnp.int32),
                                   jnp.asarray(z, jnp.int32)))
    o = np.argsort(key, kind="stable")
    _check_window(shape, x[o], y[o], z[o], val[o], chunk=256)


def test_window_corners_collisions_unsorted():
    # corner deposits exercise base clamping; repeated voxel exercises
    # collision accumulation; unsorted input is just slower, not wrong
    shape = (24, 24, 16)
    x = np.array([0, 23, 0, 23, 12, 12, 12, 5])
    y = np.array([0, 0, 23, 23, 11, 11, 11, 20])
    z = np.array([0, 15, 15, 0, 8, 8, 8, 3])
    val = np.array([1, 2, 3, 4, 5, 6, 7, 8], np.float32)
    _check_window(shape, x, y, z, val, chunk=128, window=(16, 16, 8))


def test_window_all_dead_and_tiny_grid():
    shape = (8, 8, 8)  # grid smaller than the default window
    n = 64
    _check_window(shape, np.zeros(n, int), np.zeros(n, int),
                  np.zeros(n, int), np.zeros(n, np.float32),
                  window=(32, 32, 32))
    x = np.array([0, 7, 3])
    val = np.array([1.0, 2.0, 3.0], np.float32)
    _check_window(shape, x, x, x, val, window=(32, 32, 32))


def test_morton_key_3d_orders_locally():
    ix = jnp.asarray([0, 1, 0, 0, 1], jnp.int32)
    iy = jnp.asarray([0, 0, 1, 0, 1], jnp.int32)
    iz = jnp.asarray([0, 0, 0, 1, 1], jnp.int32)
    k = morton_key_3d(ix, iy, iz)
    # bit interleave x|y<<1|z<<2: (1,1,1) -> 0b111 = 7
    assert list(np.asarray(k)) == [0, 1, 2, 4, 7]
