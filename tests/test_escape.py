"""Escape-function kernel tests (reference: escape_Function + symmetry
machinery, kernelsMod.f90:85-1460)."""

import numpy as np
import pytest

import jax

from rsmcrt_tpu.escape import escape_function, map_escape_cart
from rsmcrt_tpu.grid import cart_grid
from rsmcrt_tpu.maths import transforms as T

import jax.numpy as jnp


@pytest.mark.slow
def test_escape_360rotational():
    escape, sym = escape_function(
        "res/escape_test.toml", n_lanes=2048, verbose=False,
        write_files=False,
    )
    assert sym.shape == (1, 4, 4, 4)
    assert escape.shape == (1, 32, 32, 32)
    # 360rotational fill: theta invariant
    assert np.allclose(sym[0, :, 0, :], sym[0, :, 2, :])
    # efficiency increases toward the detector at +z
    col = escape[0, 16, 16, :]
    inner = col[col >= 0.0]
    assert inner.max() > 0.05
    assert col[28] > col[4]
    # voxels outside the symmetry grid are flagged -1 like the reference
    # (escape grid max radius 1.0 < grid corner radius sqrt(2))
    assert escape.min() == -1.0


def test_cart_map_identity_frame():
    """Mapping a constant symmetry grid through an identity frame must be
    constant inside and -1 outside."""
    sym = np.full((1, 4, 4, 4), 0.7, np.float32)
    sg = cart_grid(4, 4, 4, 0.5, 0.5, 0.5)
    fg = cart_grid(16, 16, 16, 1.0, 1.0, 1.0)
    frames = (jnp.eye(4), jnp.eye(4), jnp.eye(4), jnp.eye(4))
    out = map_escape_cart(sym, sg, fg, frames, jnp.zeros(3))
    centre = out[0, 8, 8, 8]
    assert np.isclose(centre, 0.7, atol=1e-5)
    assert out[0, 0, 0, 0] == -1.0  # outside the +-0.5 symmetry extent


def test_cart_map_gradient_field():
    """A linear-in-z symmetry field interpolates linearly."""
    sg = cart_grid(4, 4, 4, 1.0, 1.0, 1.0)
    fg = cart_grid(8, 8, 8, 1.0, 1.0, 1.0)
    zc = (np.arange(4) + 0.5) / 4 * 2.0 - 1.0
    sym = np.broadcast_to(zc[None, None, None, :], (1, 4, 4, 4)).astype(
        np.float32).copy()
    frames = (jnp.eye(4), jnp.eye(4), jnp.eye(4), jnp.eye(4))
    out = map_escape_cart(sym, sg, fg, frames, jnp.zeros(3))
    mid = out[0, 4, 4, :]
    zf = (np.arange(8) + 0.5) / 8 * 2.0 - 1.0
    # interior fluence voxels reproduce the linear field
    assert np.allclose(mid[2:6], zf[2:6], atol=1e-5)
