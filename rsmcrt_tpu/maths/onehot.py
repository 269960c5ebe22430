"""Dense one-hot replacements for per-lane small-table gathers.

On TPU a ``table[idx]`` gather with a per-lane index vector lowers to a
serialized row-op kernel (~10 ns/row, measured in STATUS.md "The deposit
wall") and is a fusion boundary.  For SMALL tables (prim parameters,
optical-property rows, prim-id maps) a dense one-hot contraction is pure
vector/matrix math: it fuses with surrounding elementwise work and rides
the VPU/MXU instead.  A 50-prim scene's megastep contained ~7.7k gathers
before this; these helpers remove the per-round ones.
"""

from __future__ import annotations

import jax.numpy as jnp


def onehot_take(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``table [N, ...] , idx [B] -> table[idx] [B, ...]`` as a dense
    one-hot contraction.  ``idx`` is clipped to the table."""
    N = table.shape[0]
    idx = jnp.clip(idx, 0, N - 1)
    flat = table.reshape(N, -1)
    if jnp.issubdtype(table.dtype, jnp.floating):
        oh = (idx[:, None] == jnp.arange(N)).astype(table.dtype)
        out = oh @ flat  # [B, prod(rest)] matmul (MXU)
    else:
        # integer tables: masked sum keeps the dtype exact
        oh = idx[:, None] == jnp.arange(N)
        out = jnp.sum(jnp.where(oh[:, :, None], flat[None], 0), axis=1)
    return out.reshape((idx.shape[0],) + table.shape[1:])


def onehot_take_col(a: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``a [B, N], idx [B] -> a[b, idx[b]] [B]`` as a masked row sum."""
    N = a.shape[-1]
    idx = jnp.clip(idx, 0, N - 1)
    oh = idx[..., None] == jnp.arange(N)
    if jnp.issubdtype(a.dtype, jnp.floating):
        return jnp.sum(a * oh.astype(a.dtype), axis=-1)
    return jnp.sum(jnp.where(oh, a, 0), axis=-1)
