"""Voxel rendering of scene geometry and layer IDs.

reference: render in src/sdfs/sdf_base.f90:308-369 -- rasterise the layer ID
of the innermost SDF at each voxel centre.  Here it is a single vectorised
evaluation over all voxel centres instead of an OpenMP triple loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .sdfs.scene import Scene, eval_scene, scene_layer


def render_geometry(scene: Scene, extent, samples) -> np.ndarray:
    """Rasterise layer IDs onto a ``samples`` grid covering +-extent
    (reference voxel centres: (i - n/2 - 0.5) * extent/(n/2),
    sdf_base.f90:342-360)."""
    sx, sy, sz = samples
    ns = [round(s / 2.0) for s in samples]
    ext = np.asarray(extent, np.float64)
    wid = ext / np.asarray(ns)

    xs = (np.arange(1, sx + 1) - ns[0] - 0.5) * wid[0]
    ys = (np.arange(1, sy + 1) - ns[1] - 0.5) * wid[1]
    zs = (np.arange(1, sz + 1) - ns[2] - 0.5) * wid[2]
    grid = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"), axis=-1)
    pts = jnp.asarray(grid.reshape(-1, 3), jnp.float32)

    layer_ids = jnp.asarray((0,) + scene.layer_ids, jnp.int32)

    @jax.jit
    def _render(scene, pts):
        ds = eval_scene(scene, pts)
        lyr = scene_layer(ds)
        return layer_ids[lyr]

    # chunk to bound memory on big render grids
    out = []
    chunk = 1 << 18
    for i in range(0, pts.shape[0], chunk):
        out.append(np.asarray(_render(scene, pts[i:i + chunk])))
    return np.concatenate(out).reshape(sx, sy, sz).astype(np.float32)
