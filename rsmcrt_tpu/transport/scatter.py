"""Henyey-Greenstein / isotropic scattering, vectorised.

reference: src/photon.f90:1045-1103 (mcxyz-style direction update).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import TWOPI


def sample_hg_cost(u: jnp.ndarray, hgg) -> jnp.ndarray:
    """Sample cos(theta) from the HG phase function; isotropic when g == 0
    (reference: src/photon.f90:1063-1069)."""
    g = jnp.asarray(hgg)
    safe_g = jnp.where(g == 0.0, 0.5, g)
    temp = (1.0 - safe_g * safe_g) / (1.0 - safe_g + 2.0 * safe_g * u)
    cost_hg = (1.0 + safe_g * safe_g - temp * temp) / (2.0 * safe_g)
    cost_iso = 2.0 * u - 1.0
    return jnp.where(g == 0.0, cost_iso, jnp.clip(cost_hg, -1.0, 1.0))


def scatter_direction(direction: jnp.ndarray, cost: jnp.ndarray,
                      phi: jnp.ndarray) -> jnp.ndarray:
    """Rotate ``direction [..., 3]`` by polar angle acos(cost) and azimuth
    ``phi`` (reference: src/photon.f90:1070-1102, including the
    near-perpendicular special cases at |nz| ~ 1)."""
    sint = jnp.sqrt(jnp.maximum(1.0 - cost * cost, 1e-30))
    cosp = jnp.cos(phi)
    sinp = jnp.sin(phi)
    nx, ny, nz = direction[..., 0], direction[..., 1], direction[..., 2]

    # general case
    temp = jnp.sqrt(jnp.maximum(1.0 - nz * nz, 1e-30))
    safe_t = jnp.where(temp > 0.0, temp, 1.0)
    uxx_g = sint * ((nx * nz * cosp - ny * sinp) / safe_t) + nx * cost
    uyy_g = sint * ((ny * nz * cosp + nx * sinp) / safe_t) + ny * cost
    uzz_g = -sint * cosp * safe_t + nz * cost

    # near-perpendicular cases (reference :1076-1083 uses 1e-12, which
    # underflows against 1.0 in f32 -- scale the threshold with dtype)
    tol = 1e-12 if direction.dtype == jnp.float64 else 1e-6
    up = nz > 1.0 - tol
    down = nz < -1.0 + tol
    uxx = jnp.where(up | down, sint * cosp, uxx_g)
    uyy = jnp.where(up | down, sint * sinp, uyy_g)
    uzz = jnp.where(up, cost, jnp.where(down, -cost, uzz_g))

    out = jnp.stack([uxx, uyy, uzz], axis=-1)
    norm = jnp.sqrt(jnp.sum(out * out, axis=-1, keepdims=True) + 1e-30)
    return out / jnp.where(norm > 0.0, norm, 1.0)


def hg_scatter(direction: jnp.ndarray, u_cost: jnp.ndarray,
               u_phi: jnp.ndarray, hgg) -> jnp.ndarray:
    cost = sample_hg_cost(u_cost, hgg)
    phi = TWOPI * u_phi
    return scatter_direction(direction, cost, phi)


def hg_logpdf_dg(cost: jnp.ndarray, hgg) -> jnp.ndarray:
    """d/dg log p_HG(cost; g) -- the per-event score used by the
    perturbation-MC gradient of detector signals w.r.t. anisotropy
    (replaces the reference's broken AdaLIPO inverse search,
    src/kernelsMod.f90:1663-1738, with a differentiable estimator).

    p_HG = 0.5 (1-g^2) / (1 + g^2 - 2 g cost)^{3/2}
    """
    g = jnp.asarray(hgg)
    denom = 1.0 + g * g - 2.0 * g * cost
    return (-2.0 * g) / jnp.maximum(1.0 - g * g, 1e-12) - 1.5 * (
        2.0 * g - 2.0 * cost
    ) / jnp.maximum(denom, 1e-12)
