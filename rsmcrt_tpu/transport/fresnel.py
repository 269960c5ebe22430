"""Fresnel reflection / refraction, vectorised.

reference: src/surfaces.f90.  All functions operate on direction batches
``[..., 3]`` and are branch-free.
"""

from __future__ import annotations

import jax.numpy as jnp


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def fresnel_coeff(incident: jnp.ndarray, normal: jnp.ndarray, n1, n2):
    """Unpolarised Fresnel reflection coefficient (reference:
    src/surfaces.f90:86-127).  Returns 1.0 on total internal reflection."""
    costt = jnp.clip(jnp.abs(_dot(incident, normal)), 0.0, 1.0)
    sintt = jnp.sqrt(jnp.maximum(1.0 - costt * costt, 1e-30))
    sint2 = (n1 / n2) * sintt
    tir = sint2 > 1.0
    sint2c = jnp.minimum(sint2, 1.0)
    cost2 = jnp.sqrt(jnp.maximum(1.0 - sint2c * sint2c, 1e-30))
    denom1 = n1 * costt + n2 * cost2
    denom2 = n1 * cost2 + n2 * costt
    f1 = jnp.abs((n1 * costt - n2 * cost2) /
                 jnp.where(denom1 == 0.0, 1.0, denom1)) ** 2
    f2 = jnp.abs((n1 * cost2 - n2 * costt) /
                 jnp.where(denom2 == 0.0, 1.0, denom2)) ** 2
    coeff = 0.5 * (f1 + f2)
    # perpendicular incidence transmits (reference :111-114)
    coeff = jnp.where(costt == 1.0, 0.0, coeff)
    return jnp.where(tir, 1.0, coeff)


def reflect(incident: jnp.ndarray, normal: jnp.ndarray) -> jnp.ndarray:
    """Mirror reflection (reference: src/surfaces.f90:42-55)."""
    return incident - 2.0 * _dot(normal, incident)[..., None] * normal


def refract(incident: jnp.ndarray, normal: jnp.ndarray, eta) -> jnp.ndarray:
    """Snell refraction with eta = n1/n2 (reference: src/surfaces.f90:57-84).
    Caller must ensure no TIR (eta^2 (1-c1^2) <= 1)."""
    c1 = _dot(normal, incident)
    # flip normal to oppose the incident direction like the reference
    ntmp = jnp.where(c1[..., None] < 0.0, normal, -normal)
    c1 = jnp.abs(c1)
    eta = jnp.asarray(eta)
    c2 = jnp.sqrt(jnp.maximum(1.0 - eta**2 * (1.0 - c1 * c1), 1e-30))
    if eta.ndim == 0:
        etab = eta
    else:
        etab = eta[..., None]
    return etab * incident + (eta * c1 - c2)[..., None] * ntmp
