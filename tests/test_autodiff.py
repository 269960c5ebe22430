"""End-to-end ``jax.grad`` through the transport step.

BASELINE.md's gradients row and the design doc claim the megastep is
differentiable with respect to the scene's optical parameters; this makes
the claim a test instead of a docstring (VERDICT r2 next #5).

The rigorous case is a pure absorber: with a FIXED RNG key the tau draws
are frozen and no discrete branch (scatter-vs-absorb, Fresnel) depends on
mua, so every photon's deposited path length ``min(tau/mua, wall)`` is a
smooth function of mua and ``jax.grad`` of the total fluence must match
central finite differences (same key = common random numbers) tightly.
Discrete-event parameters (scatter counts through albedo, HG shape, SDF
boundaries) are handled by the pMC score estimator instead
(``rsmcrt_tpu.inverse``, gated by tests/test_inverse.py) -- pathwise
autodiff cannot see those boundary terms by construction.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsmcrt_tpu.grid import cart_grid
from rsmcrt_tpu.optics.properties import mono
from rsmcrt_tpu.sdfs import scene as S
from rsmcrt_tpu.sources.sources import build_source
from rsmcrt_tpu.transport.engine import (
    TransportConfig, init_carry, transport_step,
)

N_STEPS = 48  # static bound -> fori_loop lowers to scan (reverse-diffable)


def _loss_fn():
    grid = cart_grid(32, 32, 32, 1.0, 1.0, 1.0)
    src = build_source("pencil", position=[0.0, 0.0, -0.99],
                       direction=[0.0, 0.0, 1.0])
    cfg = TransportConfig(nphotons=512, n_lanes=512, dda_substeps=8,
                          max_steps=N_STEPS)
    key = jax.random.key(7)
    base = S.build_scene([
        S.box([2.0, 2.0, 2.0], mono(0.0, 0.5, 0.0, 1.0), 1),
    ])

    def loss(mua):
        tables = dataclasses.replace(
            base.tables, mua=jnp.stack([jnp.asarray(0.0, jnp.float32),
                                        mua])
        )
        sc = dataclasses.replace(base, tables=tables)
        carry = init_carry(grid, cfg)

        def body(_, c):
            return transport_step(c, sc, src, grid, key, cfg)

        out = jax.lax.fori_loop(0, N_STEPS, body, carry)
        # total path length per photon: smooth in mua (deposit lengths
        # are min(tau/mua, wall distance); voxel binning cancels in the
        # total)
        return jnp.sum(out.tallies.jmean) / cfg.nphotons

    return jax.jit(loss), jax.jit(jax.grad(loss))


def test_grad_mua_matches_fd():
    loss, dloss = _loss_fn()
    mua = jnp.asarray(0.5, jnp.float32)
    g = float(dloss(mua))
    h = 5e-3
    fd = (float(loss(mua + h)) - float(loss(mua - h))) / (2 * h)
    # analytic sanity: mean path E[min(tau/mua, ~2)] -> dF/dmua < 0
    assert g < 0.0
    # pathwise grad vs CRN central difference: the only disagreement is
    # photons switching absorb<->exit inside the FD stencil (rare)
    assert abs(g - fd) <= max(1e-3, 0.02 * abs(fd)), (g, fd)


@pytest.mark.slow
def test_grad_flows_through_fresnel_chained_step():
    """The chained megastep (inline scatter + Fresnel) must also be
    differentiable: grad of total fluence wrt mua through a chained run
    on the bench-style sphere is finite and negative."""
    grid = cart_grid(16, 16, 16, 1.0, 1.0, 1.0)
    src = build_source("point", position=[0.0, 0.0, 0.0])
    cfg = TransportConfig(nphotons=128, n_lanes=128, dda_substeps=8,
                          chain_scatter=True, max_steps=24)
    key = jax.random.key(3)
    base = S.build_scene([
        S.sphere(1.0, mono(10.0, 0.1, 0.9, 1.38), 1),
        S.box([2.0, 2.0, 2.0], mono(0.0, 0.0, 0.0, 1.0), 2),
    ])

    def loss(mua):
        tables = dataclasses.replace(
            base.tables,
            mua=base.tables.mua.at[1].set(mua),
        )
        sc = dataclasses.replace(base, tables=tables)
        carry = init_carry(grid, cfg)

        def body(_, c):
            return transport_step(c, sc, src, grid, key, cfg)

        out = jax.lax.fori_loop(0, 24, body, carry)
        return jnp.sum(out.tallies.jmean) / cfg.nphotons

    g = float(jax.grad(loss)(jnp.asarray(0.1, jnp.float32)))
    # the guarantee under test: no NaN/inf anywhere in the reverse pass
    # through raycast normals, Fresnel, HG sampling and the chained walk
    # (the sign of a 24-step truncated pathwise estimate is noise)
    assert np.isfinite(g) and g != 0.0, g
