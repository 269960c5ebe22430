"""Worker for tests/test_f64.py: run the physics gates with float64
transport + the reference's eps = 1e-8 (reference constants.f90:18,
inttau2.f90:56).  Separate process because jax_enable_x64 is global."""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from rsmcrt_tpu.grid import cart_grid  # noqa: E402
from rsmcrt_tpu.optics.properties import mono  # noqa: E402
from rsmcrt_tpu.sdfs import scene as S  # noqa: E402
from rsmcrt_tpu.sources.sources import build_source  # noqa: E402
from rsmcrt_tpu.transport.engine import (  # noqa: E402
    TransportConfig, simulate,
)

out = sys.argv[1]
f64 = jnp.float64

# tau = 10 scattering sphere (reference scat_test): nscatt gate
scene = S.build_scene([
    S.sphere(1.0, mono(10.0, 0.0, 0.0, 1.0, dtype=f64), 1,
             dtype=f64),
    S.box([2.0, 2.0, 2.0], mono(0.0, 0.0, 0.0, 1.0, dtype=f64), 2,
          dtype=f64),
], dtype=f64)
grid = cart_grid(32, 32, 32, 1.0, 1.0, 1.0, dtype=f64)
src = build_source("point", position=[0.0, 0.0, 0.0], dtype=f64)
cfg = TransportConfig(nphotons=3000, n_lanes=256, eps=1e-8,
                      chain_scatter=True)
t, _, n, s = simulate(scene, src, grid, jax.random.key(9), cfg,
                      chunk_steps=400)
assert t.jmean.dtype == jnp.float64

# refractive bench-style sphere in f64 (Fresnel + chaining at eps=1e-8)
scene2 = S.build_scene([
    S.sphere(1.0, mono(10.0, 0.1, 0.9, 1.38, dtype=f64), 1, dtype=f64),
    S.box([2.0, 2.0, 2.0], mono(0.0, 0.0, 0.0, 1.0, dtype=f64), 2,
          dtype=f64),
], dtype=f64)
cfg2 = TransportConfig(nphotons=3000, n_lanes=256, eps=1e-8,
                       chain_scatter=True)
t2, _, n2, s2 = simulate(scene2, src, grid, jax.random.key(9), cfg2,
                         chunk_steps=400)

json.dump(
    {
        "launched": int(n),
        "nscatt_per_photon": float(t.nscatt) / int(n),
        "steps": int(s),
        "fresnel_jsum_per_photon": float(jnp.sum(t2.jmean)) / int(n2),
        "fresnel_nscatt_per_photon": float(t2.nscatt) / int(n2),
    },
    open(out, "w"),
)
