"""Worker for tests/test_distributed.py: one process of a 2-process CPU
cluster running the distributed forward simulation.  Invoked as
``python dist_worker.py <pid> <nproc> <port> <outfile>``."""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # before any jax use

pid, nproc, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                         sys.argv[3], sys.argv[4])
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)

import jax.numpy as jnp  # noqa: E402

from rsmcrt_tpu.grid import cart_grid  # noqa: E402
from rsmcrt_tpu.optics.properties import mono  # noqa: E402
from rsmcrt_tpu.parallel.distributed import simulate_distributed  # noqa: E402
from rsmcrt_tpu.sdfs import scene as S  # noqa: E402
from rsmcrt_tpu.sources.sources import build_source  # noqa: E402
from rsmcrt_tpu.transport.engine import TransportConfig  # noqa: E402

# the tau=10 scattering sphere physics gate (reference scat_test)
scene = S.build_scene([
    S.sphere(1.0, mono(10.0, 0.0, 0.0, 1.0), 1),
    S.box([2.0, 2.0, 2.0], mono(0.0, 0.0, 0.0, 1.0), 2),
])
grid = cart_grid(32, 32, 32, 1.0, 1.0, 1.0)
src = build_source("point", position=[0.0, 0.0, 0.0])
cfg = TransportConfig(nphotons=2000, n_lanes=128)

tallies, bank, launched, steps = simulate_distributed(
    scene, src, grid, jax.random.key(5), cfg, chunk_steps=400,
)
json.dump(
    {
        "pid": pid,
        "n_processes": jax.process_count(),
        "n_devices": len(jax.devices()),
        "launched": int(launched),
        "nscatt": float(tallies.nscatt),
        "jsum": float(jnp.sum(tallies.jmean)),
        "steps": int(steps),
    },
    open(out, "w"),
)
