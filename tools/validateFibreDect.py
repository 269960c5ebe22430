"""Fibre collection efficiency validation.

A fibre-lens detector with aperture a and focal length f collecting light
from an isotropic point source at the focal point has efficiency
0.5 * (1 - cos(atan(a / f))) (model: reference tools/validateFibreDect.py).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main(nphotons=200_000, cpu=False):
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from rsmcrt_tpu.detectors.detectors import (DetectorBank,
                                                FibreDetectors, totals)
    from rsmcrt_tpu.grid import cart_grid
    from rsmcrt_tpu.optics.properties import mono
    from rsmcrt_tpu.sdfs import scene as S
    from rsmcrt_tpu.sources.sources import build_source
    from rsmcrt_tpu.transport.engine import TransportConfig, simulate

    focal = 2.0
    apertures = [0.5 * j for j in range(1, 7)]
    M = len(apertures)
    arr = lambda v: jnp.asarray(v, jnp.float32)
    fibre = FibreDetectors(
        pos=jnp.tile(arr([[0.0, 0.0, -focal]]), (M, 1)),
        dir=jnp.tile(arr([[0.0, 0.0, -1.0]]), (M, 1)),
        focalLength1=arr([focal] * M),
        focalLength2=arr([focal] * M),
        f1Aperture=arr(apertures),
        f2Aperture=arr([100.0] * M),
        frontOffset=arr([0.0] * M),
        backOffset=arr([focal] * M),
        frontToPinSep=arr([focal] * M),
        pinToBackSep=arr([focal] * M),
        pinAperture=arr([100.0] * M),
        acceptAngle=arr([90.0] * M),
        coreDiameter=arr([1000.0] * M),
        bin_wid=arr([1.0] * M),
        data=jnp.zeros((M, 2), jnp.float32),
        nbins=1,
    )
    bank = DetectorBank(
        circle=None, annulus=None, fibre=fibre, camera=None,
        target_values=jnp.full((M,), -1.0),
        order=tuple(("fibre", j) for j in range(M)),
        ids=tuple(f"f{j}" for j in range(M)),
        layers=(1,) * M,
    )
    # vacuum scene: point source, no scattering, huge grid
    scene = S.build_scene([
        S.box([20.0, 20.0, 20.0], mono(0.0, 1e-9, 0.0, 1.0), 1),
    ])
    grid = cart_grid(64, 64, 64, 10.0, 10.0, 10.0)
    src = build_source("point", position=[0.0, 0.0, 0.0])
    cfg = TransportConfig(nphotons=nphotons,
                          n_lanes=8192 if not cpu else 2048)
    tallies, bank_out, launched, _ = simulate(
        scene, src, grid, jax.random.key(0), cfg, bank=bank
    )
    tot = np.asarray(totals(bank_out)) / int(launched)
    ok = True
    for j, a in enumerate(apertures):
        theory = 0.5 * (1 - np.cos(np.arctan(a / focal)))
        diff = abs(tot[j] - theory) / theory * 100
        print(f"aperture {a:.1f}: sim {tot[j]:.5f} theory {theory:.5f} "
              f"(%diff {diff:.2f})")
        ok = ok and diff < 5.0
    print("PASS" if ok else "FAIL")
    theory = np.array([0.5 * (1 - np.cos(np.arctan(a / focal)))
                       for a in apertures])
    return ok, tot, theory


if __name__ == "__main__":
    cpu = "--cpu" in sys.argv
    n = int(sys.argv[sys.argv.index("-n") + 1]) if "-n" in sys.argv \
        else 200_000
    main(nphotons=n, cpu=cpu)
