"""Slab diffuse reflectance/transmittance validation.

Runs the van de Hulst slab case (albedo 0.9, tau 2, g 0.75) and compares
against the analytic values (model: reference tools/validateHGG.py,
values from doi:10.1016/0169-2607(95)01640-F).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main(nphotons=200_000, cpu=False):
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    from rsmcrt_tpu.detectors.detectors import totals
    from rsmcrt_tpu.kernels import run_MCRT, setup

    parsed, scene = setup(Path(__file__).parents[1] / "res" /
                          "validation1.toml")
    # detector totals only: skip the per-voxel fluence estimator
    # (the reference's pathlength flag off)
    result = run_MCRT(parsed, scene, nphotons=nphotons,
                      record_fluence=False)
    tot = np.asarray(totals(result.bank)) / result.launched
    rd, td = float(tot[0]), float(tot[1])
    print(f"Theoretical total diffuse reflectance : 0.09739")
    print(f"Simulated  total diffuse reflectance : {rd:.5f}  "
          f"(%diff {abs(rd - 0.09739) / 0.09739 * 100:.2f})")
    print(f"Theoretical total diffuse transmittance : 0.66096")
    print(f"Simulated  total diffuse transmittance : {td:.5f}  "
          f"(%diff {abs(td - 0.66096) / 0.66096 * 100:.2f})")
    return rd, td


if __name__ == "__main__":
    cpu = "--cpu" in sys.argv
    n = int(sys.argv[sys.argv.index("-n") + 1]) if "-n" in sys.argv \
        else 200_000
    main(nphotons=n, cpu=cpu)
