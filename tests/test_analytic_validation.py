"""Analytic validation gates (BASELINE.md acceptance numbers).

Promotes the manual validators to pytest gates (VERDICT: these are
acceptance numbers, not scripts someone must remember to run):
- slab total diffuse reflectance 0.09739 and transmittance 0.66096
  (van de Hulst; reference tools/validateHGG.py:13-16)
- fibre collection efficiency 0.5*(1 - cos(atan(a/f)))
  (reference tools/validateFibreDect.py:24-25)
- refractive-index-mismatch slab reflectance (Giovanelli 1955 via the
  reference tools/validateRIMismatch.py)
Statistical tolerances sized for the CPU-budget photon counts."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))


@pytest.mark.slow
def test_slab_diffuse_reflectance_hgg():
    import validateHGG

    rd, td = validateHGG.main(nphotons=60_000, cpu=True)
    # SE ~ 0.0012 at 6e4 photons; gate at ~3 sigma
    assert abs(rd - 0.09739) < 0.005, rd
    assert abs(td - 0.66096) < 0.008, td


@pytest.mark.slow
def test_fibre_collection_efficiency():
    import validateFibreDect

    ok, tot, theory = validateFibreDect.main(nphotons=60_000, cpu=True)
    # each aperture's efficiency matches 0.5(1-cos atan(a/f)); relative
    # tolerance dominated by the smallest aperture (eff ~ 0.0077)
    rel = np.abs(tot - theory) / theory
    assert np.all(rel < 0.12), (tot, theory)


@pytest.mark.slow
def test_ri_mismatch_reflectance():
    import validateRIMismatch

    r2 = validateRIMismatch.main(nphotons=50_000, cpu=True)
    # diffusion-theory depth-fluence fit quality (0.95 at 5e5 photons;
    # relaxed for the CPU budget)
    assert r2 > 0.90, r2
