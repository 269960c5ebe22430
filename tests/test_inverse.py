"""Inverse MCRT / gradient tests (BASELINE.md: gradients vs finite
differences; replaces the reference's dead AdaLIPO loop,
kernelsMod.f90:1663-1738)."""

import numpy as np
import pytest

import jax

from rsmcrt_tpu.inverse import (
    _forward,
    _set_prim_optics,
    detector_gradients,
    inverse_evaluate,
)

CONFIG = "res/inverse_test.toml"


@pytest.mark.slow
def test_pmc_gradient_mua_matches_fd():
    """dT/dmua from perturbation-MC statistics matches common-random-number
    finite differences (the mua likelihood ratio exp(-dmua*L) is exact
    under CRN)."""
    res = detector_gradients(CONFIG, nphotons=30000, n_lanes=4096, seed=3)
    parsed, scene, cfg, pi = (res["parsed"], res["scene"], res["cfg"],
                              res["prim_index"])

    def run(mua):
        sc = _set_prim_optics(scene, pi, 5.0, mua, 0.5, 1.0)
        tot, _, _ = _forward(parsed, sc, cfg, 3, inverse_prim=pi + 1)
        return float(tot[0])

    fds = []
    for h in (0.02, 0.05):
        fds.append((run(0.5 + h) - run(0.5 - h)) / (2 * h))
    fd = float(np.mean(fds))
    pmc = float(res["dT_dmua"][0])
    assert fd != 0.0
    # CRN finite differences carry their own sampling noise (several % at
    # this photon count and the realised value shifts with the engine's
    # RNG consumption pattern); the estimator agreed to 0.2% of FD in
    # high-statistics runs
    assert abs(pmc - fd) / abs(fd) < 0.20, (pmc, fd)
    assert np.sign(pmc) == np.sign(fd)


@pytest.mark.slow
def test_pmc_gradient_signs_and_magnitudes():
    """mus/g gradients agree with independent-seed secants in sign and
    within Monte Carlo noise."""
    res = detector_gradients(CONFIG, nphotons=30000, n_lanes=4096, seed=3)
    parsed, scene, cfg, pi = (res["parsed"], res["scene"], res["cfg"],
                              res["prim_index"])

    def run(mus, g, seed):
        sc = _set_prim_optics(scene, pi, mus, 0.5, g, 1.0)
        tot, _, _ = _forward(parsed, sc, cfg, seed, inverse_prim=pi + 1)
        return float(tot[0])

    sec_g = np.mean([
        (run(5.0, 0.6, s) - run(5.0, 0.4, s)) / 0.2 for s in (101, 202)
    ])
    pmc_g = float(res["dT_dg"][0])
    # forward-biased scattering pushes more photons to the transmission
    # detector: both must be positive and within a factor ~2
    assert pmc_g > 0 and sec_g > 0
    assert 0.4 < pmc_g / sec_g < 2.5, (pmc_g, sec_g)


def test_inverse_evaluate_matches_reference_definition():
    # reference: error = -(1/M) Sum |total/N - target| over detectors with
    # target != -1 (kernelsMod.f90:1766-1786)
    totals = np.array([100.0, 250.0, 30.0])
    targets = np.array([0.2, -1.0, 0.05])
    err = inverse_evaluate(totals, 1000, targets)
    expected = -0.5 * (abs(0.1 - 0.2) + abs(0.03 - 0.05))
    assert np.isclose(err, expected)
