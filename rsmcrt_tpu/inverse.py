"""Inverse MCRT: recover optical properties from detector targets.

reference: ``inverse_MCRT`` (src/kernelsMod.f90:1462-1787) searches
(mus, mua, g, n) of one SDF layer to match per-detector ``targetValue``s by
pure random exploration; its AdaLIPO exploit branch is dead code (the
``ran <= 1.0`` guard is always true, :1667) and results are never written
(:1741).

This module provides both:

- :func:`inverse_random_search` -- a working version of the reference's
  random exploration (same bounds, error definition
  ``-mean |total/N - target|``, :1753-1787), which DOES track and return
  the best parameters;
- :func:`inverse_gradient_descent` -- the TPU-native replacement: each
  forward run also accumulates per-detected-photon sufficient statistics
  (scatter count, path length, Henyey-Greenstein scores inside the target
  prim), giving closed-form perturbation-MC derivatives of every detector
  total with respect to (mus, mua, g):

      T(mus', mua') = Sum_gamma w_gamma (mus'/mus)^{s_gamma}
                      exp(-(mut' - mut) L_gamma)
      dT/dmus |_0 = Sum w (s/mus - L)
      dT/dmua |_0 = Sum w (-L)
      dT/dg   |_0 = Sum w * Sum_i d log p_HG(cos_i; g) / dg

  so Adam can descend the detector-error objective without
  differentiating through the discrete transport loop.
"""

from __future__ import annotations

from dataclasses import replace as dc_replace
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .detectors.detectors import totals as detector_totals, zero_detectors
from .kernels import default_lanes, setup
from .optics.properties import mono
from .sdfs.scene import Scene
from .transport.engine import TransportConfig, simulate

# reference bounds (kernelsMod.f90:1609-1616)
BOUNDS = {
    "mus": (0.0, 100.0),
    "mua": (0.0, 100.0),
    "g": (-1.0, 1.0),
    "n": (1.0, 20.0),
}


def _prim_location(scene: Scene, layer_id: int):
    """Find the prim whose layer ID matches (reference:
    kernelsMod.f90:1583-1600) and its (group, member) slot."""
    try:
        prim_index = scene.layer_ids.index(layer_id)
    except ValueError:
        raise ValueError(
            "Selected layer not found in SDF array please choose a layer "
            "inside the SDF array"
        )
    return prim_index


def _set_prim_optics(scene: Scene, prim_index: int, mus, mua, hgg, n):
    """Return a scene with one prim's optical properties replaced
    (reference updateOptProp, sdf_base.f90:250-259).  The tables row
    ``prim_index + 1`` holds that prim's properties."""
    i = prim_index + 1
    t = scene.tables
    new_tables = dc_replace(
        t,
        mus=t.mus.at[i].set(mus),
        mua=t.mua.at[i].set(mua),
        hgg=t.hgg.at[i].set(hgg),
        n=t.n.at[i].set(n),
    )
    return dc_replace(scene, tables=new_tables)


def inverse_evaluate(totals, nphotons, target_values):
    """Error = -(1/M) Sum |total/N - target| over detectors with a target
    (reference: inverse_evaluate, kernelsMod.f90:1753-1787)."""
    totals = np.asarray(totals, np.float64)
    targets = np.asarray(target_values, np.float64)
    mask = targets != -1.0
    if not mask.any():
        return 0.0
    diffs = np.abs(totals[mask] / nphotons - targets[mask])
    return -float(diffs.mean())


def _forward(parsed, scene, cfg, seed, inverse_prim=0):
    bank = zero_detectors(parsed.detectors)
    tallies, bank_out, launched, _ = simulate(
        scene, parsed.source, parsed.settings.grid, jax.random.key(seed),
        cfg, bank=bank,
    )
    tot = np.asarray(detector_totals(bank_out))
    stats = np.asarray(tallies.escape_tot) if inverse_prim else None
    return tot, stats, int(launched)


def inverse_random_search(input_file, nsteps=None, nphotons=None,
                          n_lanes=None, res_dir=None, verbose=True):
    """Random-exploration recovery (working version of the reference's
    explore loop, kernelsMod.f90:1663-1738)."""
    parsed, scene = setup(input_file, kernel="inverse", res_dir=res_dir)
    st = parsed.settings
    inv = st.inverse
    prim_index = _prim_location(scene, inv["layer"])

    find = [k for k, fk in (("mus", "Findmus"), ("mua", "Findmua"),
                            ("g", "Findg"), ("n", "Findn"))
            if inv[fk]]
    if not find:
        raise ValueError(
            "Please select at least one of mus, mua, hgg, n to find with "
            "inverse MCRT"
        )

    i = prim_index + 1
    current = {
        "mus": float(scene.tables.mus[i]),
        "mua": float(scene.tables.mua[i]),
        "g": float(scene.tables.hgg[i]),
        "n": float(scene.tables.n[i]),
    }
    nsteps = int(nsteps if nsteps is not None else inv["maxNumSteps"])
    nph = int(nphotons if nphotons is not None else st.nphotons)
    cfg = TransportConfig(
        nphotons=nph,
        n_lanes=int(n_lanes or default_lanes(nph)),
    )

    rng = np.random.default_rng(st.iseed)
    history = []
    best = None
    for it in range(nsteps):
        trial = dict(current)
        for k in find:
            lo, hi = BOUNDS[k]
            trial[k] = float(rng.uniform(lo, hi))
        sc = _set_prim_optics(scene, prim_index, trial["mus"],
                              trial["mua"], trial["g"], trial["n"])
        tot, _, launched = _forward(parsed, sc, cfg, st.iseed + it)
        err = inverse_evaluate(tot, launched,
                               np.asarray(parsed.detectors.target_values))
        history.append({**trial, "error": err})
        if best is None or err > best["error"]:
            best = history[-1]
        if verbose:
            print(f"step {it}: error={err:.6f} best={best['error']:.6f}")
    return best, history


def inverse_gradient_descent(input_file, nsteps=50, nphotons=None,
                             n_lanes=None, lr=0.1, res_dir=None,
                             verbose=True, seed=None):
    """Perturbation-MC gradient recovery of (mus, mua, g) -- the working,
    differentiable replacement for the reference's broken AdaLIPO loop."""
    parsed, scene = setup(input_file, kernel="inverse", res_dir=res_dir)
    st = parsed.settings
    inv = st.inverse
    prim_index = _prim_location(scene, inv["layer"])
    targets = np.asarray(parsed.detectors.target_values, np.float64)
    ndect = parsed.detectors.n_detectors

    find = [k for k, fk in (("mus", "Findmus"), ("mua", "Findmua"),
                            ("g", "Findg")) if inv[fk]]
    if inv["Findn"] and verbose:
        print("note: n recovery uses random search, not gradients")

    i = prim_index + 1
    theta = {
        "mus": float(scene.tables.mus[i]),
        "mua": float(scene.tables.mua[i]),
        "g": float(scene.tables.hgg[i]),
        "n": float(scene.tables.n[i]),
    }
    nph = int(nphotons if nphotons is not None else st.nphotons)
    cfg = TransportConfig(
        nphotons=nph,
        n_lanes=int(n_lanes or default_lanes(nph)),
        inverse_prim=prim_index + 1,
        escape_shape=(ndect, 4),
    )

    # Adam state
    m = {k: 0.0 for k in find}
    v = {k: 0.0 for k in find}
    history = []
    base_seed = seed if seed is not None else st.iseed
    for it in range(nsteps):
        sc = _set_prim_optics(scene, prim_index, theta["mus"],
                              theta["mua"], theta["g"], theta["n"])
        tot, stats, launched = _forward(parsed, sc, cfg,
                                        base_seed + it,
                                        inverse_prim=prim_index + 1)
        # stats rows: [Sum w, Sum w*cnt, Sum w*len, Sum w*hg] per detector
        sw, swc, swl, swh = (stats[:, j].astype(np.float64)
                             for j in range(4))
        err = inverse_evaluate(tot, launched, targets)
        mask = targets != -1.0
        sgn = np.sign(tot / launched - targets) * mask
        mcount = max(mask.sum(), 1)
        mus = max(theta["mus"], 1e-9)
        dT_dmus = swc / mus - swl
        dT_dmua = -swl
        dT_dg = swh
        grads = {
            "mus": -float((sgn * dT_dmus).sum() / launched / mcount),
            "mua": -float((sgn * dT_dmua).sum() / launched / mcount),
            "g": -float((sgn * dT_dg).sum() / launched / mcount),
        }
        history.append({**theta, "error": err,
                        "grads": {k: grads[k] for k in find}})
        if verbose:
            print(f"step {it}: err={err:.6f} "
                  + " ".join(f"{k}={theta[k]:.4f}" for k in find))
        # Adam ascent on err (maximise; err <= 0)
        b1, b2, eps = 0.9, 0.999, 1e-8
        for k in find:
            gk = grads[k]
            m[k] = b1 * m[k] + (1 - b1) * gk
            v[k] = b2 * v[k] + (1 - b2) * gk * gk
            mh = m[k] / (1 - b1 ** (it + 1))
            vh = v[k] / (1 - b2 ** (it + 1))
            theta[k] = theta[k] + lr * mh / (np.sqrt(vh) + eps)
            lo, hi = BOUNDS[k]
            theta[k] = float(np.clip(theta[k], lo, hi))
    return theta, history


def detector_gradients(input_file, nphotons=None, n_lanes=None,
                       res_dir=None, seed=None):
    """Per-detector totals and their pMC gradients w.r.t. (mus, mua, g) of
    the inverse layer at the current scene parameters.  Used for
    finite-difference validation."""
    parsed, scene = setup(input_file, kernel="inverse", res_dir=res_dir)
    st = parsed.settings
    inv = st.inverse
    prim_index = _prim_location(scene, inv["layer"])
    ndect = parsed.detectors.n_detectors
    nph = int(nphotons if nphotons is not None else st.nphotons)
    cfg = TransportConfig(
        nphotons=nph,
        n_lanes=int(n_lanes or default_lanes(nph)),
        inverse_prim=prim_index + 1,
        escape_shape=(ndect, 4),
    )
    tot, stats, launched = _forward(
        parsed, scene, cfg, seed if seed is not None else st.iseed,
        inverse_prim=prim_index + 1,
    )
    i = prim_index + 1
    mus = float(scene.tables.mus[i])
    sw, swc, swl, swh = (stats[:, j].astype(np.float64) for j in range(4))
    return dict(
        totals=tot,
        launched=launched,
        dT_dmus=swc / max(mus, 1e-9) - swl,
        dT_dmua=-swl,
        dT_dg=swh,
        parsed=parsed,
        scene=scene,
        prim_index=prim_index,
        cfg=cfg,
    )


def inverse_MCRT(input_file, data_dir="data", n_lanes=None, res_dir=None,
                 method="gradient", verbose=True):
    """Top-level inverse kernel (reference: kernelsMod.f90:1462-1751).
    Unlike the reference, results ARE written (its TODO at :1741)."""
    if method == "gradient":
        best, history = inverse_gradient_descent(
            input_file, n_lanes=n_lanes, res_dir=res_dir, verbose=verbose
        )
    else:
        best, history = inverse_random_search(
            input_file, n_lanes=n_lanes, res_dir=res_dir, verbose=verbose
        )
    out = Path(data_dir)
    out.mkdir(parents=True, exist_ok=True)
    with open(out / "inverse_results.dat", "w") as fh:
        fh.write("# step mus mua g n error\n")
        for it, h in enumerate(history):
            fh.write(
                f"{it} {h['mus']} {h['mua']} {h['g']} {h['n']} "
                f"{h['error']}\n"
            )
    return best, history
