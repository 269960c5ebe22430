"""Refractive-index-mismatch depth-fluence validation.

Runs a broad-beam slab simulation with an air/tissue refractive-index
mismatch and compares the simulated depth fluence against the published
two-exponential diffusion approximation

    phi(z) ~ c1 * exp(-k1 * z / delta) - c2 * exp(-k2 * z / delta)

with the n = 1.37 constants c1=5.76, k1=1.00, c2=1.31, k2=10.2 (model:
reference tools/validateRIMismatch.py, which plots the same form against a
saved NRRD; here the simulation is run directly and an R^2 acceptance is
computed).  delta = 1/sqrt(3 mua (mua + mus')) is the diffusion depth.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main(nphotons=500_000, cpu=False, mua=1.0, mus=150.0, g=0.0, n=1.37,
         plot=False):
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from rsmcrt_tpu.grid import cart_grid
    from rsmcrt_tpu.optics.properties import mono
    from rsmcrt_tpu.sdfs import scene as S
    from rsmcrt_tpu.sources.sources import build_source
    from rsmcrt_tpu.tally import as_volume, normalise_fluence
    from rsmcrt_tpu.transport.engine import TransportConfig, simulate

    musp = mus * (1.0 - g)
    delta = 1.0 / np.sqrt(3.0 * mua * (mua + musp))

    # slab occupying z in [-1, 0.95], vacuum above; broad -z beam from the
    # top face so the transport is effectively 1-D in depth
    ztop = 0.95
    from rsmcrt_tpu.maths import transforms as T

    zc = (ztop - 1.0) / 2.0
    scene = S.build_scene([
        S.box([4.0, 4.0, 1.0 + ztop], mono(mus, mua, g, n), 1,
              transform=T.invert(T.translate(
                  np.array([0.0, 0.0, zc], np.float32)))),
        S.box([4.2, 4.2, 4.0], mono(0.0, 0.0, 0.0, 1.0), 2),
    ])
    grid = cart_grid(40, 40, 400, 1.0, 1.0, 1.0)
    src = build_source(
        "uniform",
        point1=[-0.5, -0.5, ztop + 0.02],
        point2=[1.0, 0.0, 0.0],
        point3=[0.0, 1.0, 0.0],
        direction=[0.0, 0.0, -1.0],
    )
    B = 2048 if cpu else 16384
    cfg = TransportConfig(nphotons=nphotons, n_lanes=B, dda_substeps=16)
    tallies, _, launched, _ = simulate(scene, src, grid,
                                       jax.random.key(7), cfg,
                                       min_lanes=256)
    flu = np.asarray(as_volume(grid, normalise_fluence(
        grid, tallies.jmean, int(launched))))
    # central-region depth profile
    c = flu[10:30, 10:30, :].mean(axis=(0, 1))
    zs = np.linspace(-1.0, 1.0, 400, endpoint=False) + 1.0 / 400
    depth = ztop - zs  # depth below the slab surface
    sel = (depth > 2 * delta) & (depth < 8 * delta)
    model = (5.76 * np.exp(-1.00 * depth / delta)
             - 1.31 * np.exp(-10.2 * depth / delta))
    msel, csel = model[sel], c[sel]
    norm = (csel * msel).sum() / (msel * msel).sum()
    res = csel - norm * msel
    r2 = 1.0 - (res**2).sum() / ((csel - csel.mean())**2).sum()
    print(f"delta = {delta:.4f} cm; fit region {2*delta:.3f}.."
          f"{8*delta:.3f} cm; R^2 = {r2:.4f} (expect > 0.95)")
    if plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.plot(depth, c, label="simulated")
        plt.plot(depth[sel], norm * msel, label="diffusion fit")
        plt.xlim(0, 10 * delta)
        plt.xlabel("depth (cm)")
        plt.ylabel("fluence")
        plt.legend()
        plt.savefig("ri_mismatch.png", dpi=110)
        print("plot -> ri_mismatch.png")
    return r2


if __name__ == "__main__":
    cpu = "--cpu" in sys.argv
    n = int(sys.argv[sys.argv.index("-n") + 1]) if "-n" in sys.argv \
        else 500_000
    main(nphotons=n, cpu=cpu, plot="--plot" in sys.argv)
