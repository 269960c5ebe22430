"""Generate the original spectral test assets in res/.

- res/blood.dat: a blood-LIKE emission/flux spectrum (analytic double
  Gaussian on the Soret + Q bands, NOT the reference's measured data) in
  the same two-column comma-separated format the reference's stdlib
  loadtxt reads (reference asset: test/optical_props/blood.dat; loader
  parse_spectrum.f90:60-80).
- res/spectrum2D.png: an 8-bit greyscale image for the piecewise2D
  spectrum path (reference asset: test/parse/test.png; loader
  parse_spectrum.f90:92-117) -- a radial blob plus gradient so the 2D
  CDF is non-trivial.

Run: python tools/gen_spectrum.py
"""

from pathlib import Path

import numpy as np

RES = Path(__file__).resolve().parent.parent / "res"


def blood_like(wl):
    """Double-peaked haemoglobin-like flux curve (analytic original)."""
    soret = 9.0e4 * np.exp(-0.5 * ((wl - 420.0) / 22.0) ** 2)
    q1 = 2.1e4 * np.exp(-0.5 * ((wl - 542.0) / 12.0) ** 2)
    q2 = 2.4e4 * np.exp(-0.5 * ((wl - 577.0) / 11.0) ** 2)
    base = 3.0e3 * np.exp(-(wl - 250.0) / 300.0)
    return soret + q1 + q2 + base


def main():
    wl = np.arange(250.0, 1000.1, 2.0)
    flux = blood_like(wl)
    with open(RES / "blood.dat", "w") as fh:
        for w, f in zip(wl, flux):
            fh.write(f"{w:.1f}, {f:.1f}\n")

    from PIL import Image

    n = 64
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float64)
    r2 = (xx - 24.0) ** 2 + (yy - 40.0) ** 2
    img = 200.0 * np.exp(-r2 / (2 * 10.0**2)) + 55.0 * xx / n
    Image.fromarray(img.astype(np.uint8), "L").save(RES / "spectrum2D.png")
    print("wrote", RES / "blood.dat", "and", RES / "spectrum2D.png")


if __name__ == "__main__":
    main()
