"""Detector dump reader/plotter (model: reference tools/plotDetectorsClass.py
+ plot_dect.py)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def read(filename):
    from rsmcrt_tpu.io.writer import read_detector_dat

    return read_detector_dat(filename)


def main(files):
    for f in files:
        d = read(f)
        total = d["counts"].sum() / d["nphotons"]
        print(f"{f}: type={d['tag']:.0f} id={d['id']!r} "
              f"total/N={total:.5f}")
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            plt.figure()
            plt.plot(d["bins"], d["counts"])
            plt.xlabel("bin")
            plt.ylabel("counts")
            out = Path(f).with_suffix(".png")
            plt.savefig(out, dpi=100)
            print(f"  plot -> {out}")
        except ImportError:
            pass


if __name__ == "__main__":
    main(sys.argv[1:])
