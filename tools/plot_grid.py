"""Orthogonal mid-slice plots plus a depth profile of an NRRD volume
(model: reference tools/plotGrid.py / plot_nrrd_layer.py).

Usage: python tools/plot_grid.py fluence.nrrd [--log] [--axis 2]
       [--index N] [-o out.png]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main(argv):
    from rsmcrt_tpu.io.writer import read_nrrd

    fname = argv[0]
    log = "--log" in argv
    out = (argv[argv.index("-o") + 1] if "-o" in argv
           else str(Path(fname).with_suffix(".png")))
    sel_axis = (int(argv[argv.index("--axis") + 1]) if "--axis" in argv
                else None)
    sel_index = (int(argv[argv.index("--index") + 1]) if "--index" in argv
                 else None)
    data, hdr = read_nrrd(fname)
    data = np.asarray(data)
    if log:
        data = np.log10(np.maximum(data, data[data > 0].min()
                                   if (data > 0).any() else 1e-30))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    names = ["x", "y", "z"]
    if sel_axis is not None:
        # single selected slice
        idx = (sel_index if sel_index is not None
               else data.shape[sel_axis] // 2)
        fig, ax = plt.subplots(figsize=(6, 5))
        im = ax.imshow(np.take(data, idx, axis=sel_axis).T,
                       origin="lower", cmap="inferno")
        ax.set_title(f"{names[sel_axis]} = {idx}")
        fig.colorbar(im, ax=ax, shrink=0.8)
    else:
        fig, axes = plt.subplots(2, 2, figsize=(9, 8))
        for ax, axis in zip(axes.flat[:3], range(3)):
            idx = (sel_index if sel_index is not None
                   else data.shape[axis] // 2)
            sl = np.take(data, idx, axis=axis)
            im = ax.imshow(sl.T, origin="lower", cmap="inferno")
            ax.set_title(f"{names[axis]} = {idx} slice")
            fig.colorbar(im, ax=ax, shrink=0.8)
        prof = data.mean(axis=(0, 1))
        axes.flat[3].plot(prof)
        axes.flat[3].set_title("mean over x,y vs z index")
    fig.suptitle(Path(fname).name + (" (log10)" if log else ""))
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    print(f"plot -> {out}")


if __name__ == "__main__":
    if not sys.argv[1:]:
        raise SystemExit(__doc__)
    main(sys.argv[1:])
