"""Raman detection efficiency: elementwise product of an excitation
fluence volume and a detector escape-function volume
(model: reference tools/CalcRamanDectEff.py).

Usage: python tools/calc_raman_dect_eff.py fluence.nrrd escape.nrrd out.nrrd
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main(fluence_file, escape_file, out_file):
    from rsmcrt_tpu.io.writer import read_nrrd, write_nrrd

    fluence, fhdr = read_nrrd(fluence_file)
    escape, ehdr = read_nrrd(escape_file)
    if fluence.shape != escape.shape:
        raise SystemExit(
            f"volume shapes differ: {fluence.shape} vs {escape.shape}"
        )
    out = Path(out_file)
    if out.exists():
        raise SystemExit(f"refusing to overwrite {out}")
    eff = np.asarray(fluence) * np.asarray(escape)
    out.parent.mkdir(parents=True, exist_ok=True)
    write_nrrd(eff, out, metadata={"source_fluence": str(fluence_file),
                                   "source_escape": str(escape_file)})
    print(f"raman detection efficiency -> {out}  "
          f"(total {eff.sum():.6g}, max {eff.max():.6g})")


if __name__ == "__main__":
    if len(sys.argv) != 4:
        raise SystemExit(__doc__)
    main(*sys.argv[1:4])
