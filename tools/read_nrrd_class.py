"""NRRD volume reader (model: reference tools/read_nrrd_class.py)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


class ReadNRRD:
    """Read NRRD volumes written by rsmcrt_tpu (or the reference)."""

    def __init__(self, filename):
        from rsmcrt_tpu.io.writer import read_nrrd

        self.data, self.fields = read_nrrd(filename)

    @property
    def shape(self):
        return self.data.shape

    def slice(self, axis=2, index=None):
        index = index if index is not None else self.data.shape[axis] // 2
        return np.take(self.data, index, axis=axis)


if __name__ == "__main__":
    vol = ReadNRRD(sys.argv[1])
    print("shape:", vol.shape)
    print("total:", vol.data.sum(), "max:", vol.data.max())
