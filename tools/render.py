"""Geometry/fluence rendering (model: reference tools/render.py).

Renders the scene's layer-ID voxelisation (and optionally a fluence NRRD)
to PNG slices; uses marching cubes via scikit-image when available,
otherwise writes orthogonal slices with matplotlib, else raw .npy.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def render_volume(vol, out_prefix):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        nx, ny, nz = vol.shape
        for name, sl in (("xy", vol[:, :, nz // 2]),
                         ("xz", vol[:, ny // 2, :]),
                         ("yz", vol[nx // 2, :, :])):
            plt.figure(figsize=(5, 5))
            plt.imshow(sl.T, origin="lower", cmap="viridis")
            plt.colorbar()
            out = f"{out_prefix}_{name}.png"
            plt.savefig(out, dpi=120, bbox_inches="tight")
            plt.close()
            print("wrote", out)
    except ImportError:
        out = f"{out_prefix}.npy"
        np.save(out, vol)
        print("matplotlib unavailable; wrote", out)
    try:
        from skimage import measure  # noqa: F401

        verts, faces, _, _ = measure.marching_cubes(vol, level=0.5)
        out = f"{out_prefix}_mesh.obj"
        with open(out, "w") as fh:
            for v in verts:
                fh.write(f"v {v[0]} {v[1]} {v[2]}\n")
            for f in faces:
                fh.write(f"f {f[0]+1} {f[1]+1} {f[2]+1}\n")
        print("wrote", out)
    except ImportError:
        pass


def main(argv):
    if argv and argv[0].endswith(".nrrd"):
        from rsmcrt_tpu.io.writer import read_nrrd

        vol, _ = read_nrrd(argv[0])
        render_volume(np.log10(np.maximum(vol, 1e-12)),
                      Path(argv[0]).stem)
    else:
        # render a scene's layer IDs from a config
        import jax

        if "--cpu" in argv:
            jax.config.update("jax_platforms", "cpu")
        from rsmcrt_tpu.kernels import setup
        from rsmcrt_tpu.render import render_geometry

        cfg_file = argv[0] if argv else "res/default.toml"
        parsed, scene = setup(cfg_file)
        st = parsed.settings
        img = render_geometry(
            scene,
            [float(st.grid.xmax), float(st.grid.ymax),
             float(st.grid.zmax)],
            (64, 64, 64),
        )
        render_volume(img, Path(cfg_file).stem + "_geom")


if __name__ == "__main__":
    main(sys.argv[1:])
