"""Generate procedural blood-vessel data (res/nodes.dat, edges.dat,
radii.dat) for the vessels scene.

The reference ships externally-derived vessel data it never documents;
this generator builds an original branching tree instead: a main trunk
along +x that bifurcates recursively with radius decay (Murray-like
r -> r * 0.79), deterministic (seeded) so the committed files are
reproducible.  Formats match get_vessels (rsmcrt_tpu/scenes.py):
nodes.dat rows "x y z", edges.dat 1-based "n0 n1", radii.dat one radius
per node.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def build_tree(seed=4, depth=4, trunk_len=60.0, radius0=6.0):
    rng = np.random.default_rng(seed)
    nodes = [np.array([-90.0, 0.0, 0.0]), np.array([-30.0, 0.0, 0.0])]
    radii = [radius0, radius0]
    edges = [(1, 2)]

    def grow(idx, direction, length, radius, level):
        if level > depth:
            return
        for sign in (1.0, -1.0):
            # branch: rotate direction by ~35 deg in a random plane
            ang = np.deg2rad(30.0 + 10.0 * rng.uniform())
            axis = rng.normal(size=3)
            axis -= axis @ direction * direction
            axis /= np.linalg.norm(axis)
            d = (np.cos(ang) * direction
                 + np.sin(ang) * sign * axis)
            d /= np.linalg.norm(d)
            new = nodes[idx - 1] + d * length
            nodes.append(new)
            r = radius * 0.79
            radii.append(r)
            edges.append((idx, len(nodes)))
            grow(len(nodes), d, length * 0.72, r, level + 1)

    grow(2, np.array([1.0, 0.0, 0.0]), trunk_len * 0.8, radius0, 1)
    return np.asarray(nodes), np.asarray(edges), np.asarray(radii)


def main(out_dir="res"):
    nodes, edges, radii = build_tree()
    out = Path(out_dir)
    np.savetxt(out / "nodes.dat", nodes, fmt="%.6f")
    np.savetxt(out / "edges.dat", edges, fmt="%d")
    np.savetxt(out / "radii.dat", radii, fmt="%.6f")
    print(f"{len(nodes)} nodes, {len(edges)} edges -> {out}/")


if __name__ == "__main__":
    main()
