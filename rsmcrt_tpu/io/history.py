"""Photon path history writers: obj, ply, json.

reference: src/historyStack.f90 -- per-photon position traces written when
a photon hits a detector.  The engine records traces in a fixed ring per
lane and flushes detected lanes into ``tallies.tracks [n, H, 4]``
(x, y, z, scatter order); these writers serialise them.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np


def _valid_points(track: np.ndarray):
    """A track's entry 0 is the launch; later entries have increasing
    scatter order.  Zero rows beyond the recorded count are dropped."""
    # keep rows until the first all-zero row after index 0
    keep = []
    for i, row in enumerate(track):
        if i > 0 and not np.any(row):
            break
        keep.append(row)
    return np.asarray(keep)


def write_history_obj(tracks: np.ndarray, count: int, filename):
    """Wavefront OBJ polylines (reference: historyStack.f90:184-226)."""
    path = Path(filename)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as fh:
        offset = 1
        lines = []
        for i in range(count):
            pts = _valid_points(tracks[i])
            if len(pts) < 2:
                continue
            for p in pts:
                fh.write(f"v {p[0]} {p[1]} {p[2]}\n")
            idx = " ".join(str(offset + j) for j in range(len(pts)))
            lines.append(f"l {idx}\n")
            offset += len(pts)
        for ln in lines:
            fh.write(ln)
    return path


def write_history_ply(tracks: np.ndarray, count: int, filename):
    """PLY vertices + polyline edges (reference: historyStack.f90:228-273)."""
    path = Path(filename)
    path.parent.mkdir(parents=True, exist_ok=True)
    verts = []
    edges = []
    for i in range(count):
        pts = _valid_points(tracks[i])
        if len(pts) < 2:
            continue
        base = len(verts)
        verts.extend(pts[:, :3].tolist())
        edges.extend(
            (base + j, base + j + 1) for j in range(len(pts) - 1)
        )
    with open(path, "w") as fh:
        fh.write("ply\nformat ascii 1.0\n")
        fh.write(f"element vertex {len(verts)}\n")
        fh.write("property float x\nproperty float y\nproperty float z\n")
        fh.write(f"element edge {len(edges)}\n")
        fh.write("property int vertex1\nproperty int vertex2\n")
        fh.write("end_header\n")
        for v in verts:
            fh.write(f"{v[0]} {v[1]} {v[2]}\n")
        for a, b in edges:
            fh.write(f"{a} {b}\n")
    return path


def write_history_json(tracks: np.ndarray, count: int, filename):
    """JSON list of tracks (reference: historyStack.f90:275-308)."""
    path = Path(filename)
    path.parent.mkdir(parents=True, exist_ok=True)
    out = []
    for i in range(count):
        pts = _valid_points(tracks[i])
        if len(pts) < 2:
            continue
        out.append([
            {"pos": [float(p[0]), float(p[1]), float(p[2])],
             "step": int(p[3])} for p in pts
        ])
    path.write_text(json.dumps(out))
    return path


def write_history(tracks, count, filename):
    """Dispatch on extension like the reference history stack
    (historyStack.f90 obj/ply/json variants)."""
    suffix = Path(filename).suffix
    if suffix == ".obj":
        return write_history_obj(tracks, count, filename)
    if suffix == ".ply":
        return write_history_ply(tracks, count, filename)
    if suffix == ".json":
        return write_history_json(tracks, count, filename)
    raise ValueError(f"unsupported history format {suffix!r}")
