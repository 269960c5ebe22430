"""Output writers: NRRD volumes, raw dumps, detector files, checkpoints.

reference: src/writer.f90.  File formats match the reference so its Python
tooling (tools/read_nrrd_class.py etc.) can read our outputs:

- NRRD: NRRD0004 text header + optional metadata lines + little-endian raw
  (writer.f90:304-424)
- detectors: stream of f64 records, type tag 1.0/2.0/3.0 for
  circle/fibre/annulus (writer.f90:55-134)
- checkpoint: text header (tomlfile=..., photons_run=...) + raw jmean
  (writer.f90:426-457); we also provide an npz checkpoint carrying *all*
  tallies + detector bins + the RNG state, fixing the reference's known
  loss of absorb/emission/detectors on resume (old_docs/TODO.md:49-57)
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np


def _unique_name(path: Path) -> Path:
    """If the file exists, append ' (n)' (reference:
    writer.f90:273-292)."""
    if not path.exists():
        return path
    i = 1
    while True:
        cand = path.with_name(f"{path.stem} ({i}){path.suffix}")
        if not cand.exists():
            return cand
        i += 1


def write_nrrd(array: np.ndarray, filename: str | Path, overwrite=True,
               metadata: dict | None = None, dect_id: str | None = None):
    """Write a 3D volume as NRRD (reference: writer.f90:304-424).  Sizes are
    written reversed like the reference header (:321-323) with
    Fortran-order raw data."""
    path = Path(filename)
    path.parent.mkdir(parents=True, exist_ok=True)
    if not overwrite:
        path = _unique_name(path)
    array = np.asarray(array)
    dtype_name = {"float32": "float", "float64": "double"}[str(array.dtype)]
    sizes = array.shape
    with open(path, "w") as fh:
        fh.write("NRRD0004\n")
        fh.write(f"type: {dtype_name}\n")
        fh.write(f"dimension: {len(sizes)}\n")
        fh.write("sizes: " + " ".join(str(s) for s in sizes[::-1]) + "\n")
        fh.write(f"space dimension: {len(sizes)}\n")
        fh.write("encoding: raw\n")
        fh.write("endian: little\n")
        if dect_id is not None:
            fh.write(f"dector: {dect_id}\n")
        if metadata:
            for k, v in metadata.items():
                if isinstance(v, bool):
                    v = str(v).lower()
                elif isinstance(v, str):
                    v = f'"{v}"'
                fh.write(f"{k} = {v}\n")
        fh.write("\n")
    with open(path, "ab") as fh:
        fh.write(array.tobytes(order="F"))
    return path


def read_nrrd(filename: str | Path):
    """Read back an NRRD volume written by :func:`write_nrrd`."""
    path = Path(filename)
    raw = path.read_bytes()
    head_end = raw.index(b"\n\n")
    header = raw[:head_end].decode()
    fields = {}
    for line in header.splitlines()[1:]:
        if ":" in line:
            k, _, v = line.partition(":")
            fields[k.strip()] = v.strip()
    sizes = [int(s) for s in fields["sizes"].split()][::-1]
    dtype = {"float": np.float32, "double": np.float64}[fields["type"]]
    data = np.frombuffer(raw[head_end + 2:], dtype=dtype)
    return data.reshape(sizes, order="F"), fields


def write_data(array, filename, overwrite=True, metadata=None,
               dect_id=None):
    """Dispatch on extension (reference: writer.f90:169-222)."""
    path = Path(filename)
    if path.suffix == ".nrrd":
        return write_nrrd(array, path, overwrite, metadata, dect_id)
    if path.suffix in (".raw", ".dat"):
        path.parent.mkdir(parents=True, exist_ok=True)
        if not overwrite:
            path = _unique_name(path)
        with open(path, "wb") as fh:
            fh.write(np.asarray(array).tobytes(order="F"))
        return path
    raise ValueError("File type not supported!")


def write_detected_photons(bank, nphotons: int, out_dir: str | Path):
    """Binary per-detector dumps (reference: writer.f90:55-134).  Format:
    f64 stream; type tag (1 circle, 2 fibre, 3 annulus), ID length + chars,
    nphotons, geometry params, then (bin_centre, count) pairs.  Camera is
    unimplemented in the reference (:127-128); we write a tagged 4.0 record
    with the 2D grid appended."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    from ..detectors.detectors import totals  # noqa

    for i, (fam, member) in enumerate(bank.order):
        path = out_dir / f"detector_{i + 1}.dat"
        dect_id = bank.ids[i]
        with open(path, "wb") as fh:
            def w(*vals):
                for v in vals:
                    fh.write(struct.pack("<d", float(v)))

            if fam == "circle":
                d = bank.circle
                w(1.0, len(dect_id))
                for ch in dect_id:
                    w(ord(ch))
                w(nphotons, d.radius[member])
                w(*np.asarray(d.pos[member]))
                w(*np.asarray(d.dir[member]))
                data = np.asarray(d.data[member])
                bw = float(d.bin_wid[member])
                for j, val in enumerate(data):
                    w((j + 0.5) * bw, val)
            elif fam == "fibre":
                d = bank.fibre
                w(2.0, len(dect_id))
                for ch in dect_id:
                    w(ord(ch))
                w(nphotons)
                w(*np.asarray(d.pos[member]))
                w(*np.asarray(d.dir[member]))
                w(d.focalLength1[member], d.focalLength2[member],
                  d.f1Aperture[member], d.f2Aperture[member],
                  d.frontOffset[member], d.backOffset[member],
                  d.frontToPinSep[member], d.pinToBackSep[member],
                  d.pinAperture[member], d.acceptAngle[member],
                  d.coreDiameter[member])
                data = np.asarray(d.data[member])
                bw = float(d.bin_wid[member])
                for j, val in enumerate(data):
                    w((j + 0.5) * bw, val)
            elif fam == "annulus":
                d = bank.annulus
                w(3.0, len(dect_id))
                for ch in dect_id:
                    w(ord(ch))
                w(nphotons, d.r1[member], d.r2[member])
                w(*np.asarray(d.pos[member]))
                w(*np.asarray(d.dir[member]))
                data = np.asarray(d.data[member])
                bw = float(d.bin_wid[member])
                for j, val in enumerate(data):
                    w((j + 0.5) * bw + float(d.r1[member]), val)
            elif fam == "camera":
                d = bank.camera
                w(4.0, len(dect_id))
                for ch in dect_id:
                    w(ord(ch))
                w(nphotons)
                np.asarray(d.data[member], np.float64).tofile(fh)


def read_detector_dat(filename):
    """Read a 1D detector dump (model: tools/plotDetectorsClass.py)."""
    raw = np.fromfile(filename, np.float64)
    tag = raw[0]
    idlen = int(raw[1])
    dect_id = "".join(chr(int(c)) for c in raw[2:2 + idlen])
    off = 2 + idlen
    nphotons = raw[off]
    off += 1
    if tag == 1.0:
        meta = dict(radius=raw[off], pos=raw[off + 1:off + 4],
                    dir=raw[off + 4:off + 7])
        off += 7
    elif tag == 3.0:
        meta = dict(r1=raw[off], r2=raw[off + 1], pos=raw[off + 2:off + 5],
                    dir=raw[off + 5:off + 8])
        off += 8
    elif tag == 2.0:
        meta = dict(pos=raw[off:off + 3], dir=raw[off + 3:off + 6],
                    params=raw[off + 6:off + 17])
        off += 17
    else:
        raise ValueError(f"unknown detector tag {tag}")
    pairs = raw[off:].reshape(-1, 2)
    return dict(tag=tag, id=dect_id, nphotons=nphotons, bins=pairs[:, 0],
                counts=pairs[:, 1], **meta)


def write_checkpoint(toml_filename: str, filename: str | Path,
                     nphotons_run: int, jmean: np.ndarray, overwrite=True):
    """Reference-format checkpoint (writer.f90:426-457)."""
    path = Path(filename)
    if not overwrite:
        path = _unique_name(path)
    with open(path, "w") as fh:
        fh.write(f"tomlfile={toml_filename}\n")
        fh.write(f"photons_run={nphotons_run}\n")
    with open(path, "ab") as fh:
        fh.write(np.asarray(jmean, np.float32).tobytes(order="F"))
    return path


def read_checkpoint(filename: str | Path, shape):
    """Read a reference-format checkpoint (kernelsMod.f90:52-72)."""
    raw = Path(filename).read_bytes()
    # two text lines then raw jmean
    first_nl = raw.index(b"\n")
    second_nl = raw.index(b"\n", first_nl + 1)
    lines = raw[:second_nl].decode().splitlines()
    toml_filename = lines[0].split("=", 1)[1]
    nphotons_run = int(lines[1].split("=", 1)[1])
    jmean = np.frombuffer(raw[second_nl + 1:], np.float32)
    jmean = jmean[: int(np.prod(shape))].reshape(shape, order="F")
    return toml_filename, nphotons_run, jmean


def write_checkpoint_full(filename: str | Path, toml_filename: str,
                          nphotons_run: int, tallies, bank=None,
                          rng_seed: int | None = None):
    """Extended npz checkpoint carrying all tallies + detector bins
    (improvement over the jmean-only reference checkpoint)."""
    payload = dict(
        toml=np.asarray(toml_filename),
        photons_run=np.asarray(nphotons_run),
        jmean=np.asarray(tallies.jmean),
        absorb=np.asarray(tallies.absorb),
        emission=np.asarray(tallies.emission),
        nscatt=np.asarray(tallies.nscatt),
    )
    if rng_seed is not None:
        payload["rng_seed"] = np.asarray(rng_seed)
    if bank is not None:
        if bank.circle is not None:
            payload["dect_circle"] = np.asarray(bank.circle.data)
        if bank.annulus is not None:
            payload["dect_annulus"] = np.asarray(bank.annulus.data)
        if bank.fibre is not None:
            payload["dect_fibre"] = np.asarray(bank.fibre.data)
        if bank.camera is not None:
            payload["dect_camera"] = np.asarray(bank.camera.data)
    np.savez(filename, **payload)


def read_checkpoint_full(filename: str | Path) -> dict:
    with np.load(filename, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}
