"""TOML configuration parsing.

Replicates the reference's config schema and semantics
(reference: src/parse/parse.f90, parse_source.f90, parse_geometry.f90,
parse_detectors.f90, parse_spectrum.f90; schema doc old_docs/config.md)
using Python's tomllib.  Defaults and error cases mirror the reference so
its configs run unchanged.
"""

from __future__ import annotations

import tomllib
from dataclasses import dataclass, field as dfield
from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .detectors.detectors import (
    AnnulusDetectors,
    CameraDetectors,
    CircleDetectors,
    DetectorBank,
    FibreDetectors,
)
from .grid import CartGrid, CylGrid, cart_grid, cyl_grid
from .optics.piecewise import Constant, piecewise1d, piecewise2d
from .sources.sources import Source, build_source


class ConfigError(ValueError):
    """Raised on invalid configuration (reference: toml_error paths)."""


@dataclass
class Settings:
    """Mirror of the reference's global ``settings_t`` state
    (reference: src/sim_state.f90:10-58)."""

    nphotons: int = 1_000_000
    iseed: int = 123456789
    render_size: tuple = (200, 200, 200)
    experiment: str = "sphere"
    outfile: str = "fluence.nrrd"
    rendergeomfile: str = "geom_render.nrrd"
    rendersourcefile: str = "source_render.nrrd"
    source: str = "point"
    historyFilename: str = "photPos.obj"
    outfile_absorb: str = "absorb.nrrd"
    grid: Optional[CartGrid] = None
    render_geom: bool = False
    render_source: bool = False
    tev: bool = False
    overwrite: bool = False
    trackHistory: bool = False
    absorb: bool = False
    phasor: bool = False
    ckptfreq: int = 1_000_000
    loadckpt: bool = False
    ckptfile: str = "check.ckpt"
    # opt-in unbiased bounce roulette (this framework's straggler
    # mitigation; 0 = reference-parity off)
    roulette_bounces: int = 0
    roulette_chance: float = 0.1
    units: str = "cm"
    # escape-function symmetry (reference: parse.f90:188-340)
    symmetry_type: str = "none"
    sym_grid_cart: Optional[CartGrid] = None
    sym_grid_cyl: Optional[CylGrid] = None
    sym_pos: tuple = (0.0, 0.0, 0.0)
    sym_dir: tuple = (0.0, 0.0, 1.0)
    sym_rot: float = 0.0
    # inverse kernel (reference: parse.f90:342-402)
    inverse: Optional[dict] = None


@dataclass
class ParsedConfig:
    settings: Settings
    source: Source
    detectors: Optional[DetectorBank]
    geometry: dict  # geometry params fed to the scene registry
    spectrum: object


def _get_vector(table, key, context, default=None):
    """reference: parse_helpers.f90 get_vector"""
    if key not in table:
        if default is not None:
            return np.asarray(default, np.float64)
        raise ConfigError(f"Need a vector for {key} in {context}")
    v = table[key]
    if not isinstance(v, list) or len(v) != 3 or isinstance(v[0], str):
        raise ConfigError(
            f"Need a vector of size 3 for {key} in {context}"
        )
    return np.asarray(v, np.float64)


_CARDINALS = {
    "x": (1.0, 0.0, 0.0),
    "-x": (-1.0, 0.0, 0.0),
    "y": (0.0, 1.0, 0.0),
    "-y": (0.0, -1.0, 0.0),
    "z": (0.0, 0.0, 1.0),
    "-z": (0.0, 0.0, -1.0),
}


def _parse_spectrum(table, res_dir: Path):
    """reference: parse_spectrum.f90:17-118"""
    stype = table.get("spectrum_type", "constant")
    if stype == "constant":
        wavelength = float(table.get("wavelength", 500.0))
        return Constant(jnp.asarray(wavelength, jnp.float32))
    if stype == "1D":
        sfile = table.get("spectrum_file")
        if sfile is None:
            raise ConfigError("1D spectrum requires spectrum_file")
        try:
            arr = np.loadtxt(res_dir / sfile)
        except ValueError:
            # the reference's stdlib loadtxt accepts comma-separated
            # columns (e.g. its blood.dat asset)
            arr = np.loadtxt(res_dir / sfile, delimiter=",")
        return piecewise1d(arr)
    if stype == "2D":
        sfile = table.get("spectrum_file")
        if sfile is None:
            raise ConfigError("2D spectrum requires spectrum_file")
        cell = table.get("cell_size")
        if not isinstance(cell, list) or len(cell) != 2:
            raise ConfigError("Need a vector of size 2 for cell_size")
        path = res_dir / sfile
        if path.suffix == ".png":
            image = _load_png_grey(path)
        else:
            image = np.loadtxt(path)
        return piecewise2d(cell[0], cell[1], image)
    raise ConfigError(
        "Not a valid spectrum type! expected one of "
        "['constant', '1D', '2D']"
    )


def _load_png_grey(path: Path) -> np.ndarray:
    """Minimal PNG loader (first channel), replacing the reference's
    stb_image dependency (parse_spectrum.f90:92-101)."""
    try:
        from PIL import Image  # noqa

        return np.asarray(Image.open(path).convert("L"), np.float64)
    except ImportError:
        pass
    import struct
    import zlib

    data = path.read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a png"
    pos_ = 8
    width = height = None
    bitdepth = colortype = None
    idat = b""
    while pos_ < len(data):
        (length,) = struct.unpack(">I", data[pos_:pos_ + 4])
        ctype = data[pos_ + 4:pos_ + 8]
        chunk = data[pos_ + 8:pos_ + 8 + length]
        if ctype == b"IHDR":
            width, height, bitdepth, colortype = struct.unpack(
                ">IIBB", chunk[:10]
            )
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
        pos_ += 12 + length
    if bitdepth != 8:
        raise ConfigError("only 8-bit PNGs supported")
    nchan = {0: 1, 2: 3, 4: 2, 6: 4}[colortype]
    raw = zlib.decompress(idat)
    stride = width * nchan
    img = np.zeros((height, width, nchan), np.uint8)
    prev = np.zeros(stride, np.uint8)
    off = 0
    for row in range(height):
        filt = raw[off]
        line = np.frombuffer(raw[off + 1:off + 1 + stride],
                             np.uint8).astype(np.int32)
        off += 1 + stride
        out = np.zeros(stride, np.int32)
        pa = np.zeros(stride, np.int32)
        for i in range(stride):
            a = out[i - nchan] if i >= nchan else 0
            b = int(prev[i])
            c = int(prev[i - nchan]) if i >= nchan else 0
            x = line[i]
            if filt == 0:
                val = x
            elif filt == 1:
                val = x + a
            elif filt == 2:
                val = x + b
            elif filt == 3:
                val = x + (a + b) // 2
            elif filt == 4:
                p = a + b - c
                dists = (abs(p - a), abs(p - b), abs(p - c))
                pred = (a, b, c)[int(np.argmin(dists))]
                val = x + pred
            else:
                raise ConfigError("bad png filter")
            out[i] = val & 0xFF
        img[row] = out.reshape(width, nchan)
        prev = out.astype(np.uint8)
        del pa
    # match stb_image orientation: (width, height) with first channel
    return img[:, :, 0].T.astype(np.float64)


def _parse_source(cfg: dict, settings: Settings, res_dir: Path):
    """reference: parse_source.f90:17-264"""
    table = cfg.get("source")
    if table is None:
        raise ConfigError("Simulation needs Source table")
    name = table.get("name", "point")
    settings.source = name
    settings.nphotons = int(table.get("nphotons", 1_000_000))

    pos = None
    if name != "uniform":
        pos = _get_vector(table, "position", "source")

    rotation = None
    if name not in ("uniform", "point", "circular", "pencil"):
        if "rotation" not in table:
            raise ConfigError("Source requires rotation variable")
        rotation = _get_vector(table, "rotation", "source")
        if np.linalg.norm(rotation) < 1e-8:
            raise ConfigError(
                "Need to specify rotation that has length greater than 0.0"
            )
        rotation = rotation / np.linalg.norm(rotation)

    direction = None
    raw_dir = table.get("direction")
    if isinstance(raw_dir, str):
        if raw_dir not in _CARDINALS:
            raise ConfigError(
                "Direction needs a cardinal direction i.e x, y, or z"
            )
        direction = np.asarray(_CARDINALS[raw_dir])
    elif isinstance(raw_dir, list):
        direction = _get_vector(table, "direction", "source")
    elif name not in ("point", "annulus", "focus"):
        raise ConfigError("Need to specify direction for source type!")

    points = {}
    for pkey in ("point1", "point2", "point3"):
        if pkey in table:
            points[pkey] = _get_vector(table, pkey, "source")
        elif name == "uniform":
            raise ConfigError(
                f"Uniform source requires {pkey} variable"
            )

    spectrum = _parse_spectrum(table, res_dir)

    kwargs = dict(
        position=pos,
        direction=direction,
        radius=float(table.get("radius", 0.5)),
        focalLength=float(table.get("focalLength", 1.0)),
        rhi=float(table.get("rhi", 0.6)),
        rlo=float(table.get("rlo", 0.5)),
        sigma=float(table.get("sigma", 0.04)),
        beam_size=float(table.get("beam_size", 0.5)),
        rotation=rotation,
        **points,
    )
    if name == "annulus":
        kwargs["annulus_type"] = table.get("annulus_type", "gaussian")
    if name == "focus":
        kwargs["focus_type"] = table.get("focus_type", "gaussian")
    if name == "point" and direction is None:
        kwargs["direction"] = np.asarray([0.0, 0.0, 1.0])
    if direction is None and name in ("annulus", "focus"):
        kwargs["direction"] = np.asarray([0.0, 0.0, -1.0])

    src = build_source(name, spectrum=spectrum, **kwargs)
    return src, spectrum


def _parse_grid(cfg: dict, settings: Settings):
    """reference: parse.f90:75-112"""
    table = cfg.get("grid")
    if table is None:
        raise ConfigError("Need grid table in input param file")
    settings.units = table.get("units", "cm")
    settings.grid = cart_grid(
        int(table.get("nxg", 200)),
        int(table.get("nyg", 200)),
        int(table.get("nzg", 200)),
        float(table.get("xmax", 1.0)),
        float(table.get("ymax", 1.0)),
        float(table.get("zmax", 1.0)),
    )


def _parse_geometry(cfg: dict, settings: Settings):
    """reference: parse_geometry.f90:17-292.  Returns the scene parameter
    dict keyed like the reference's metadata dict."""
    table = cfg.get("geometry")
    if table is None:
        raise ConfigError("Need geometry table in input param file")
    settings.experiment = table.get("geom_name", "sphere")
    num = int(table.get("numOptProp", 1))
    if num < 1:
        raise ConfigError(
            "Need to set an integer value of at least one or greater for "
            "numOptProp"
        )
    if settings.experiment == "sphere" and num != 1:
        raise ConfigError("For geometry of sphere must set numOptProp to one")
    if settings.experiment == "box" and num != 1:
        raise ConfigError("For geometry of box must set numOptProp to one")
    if settings.experiment == "egg" and num != 3:
        raise ConfigError("For geometry of egg must set numOptProp to three")

    def opt_array(key, default):
        if key in table:
            arr = table[key]
            if not isinstance(arr, list) or len(arr) != num:
                raise ConfigError(
                    f"length of {key} must be equal to numOptProp"
                )
            return [float(v) for v in arr]
        return [default] * num

    params = {
        "numOptProp": num,
        "mua": opt_array("mua", 0.0),
        "mus": opt_array("mus", 1.0),
        "mur": opt_array("mur", 0.0),
        "hgg": opt_array("hgg", 0.0),
        "n": opt_array("n", 1.0),
        "tau": float(table.get("tau", 10.0)),
        "num_spheres": int(table.get("num_spheres", 10)),
        "musb": float(table.get("musb", 0.0)),
        "muab": float(table.get("muab", 0.01)),
        "musc": float(table.get("musc", 0.0)),
        "muac": float(table.get("muac", 0.01)),
        "hgga": float(table.get("hgga", 0.7)),
    }
    params["position"] = list(
        _get_vector(table, "position", "geometry",
                    default=[0.0, 0.0, 0.0])
    )
    params["boundinglength"] = list(
        _get_vector(table, "boundingBox", "geometry",
                    default=[2.0, 2.0, 2.0])
    )
    if settings.experiment == "sphere":
        params["sphereRadius"] = float(table.get("sphereRadius", 1.0))
    if settings.experiment == "box":
        params["BoxDimensions"] = list(
            _get_vector(table, "BoxDimensions", "geometry",
                        default=[1.0, 1.0, 1.0])
        )
    if settings.experiment == "egg":
        default_top = 3.0 * np.sqrt(2.0 - np.sqrt(2.0))
        params["BottomSphereRadius"] = float(
            table.get("BottomSphereRadius", 3.0)
        )
        params["TopSphereRadius"] = float(
            table.get("TopSphereRadius", default_top)
        )
        params["SphereSep"] = float(table.get("SphereSep", default_top))
        params["ShellThickness"] = float(table.get("ShellThickness", 0.05))
        params["YolkRadius"] = float(table.get("YolkRadius", 1.5))
    return params


def _parse_detectors(cfg: dict, settings: Settings):
    """reference: parse_detectors.f90:17-141.  Builds stacked family
    pytrees in config order."""
    entries = cfg.get("detectors")
    if not entries:
        return None

    families = {"circle": [], "annulus": [], "fibre": [], "camera": []}
    order = []
    ids = []
    layers = []
    targets = []
    for entry in entries:
        dtype_ = entry.get("type")
        if dtype_ not in families:
            raise ConfigError(
                "Invalid detector type. Valid types are "
                "[circle, annulus, camera]"
            )
        if "ID" not in entry:
            raise ConfigError("Need to specify a detector ID")
        track = bool(entry.get("trackHistory", False))
        if track:
            settings.trackHistory = True
        settings.historyFilename = entry.get(
            "historyFileName", "photPos.obj"
        )
        targets.append(float(entry.get("inverseTarget", -1.0)))
        ids.append(entry["ID"])
        layers.append(int(entry.get("layer", 1)))
        order.append((dtype_, len(families[dtype_])))
        families[dtype_].append(entry)

    f32 = lambda rows, key, default: jnp.asarray(
        [float(r.get(key, default)) for r in rows], jnp.float32
    )
    vec = lambda rows, key, default: jnp.asarray(
        [_get_vector(r, key, "detector", default=default) for r in rows],
        jnp.float32,
    )

    def nbins_of(rows, default):
        """Per-detector bin counts (reference detectors each carry their
        own nbins, detectors.f90:107-210); the family data array pads to
        the max."""
        per = [int(r.get("nbins", default)) for r in rows]
        return max(per), jnp.asarray(per, jnp.int32)

    circle = annulus = fibre = camera = None
    rows = families["circle"]
    if rows:
        nbins, nbins_arr = nbins_of(rows, 100)
        radius = f32(rows, "radius", 1.0)
        bw = jnp.where(nbins_arr == 0, 1.0,
                       radius / jnp.maximum(nbins_arr, 1))
        dirs = vec(rows, "direction", [0.0, 0.0, -1.0])
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        circle = CircleDetectors(
            pos=vec(rows, "position", None),
            dir=dirs,
            radius=radius,
            bin_wid=bw,
            data=jnp.zeros((len(rows), nbins + 1), jnp.float32),
            nbins=nbins,
            nbins_arr=nbins_arr,
        )
    rows = families["annulus"]
    if rows:
        nbins, nbins_arr = nbins_of(rows, 100)
        r1 = f32(rows, "radius1", 0.1)
        r2 = f32(rows, "radius2", 0.2)
        if bool(jnp.any(r2 <= r1)):
            raise ConfigError("Radii are invalid: expected radius2 > radius1")
        dirs = vec(rows, "direction", [0.0, 0.0, -1.0])
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        annulus = AnnulusDetectors(
            pos=vec(rows, "position", None),
            dir=dirs,
            r1=r1,
            r2=r2,
            bin_wid=jnp.where(nbins_arr == 0, 1.0,
                              (r2 - r1) / jnp.maximum(nbins_arr, 1)),
            data=jnp.zeros((len(rows), nbins + 1), jnp.float32),
            nbins=nbins,
            nbins_arr=nbins_arr,
        )
    rows = families["fibre"]
    if rows:
        nbins, nbins_arr = nbins_of(rows, 1)
        fl1 = f32(rows, "focalLength1", 1.0)
        fl2 = f32(rows, "focalLength2", 1.0)
        f1a = f32(rows, "f1Aperture", 1.0)
        f2a = f32(rows, "f2Aperture", 1.0)
        core = f32(rows, "coreDiameter", 0.01)
        dirs = vec(rows, "direction", [0.0, 0.0, -1.0])
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        fibre = FibreDetectors(
            pos=vec(rows, "position", None),
            dir=dirs,
            focalLength1=fl1,
            focalLength2=fl2,
            f1Aperture=f1a,
            f2Aperture=f2a,
            frontOffset=f32(rows, "frontOffset", 0.0),
            backOffset=jnp.asarray(
                [float(r.get("backOffset", float(r.get("focalLength2", 1.0))))
                 for r in rows], jnp.float32),
            frontToPinSep=jnp.asarray(
                [float(r.get("frontToPinSep",
                             float(r.get("focalLength1", 1.0))))
                 for r in rows], jnp.float32),
            pinToBackSep=jnp.asarray(
                [float(r.get("pinToBackSep",
                             float(r.get("focalLength2", 1.0))))
                 for r in rows], jnp.float32),
            pinAperture=jnp.asarray(
                [float(r.get("pinAperture",
                             max(float(r.get("f1Aperture", 1.0)),
                                 float(r.get("f2Aperture", 1.0)))))
                 for r in rows], jnp.float32),
            acceptAngle=f32(rows, "acceptanceAngle", 90.0),
            coreDiameter=core,
            bin_wid=jnp.where(nbins_arr == 0, 1.0,
                              core / 2.0 / jnp.maximum(nbins_arr, 1)),
            data=jnp.zeros((len(rows), nbins + 1), jnp.float32),
            nbins=nbins,
            nbins_arr=nbins_arr,
        )
    rows = families["camera"]
    if rows:
        nbins, nbins_arr = nbins_of(rows, 100)
        maxval = f32(rows, "maxval", 100.0)
        p1 = vec(rows, "p1", [-1.0, -1.0, -1.0])
        p2 = vec(rows, "p2", [2.0, 0.0, 0.0])
        p3 = vec(rows, "p3", [0.0, 2.0, 0.0])
        e1 = p2 - p1
        e2 = p3 - p1
        n = jnp.cross(e2, e1)
        n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
        camera = CameraDetectors(
            pos=p1,
            n=n,
            e1=e1,
            e2=e2,
            width=jnp.linalg.norm(e1, axis=-1),
            height=jnp.linalg.norm(e2, axis=-1),
            bin_wid_x=maxval / (nbins_arr + 1),
            bin_wid_y=maxval / (nbins_arr + 1),
            data=jnp.zeros((len(rows), nbins + 1, nbins + 1), jnp.float32),
            nbins=nbins,
            nbins_arr=nbins_arr,
        )

    return DetectorBank(
        circle=circle, annulus=annulus, fibre=fibre, camera=camera,
        target_values=jnp.asarray(targets, jnp.float32),
        order=tuple(order), ids=tuple(ids), layers=tuple(layers),
    )


def _parse_output(cfg: dict, settings: Settings):
    """reference: parse.f90:114-157"""
    table = cfg.get("output")
    if table is None:
        raise ConfigError("Need output table in input param file")
    settings.outfile = table.get("fluence", "fluence.nrrd")
    settings.outfile_absorb = table.get("absorb", "absorb.nrrd")
    settings.rendergeomfile = table.get(
        "render_geometry_name", "geom_render.nrrd"
    )
    settings.render_geom = bool(table.get("render_geometry", False))
    settings.rendersourcefile = table.get(
        "render_source_name", "source_render.nrrd"
    )
    settings.render_source = bool(table.get("render_source", False))
    rs = table.get("render_size")
    if rs is not None:
        if not isinstance(rs, list) or len(rs) < 3:
            raise ConfigError("Need a vector of size 3 for render_size.")
        settings.render_size = tuple(int(v) for v in rs[:3])
    settings.overwrite = bool(table.get("overwrite", False))


def _parse_simulation(cfg: dict, settings: Settings):
    """reference: parse.f90:159-186"""
    table = cfg.get("simulation")
    if table is None:
        raise ConfigError("Need simulation table in input param file")
    settings.iseed = int(table.get("iseed", 123456789))
    settings.tev = bool(table.get("tev", False))
    settings.absorb = bool(table.get("absorb", False))
    # product-path switch for the complex phasor tally (reference
    # allocates phasor in iarray.f90:14 and accumulates phase in
    # photon.f90; here the volume is actually written by finalise)
    settings.phasor = bool(table.get("phasor", False))
    settings.loadckpt = bool(table.get("load_checkpoint", False))
    settings.ckptfile = table.get("checkpoint_file", "check.ckpt")
    settings.ckptfreq = int(table.get("checkpoint_every_n", 1_000_000))
    # opt-in unbiased straggler mitigation (no reference equivalent: the
    # reference hard-kills at 1000 bounces, inttau2.f90:313-315)
    settings.roulette_bounces = int(table.get("roulette_bounces", 0))
    settings.roulette_chance = float(table.get("roulette_chance", 0.1))


def _parse_symmetry(cfg: dict, settings: Settings):
    """reference: parse.f90:188-340 (escape-function kernel only)."""
    table = cfg.get("symmetry")
    if table is None:
        settings.symmetry_type = "none"
        settings.nphotons = 100_000
        settings.sym_grid_cart = cart_grid(10, 10, 10, 1.0, 1.0, 1.0)
        return
    stype = table.get("symmetryType", "none")
    settings.nphotons = int(table.get("escapenphotons", 100_000))
    gs = table.get("GridSize", [10, 10, 10])
    mv = table.get("maxValues", [1.0, 1.0, 1.0])
    if len(gs) != 3:
        raise ConfigError("Need a vector of size 3 for symmetry grid size.")
    if len(mv) != 3:
        raise ConfigError("Need a vector of size 3 for symmetry max values.")
    pos = table.get("position", [0.0, 0.0, 0.0])
    dirc = table.get("direction", [0.0, 0.0, 1.0])
    rot = float(table.get("rotation", 0.0))
    if rot < 0.0 or rot >= 360.0:
        raise ConfigError(
            "Must specifcy a rotation for symmetry that is between 0.0 and "
            "360.0, inclusive of 0.0"
        )
    if all(v == 0.0 for v in dirc):
        raise ConfigError("Must specify a non-zero direction for symmetry")
    dirc = np.asarray(dirc, np.float64)
    dirc = tuple(dirc / np.linalg.norm(dirc))
    settings.symmetry_type = stype
    settings.sym_pos = tuple(float(v) for v in pos)
    settings.sym_dir = dirc
    settings.sym_rot = rot
    if stype in ("none", "prism", "flipped", "uniformSlab"):
        settings.sym_grid_cart = cart_grid(
            int(gs[0]), int(gs[1]), int(gs[2]), mv[0], mv[1], mv[2]
        )
    elif stype in ("noneRotational", "360rotational"):
        settings.sym_grid_cyl = cyl_grid(
            int(gs[0]), int(gs[1]), int(gs[2]), mv[0], mv[1], mv[2]
        )
    else:
        raise ConfigError("Unrecognised symmetry type")


def _parse_inverse(cfg: dict, settings: Settings):
    """reference: parse.f90:342-402 (inverse kernel only)."""
    table = cfg.get("inverse")
    if table is None:
        raise ConfigError("Need inverse table in input param file")
    if "layer" not in table:
        raise ConfigError("Must specifiy a layer in inverse table")
    settings.inverse = dict(
        maxStepSize=float(table.get("maxStepSize", 1.0)),
        gradStepSize=float(table.get("gradStepSize", 0.0001)),
        accuracy=float(table.get("accuracy", 0.01)),
        maxNumSteps=int(table.get("maxNumSteps", 1000)),
        Findmua=bool(table.get("Findmua", False)),
        Findmus=bool(table.get("Findmus", False)),
        Findg=bool(table.get("Findg", False)),
        Findn=bool(table.get("Findn", False)),
        layer=int(table["layer"]),
    )


def parse_params(filename: str | Path, res_dir: str | Path | None = None,
                 kernel: str = "default") -> ParsedConfig:
    """Entry point (reference: parse.f90:20-72).  ``kernel`` selects the
    extra table parsed: 'escape' -> symmetry, 'inverse' -> inverse."""
    filename = Path(filename)
    res_dir = Path(res_dir) if res_dir is not None else filename.parent
    with open(filename, "rb") as fh:
        cfg = tomllib.load(fh)

    settings = Settings()
    source, spectrum = _parse_source(cfg, settings, res_dir)
    _parse_grid(cfg, settings)
    geometry = _parse_geometry(cfg, settings)
    detectors = _parse_detectors(cfg, settings)
    _parse_output(cfg, settings)
    _parse_simulation(cfg, settings)
    if kernel == "escape":
        _parse_symmetry(cfg, settings)
    elif kernel == "inverse":
        _parse_inverse(cfg, settings)
    return ParsedConfig(
        settings=settings, source=source, detectors=detectors,
        geometry=geometry, spectrum=spectrum,
    )
