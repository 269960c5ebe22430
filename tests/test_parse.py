"""Config parsing tests (model: reference test/parse/test_parse.f90 --
golden values plus the error paths)."""

import numpy as np
import pytest

from rsmcrt_tpu.config import ConfigError, parse_params


def write_cfg(tmp_path, body):
    p = tmp_path / "test.toml"
    p.write_text(body)
    return p


BASE = """
[source]
name = "point"
nphotons = 10000
position = [0.0, 0.0, 0.0]

[grid]
nxg = 64
nyg = 64
nzg = 64
xmax = 1.5
ymax = 1.5
zmax = 1.5

[geometry]
geom_name = "scat_test"
tau = 10.0

[output]
fluence = "out.nrrd"
overwrite = true

[simulation]
iseed = 42
"""


def test_golden_parse(tmp_path):
    parsed = parse_params(write_cfg(tmp_path, BASE))
    st = parsed.settings
    assert st.nphotons == 10000
    assert st.iseed == 42
    assert st.source == "point"
    assert st.experiment == "scat_test"
    assert st.outfile == "out.nrrd"
    assert st.overwrite is True
    assert st.grid.nxg == 64
    assert float(st.grid.xmax) == 1.5
    assert parsed.geometry["tau"] == 10.0
    # roulette defaults off (reference-parity analog transport)
    assert st.roulette_bounces == 0
    assert st.roulette_chance == 0.1


def test_display_settings_banner(tmp_path):
    """Run-provenance banner (reference display_settings,
    kernelsMod.f90:2441-2485): config echo with source/geometry/seed."""
    from rsmcrt_tpu.kernels import display_settings

    parsed = parse_params(write_cfg(tmp_path, BASE))
    banner = display_settings(parsed, tmp_path / "test.toml")
    assert "Settings" in banner
    assert "Config file: test.toml" in banner
    assert "Light source: point" in banner
    assert "Light Source Position: [0, 0, 0]" in banner
    assert "Geometry: scat_test" in banner
    assert "Seed: 42" in banner
    # every row is the reference's fixed 50-char boxed format
    for line in banner.splitlines():
        assert line.startswith("#") and line.endswith("#")


def test_roulette_knobs_parsed(tmp_path):
    cfg = BASE.replace("iseed = 42",
                       "iseed = 42\nroulette_bounces = 12\n"
                       "roulette_chance = 0.2")
    st = parse_params(write_cfg(tmp_path, cfg)).settings
    assert st.roulette_bounces == 12
    assert st.roulette_chance == 0.2


def test_grid_defaults(tmp_path):
    # reference: 200^3, 1 cm half extents (parse.f90:95-101)
    cfg = BASE.replace(
        "nxg = 64\nnyg = 64\nnzg = 64\nxmax = 1.5\nymax = 1.5\nzmax = 1.5",
        "",
    )
    parsed = parse_params(write_cfg(tmp_path, cfg))
    assert parsed.settings.grid.nxg == 200
    assert float(parsed.settings.grid.xmax) == 1.0


def test_missing_grid_table_errors(tmp_path):
    cfg = "\n".join(
        s for s in BASE.split("\n[grid]")[0].splitlines()
    ) + """
[geometry]
geom_name = "sphere"
[output]
[simulation]
"""
    with pytest.raises(ConfigError, match="grid table"):
        parse_params(write_cfg(tmp_path, cfg))


def test_missing_source_table_errors(tmp_path):
    cfg = BASE.replace("[source]", "[sourceX]", 1)
    with pytest.raises(ConfigError, match="Source table"):
        parse_params(write_cfg(tmp_path, cfg))


def test_missing_output_table_errors(tmp_path):
    cfg = BASE.replace("[output]", "[outputX]")
    with pytest.raises(ConfigError, match="output table"):
        parse_params(write_cfg(tmp_path, cfg))


def test_missing_simulation_table_errors(tmp_path):
    cfg = BASE.replace("[simulation]", "[simulationX]")
    with pytest.raises(ConfigError, match="simulation table"):
        parse_params(write_cfg(tmp_path, cfg))


def test_cardinal_directions(tmp_path):
    cfg = BASE.replace('name = "point"', 'name = "pencil"').replace(
        "position = [0.0, 0.0, 0.0]",
        'position = [0.0, 0.0, 0.0]\ndirection = "-z"',
    )
    parsed = parse_params(write_cfg(tmp_path, cfg))
    d = np.asarray(parsed.source.params["direction"])
    assert np.allclose(d, [0, 0, -1])


def test_bad_cardinal_errors(tmp_path):
    cfg = BASE.replace('name = "point"', 'name = "pencil"').replace(
        "position = [0.0, 0.0, 0.0]",
        'position = [0.0, 0.0, 0.0]\ndirection = "w"',
    )
    with pytest.raises(ConfigError, match="cardinal"):
        parse_params(write_cfg(tmp_path, cfg))


def test_pencil_needs_direction(tmp_path):
    cfg = BASE.replace('name = "point"', 'name = "pencil"')
    with pytest.raises(ConfigError, match="direction"):
        parse_params(write_cfg(tmp_path, cfg))


def test_uniform_requires_points(tmp_path):
    cfg = BASE.replace(
        'name = "point"\nnphotons = 10000\nposition = [0.0, 0.0, 0.0]',
        'name = "uniform"\nnphotons = 10000\ndirection = "-z"\n'
        "point1 = [-1.0, -1.0, 1.0]\npoint2 = [2.0, 0.0, 0.0]",
    )
    with pytest.raises(ConfigError, match="point3"):
        parse_params(write_cfg(tmp_path, cfg))


def test_rotation_required_for_annulus(tmp_path):
    cfg = BASE.replace(
        'name = "point"', 'name = "annulus"'
    )
    with pytest.raises(ConfigError, match="rotation"):
        parse_params(write_cfg(tmp_path, cfg))


def test_detector_requires_id(tmp_path):
    cfg = BASE + """
[[detectors]]
type = "circle"
position = [0.0, 0.0, 0.5]
"""
    with pytest.raises(ConfigError, match="detector ID"):
        parse_params(write_cfg(tmp_path, cfg))


def test_bad_detector_type(tmp_path):
    cfg = BASE + """
[[detectors]]
type = "dome"
ID = "d"
"""
    with pytest.raises(ConfigError, match="Invalid detector type"):
        parse_params(write_cfg(tmp_path, cfg))


def test_annulus_radius_validation(tmp_path):
    cfg = BASE + """
[[detectors]]
type = "annulus"
ID = "a"
position = [0.0, 0.0, 0.5]
radius1 = 0.5
radius2 = 0.2
"""
    with pytest.raises(ConfigError, match="radius2"):
        parse_params(write_cfg(tmp_path, cfg))


def test_detectors_parsed_in_order(tmp_path):
    cfg = BASE + """
[[detectors]]
type = "annulus"
ID = "ring"
position = [0.0, 0.0, 0.5]
radius1 = 0.1
radius2 = 0.3

[[detectors]]
type = "circle"
ID = "disc"
position = [0.0, 0.0, -0.5]
radius = 0.4

[[detectors]]
type = "fibre"
ID = "fib"
position = [0.0, 0.5, 0.0]

[[detectors]]
type = "camera"
ID = "cam"
"""
    parsed = parse_params(write_cfg(tmp_path, cfg))
    bank = parsed.detectors
    assert bank.n_detectors == 4
    assert bank.ids == ("ring", "disc", "fib", "cam")
    assert bank.order[0][0] == "annulus"
    assert bank.order[1][0] == "circle"
    assert np.isclose(float(bank.circle.radius[0]), 0.4)
    assert np.isclose(float(bank.annulus.r2[0]), 0.3)
    # fibre defaults (parse_detectors.f90:265-275)
    assert float(bank.fibre.backOffset[0]) == 1.0
    assert float(bank.fibre.acceptAngle[0]) == 90.0
    # inverse targets default to -1
    assert np.all(np.asarray(bank.target_values) == -1.0)


def test_numoptprop_validation(tmp_path):
    cfg = BASE.replace('geom_name = "scat_test"\ntau = 10.0', """geom_name = "sphere"
numOptProp = 2
mus = [1.0, 2.0]
""")
    with pytest.raises(ConfigError, match="numOptProp to one"):
        parse_params(write_cfg(tmp_path, cfg))


def test_opt_array_length_mismatch(tmp_path):
    cfg = BASE.replace('geom_name = "scat_test"\ntau = 10.0', """geom_name = "egg"
numOptProp = 3
mus = [1.0, 2.0]
""")
    with pytest.raises(ConfigError, match="mus"):
        parse_params(write_cfg(tmp_path, cfg))


def test_spectrum_constant_default(tmp_path):
    parsed = parse_params(write_cfg(tmp_path, BASE))
    from rsmcrt_tpu.optics.piecewise import Constant

    assert isinstance(parsed.spectrum, Constant)
    assert float(parsed.spectrum.value) == 500.0


def test_spectrum_1d(tmp_path):
    data = tmp_path / "spec.dat"
    data.write_text("400.0 0.0\n500.0 1.0\n600.0 0.0\n")
    cfg = BASE.replace(
        "position = [0.0, 0.0, 0.0]",
        'position = [0.0, 0.0, 0.0]\nspectrum_type = "1D"\n'
        'spectrum_file = "spec.dat"',
    )
    parsed = parse_params(write_cfg(tmp_path, cfg))
    from rsmcrt_tpu.optics.piecewise import Piecewise1D

    assert isinstance(parsed.spectrum, Piecewise1D)


def test_bad_spectrum_type(tmp_path):
    cfg = BASE.replace(
        "position = [0.0, 0.0, 0.0]",
        'position = [0.0, 0.0, 0.0]\nspectrum_type = "3D"',
    )
    with pytest.raises(ConfigError, match="valid spectrum type"):
        parse_params(write_cfg(tmp_path, cfg))


def test_symmetry_parsing(tmp_path):
    cfg = BASE + """
[symmetry]
symmetryType = "uniformSlab"
escapenphotons = 5000
GridSize = [3, 4, 5]
maxValues = [1.0, 2.0, 3.0]
direction = [0.0, 1.0, 0.0]
"""
    parsed = parse_params(write_cfg(tmp_path, cfg), kernel="escape")
    st = parsed.settings
    assert st.symmetry_type == "uniformSlab"
    assert st.nphotons == 5000
    assert st.sym_grid_cart.nxg == 3
    assert st.sym_dir == (0.0, 1.0, 0.0)


def test_symmetry_rotation_bounds(tmp_path):
    cfg = BASE + """
[symmetry]
symmetryType = "none"
rotation = 400.0
"""
    with pytest.raises(ConfigError, match="rotation"):
        parse_params(write_cfg(tmp_path, cfg), kernel="escape")


def test_inverse_requires_layer(tmp_path):
    cfg = BASE + """
[inverse]
Findmua = true
"""
    with pytest.raises(ConfigError, match="layer"):
        parse_params(write_cfg(tmp_path, cfg), kernel="inverse")
