"""Source launch distribution tests (model: reference
test/photon/test_photon.f90 statistical checks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsmcrt_tpu.grid import cart_grid
from rsmcrt_tpu.optics.piecewise import Constant, piecewise2d
from rsmcrt_tpu.sources.sources import N_SOURCE_UNIFORMS, Source, \
    build_source, sample

GRID = cart_grid(64, 64, 64, 1.0, 1.0, 1.0)


def draw(src, n=20000, seed=0, sid=None):
    u = jax.random.uniform(jax.random.key(seed), (n, N_SOURCE_UNIFORMS))
    return sample(src, GRID, u, sid=sid) if sid is not None else \
        sample(src, GRID, u)


def test_point_isotropy():
    src = build_source("point", position=[0.1, -0.2, 0.3],
                       spectrum=Constant(jnp.asarray(500.0)))
    pos, d, phase, wl = draw(src)
    assert np.allclose(np.asarray(pos), [0.1, -0.2, 0.3], atol=1e-6)
    d = np.asarray(d)
    assert np.allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)
    # isotropic: each component mean ~ 0, <z^2> = 1/3
    assert np.all(np.abs(d.mean(axis=0)) < 0.02)
    assert abs((d[:, 2] ** 2).mean() - 1.0 / 3.0) < 0.01
    assert np.allclose(np.asarray(wl), 500.0)


def test_pencil():
    src = build_source("pencil", position=[0.0, 0.0, -1.0],
                       direction=[0.0, 0.0, 1.0])
    pos, d, _, _ = draw(src, n=100)
    assert np.allclose(np.asarray(d), [0, 0, 1])
    # boundary nudge: photon launched exactly on the face moves inside
    assert np.all(np.asarray(pos)[:, 2] > -1.0)


def test_uniform_rectangle():
    src = build_source(
        "uniform", direction=[0.0, 0.0, -1.0],
        point1=[-1.0, -1.0, 0.9], point2=[2.0, 0.0, 0.0],
        point3=[0.0, 2.0, 0.0],
    )
    pos, d, _, _ = draw(src)
    pos = np.asarray(pos)
    assert pos[:, 0].min() >= -1.0 and pos[:, 0].max() <= 1.0
    assert np.allclose(pos[:, 2], 0.9, atol=1e-6)
    # uniformity: mean ~ centre of the rectangle
    assert np.all(np.abs(pos[:, :2].mean(axis=0)) < 0.02)


def test_circular_disc():
    src = build_source("circular", position=[0.0, 0.0, 0.5],
                       direction=[0.0, 0.0, 1.0], radius=0.3)
    pos, d, _, _ = draw(src)
    pos = np.asarray(pos)
    r = np.sqrt(pos[:, 0] ** 2 + pos[:, 1] ** 2)
    assert r.max() <= 0.3 + 1e-5
    # area-uniform: <r^2> = R^2/2
    assert abs((r**2).mean() - 0.3**2 / 2) < 2e-3
    assert np.allclose(np.asarray(d), [0, 0, 1])


def test_focus_converges_to_focal_point():
    src = build_source(
        "focus", position=[0.0, 0.0, -1.0], rotation=[0.0, 0.0, -1.0],
        focalLength=1.0, beam_size=0.2, focus_type="circle",
    )
    pos, d, _, _ = draw(src, n=5000)
    pos, d = np.asarray(pos), np.asarray(d)
    # directions point along -z toward the focus
    assert np.all(d[:, 2] < 0.0)
    # rays converge: propagate to the focal plane, spread shrinks
    t = (-1.0 - 1.0 - pos[:, 2]) / d[:, 2]
    foc = pos[:, :2] + t[:, None] * d[:, :2]
    assert np.abs(foc).max() < np.abs(pos[:, :2]).max()


def test_annulus_tophat():
    src = build_source(
        "annulus", position=[0.0, 0.0, -1.0], rotation=[0.0, 0.0, -1.0],
        focalLength=1.0, rlo=0.3, rhi=0.5, sigma=0.04,
        annulus_type="tophat",
    )
    pos, d, _, _ = draw(src, n=5000)
    pos = np.asarray(pos)
    r = np.sqrt(pos[:, 0] ** 2 + pos[:, 1] ** 2)
    assert r.min() >= 0.3 - 1e-4
    assert r.max() <= 0.5 + 1e-4


def test_dslit_geometry():
    src = build_source("dslit", position=[0.0, 0.0, 0.0],
                       spectrum=Constant(jnp.asarray(500e-9)))
    pos, d, phase, wl = draw(src, n=2000)
    d = np.asarray(d)
    assert np.all(d[:, 2] < 0.0)  # travels toward -z screen
    assert np.all(np.asarray(phase) > 0.0)  # slit-to-screen distance


def test_slm_image_histogram():
    """SLM image source reproduces the source image distribution
    (reference threshold 6e-2, test_photon.f90:324)."""
    img = np.zeros((8, 8))
    img[2, 3] = 1.0
    img[6, 1] = 3.0
    spec = piecewise2d(0.5, 0.5, img)
    src = Source(kind="slm",
                 params={"position": jnp.zeros(3),
                         "direction": jnp.asarray([0.0, 0.0, -1.0])},
                 spectrum=spec)
    u = jax.random.uniform(jax.random.key(1), (40000, N_SOURCE_UNIFORMS))
    pos, d, _, _ = sample(src, GRID, u)
    # recover pixel indices from scaled positions
    x = np.asarray(pos[:, 0]) * (GRID.nxg / (2 * float(GRID.xmax))) + 100.0
    y = np.asarray(pos[:, 1]) * (GRID.nyg / (2 * float(GRID.ymax))) + 100.0
    xi = np.round(x).astype(int)
    yi = np.round(y).astype(int)
    frac_61 = np.mean((xi == 6) & (yi == 1))
    assert abs(frac_61 - 0.75) < 6e-2


def test_escape_points_source():
    positions = jnp.asarray([[0.0, 0.0, -0.5], [0.0, 0.0, 0.5]])
    src = Source(kind="escape_points", params={"positions": positions})
    sid = jnp.asarray([0, 1] * 500, jnp.int32)
    u = jax.random.uniform(jax.random.key(2), (1000, N_SOURCE_UNIFORMS))
    pos, d, _, _ = sample(src, GRID, u, sid=sid)
    pos = np.asarray(pos)
    assert np.allclose(pos[::2], [0.0, 0.0, -0.5])
    assert np.allclose(pos[1::2], [0.0, 0.0, 0.5])
