"""Phasor (complex field) accumulation test.  A double-slit source in
vacuum must produce interference fringes in |E|^2 on the screen plane --
the capability the reference's dead phasor array was meant for."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsmcrt_tpu.grid import cart_grid
from rsmcrt_tpu.optics.piecewise import Constant
from rsmcrt_tpu.optics.properties import mono
from rsmcrt_tpu.sdfs import scene as S
from rsmcrt_tpu.sources.sources import build_source
from rsmcrt_tpu.transport.engine import TransportConfig, simulate


@pytest.mark.slow
def test_dslit_interference():
    wl = 500e-9
    # absorbing screen medium: photons interact quickly after launch
    scene = S.build_scene([
        S.box([12.0, 12.0, 12.0], mono(0.0, 200.0, 0.0, 1.0), 1),
    ])
    grid = cart_grid(128, 4, 8, 6.0, 6.0, 6.0)
    src = build_source("dslit", position=[0.0, 0.0, 0.0],
                       spectrum=Constant(jnp.asarray(wl)))
    cfg = TransportConfig(nphotons=60000, n_lanes=8192,
                          record_phasor=True, max_steps=50000)
    tallies, _, launched, _ = simulate(scene, src, grid,
                                       jax.random.key(0), cfg)
    re = np.asarray(tallies.phasor_re).reshape(128, 4, 8)
    im = np.asarray(tallies.phasor_im).reshape(128, 4, 8)
    # field near the entry plane (z ~ +5 -> top voxels), central y
    inten = (re**2 + im**2)[:, 1:3, :].sum(axis=(1, 2))
    incoh = np.asarray(tallies.jmean).reshape(128, 4, 8)[:, 1:3, :].sum(
        axis=(1, 2))
    assert inten.sum() > 0
    # interference: the coherent intensity profile has stronger relative
    # modulation than the incoherent fluence
    mid = slice(32, 96)
    contrast = inten[mid].std() / max(inten[mid].mean(), 1e-12)
    base = incoh[mid].std() / max(incoh[mid].mean(), 1e-12)
    assert contrast > 1.5 * base, (contrast, base)
