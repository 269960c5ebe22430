"""Checkpoint/resume round trip (reference: kernelsMod.f90:52-75 +
writer.f90:426-457)."""

import numpy as np
import pytest

from rsmcrt_tpu.kernels import default_MCRT


CFG = """
[source]
name = "point"
nphotons = {n}
position = [0.0, 0.0, 0.0]

[grid]
nxg = 16
nyg = 16
nzg = 16
xmax = 1.0
ymax = 1.0
zmax = 1.0

[geometry]
geom_name = "scat_test"
tau = 3.0

[output]
fluence = "fluence.nrrd"
overwrite = true

[simulation]
iseed = 99
load_checkpoint = {load}
checkpoint_file = "{ckpt}"
checkpoint_every_n = 1000000
"""


@pytest.mark.slow
def test_resume_continues_photon_budget(tmp_path):
    ckpt = tmp_path / "check.ckpt"
    cfg1 = tmp_path / "first.toml"
    cfg1.write_text(CFG.format(n=3000, load="false", ckpt=ckpt))

    # full run for the target statistics
    full = default_MCRT(cfg1, data_dir=tmp_path / "data_full",
                        n_lanes=1024, verbose=False)
    assert full.launched == 3000

    # partial run, checkpointed manually at 1800 photons
    from rsmcrt_tpu.io.writer import write_checkpoint
    from rsmcrt_tpu.kernels import run_MCRT, setup
    from rsmcrt_tpu.tally import as_volume

    parsed, scene = setup(cfg1)
    part = run_MCRT(parsed, scene, nphotons=1800, n_lanes=1024)
    write_checkpoint(str(cfg1), ckpt, 1800,
                     np.asarray(as_volume(parsed.settings.grid,
                                          part.tallies.jmean)))

    # resume: should run only the remaining 1200 photons and merge jmean
    cfg2 = tmp_path / "resume.toml"
    cfg2.write_text(CFG.format(n=3000, load="true", ckpt=ckpt))
    resumed = default_MCRT(cfg2, data_dir=tmp_path / "data_res",
                           n_lanes=1024, verbose=False)
    assert resumed.launched == 1200

    import jax.numpy as jnp

    merged_total = float(jnp.sum(resumed.tallies.jmean))
    part_total = float(np.asarray(part.tallies.jmean).sum())
    # merged = partial + remaining: strictly larger than the partial run
    assert merged_total > part_total
    full_total = float(np.asarray(full.tallies.jmean).sum())
    assert abs(merged_total - full_total) / full_total < 0.1
