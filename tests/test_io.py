"""I/O round-trip tests (the reference's io suite is an empty placeholder,
test/io/test_io.f90:16-19 -- we actually test)."""

import numpy as np

from rsmcrt_tpu.io.writer import (
    read_checkpoint,
    read_detector_dat,
    read_nrrd,
    write_checkpoint,
    write_data,
    write_nrrd,
)


def test_nrrd_roundtrip(tmp_path):
    vol = np.random.default_rng(0).random((8, 6, 4)).astype(np.float32)
    path = write_nrrd(vol, tmp_path / "t.nrrd",
                      metadata={"nphotons": 100, "source": "point"})
    back, fields = read_nrrd(path)
    assert back.shape == vol.shape
    assert np.allclose(back, vol)
    assert fields["type"] == "float"
    # header sizes are written reversed like the reference
    # (writer.f90:321-323)
    assert fields["sizes"] == "4 6 8"


def test_nrrd_no_overwrite_uniquifies(tmp_path):
    vol = np.zeros((2, 2, 2), np.float32)
    p1 = write_nrrd(vol, tmp_path / "t.nrrd", overwrite=False)
    p2 = write_nrrd(vol, tmp_path / "t.nrrd", overwrite=False)
    assert p1 != p2
    assert p2.name == "t (1).nrrd"


def test_raw_write(tmp_path):
    vol = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    p = write_data(vol, tmp_path / "x.raw")
    raw = np.frombuffer(p.read_bytes(), np.float32)
    assert np.allclose(np.sort(raw), np.sort(vol.reshape(-1)))


def test_checkpoint_roundtrip(tmp_path):
    jmean = np.random.default_rng(1).random((4, 4, 4)).astype(np.float32)
    p = write_checkpoint("input.toml", tmp_path / "check.ckpt", 1234,
                         jmean)
    toml_name, nrun, back = read_checkpoint(p, (4, 4, 4))
    assert toml_name == "input.toml"
    assert nrun == 1234
    assert np.allclose(back, jmean)


def test_detector_dump_roundtrip(tmp_path):
    import jax.numpy as jnp

    from rsmcrt_tpu.detectors.detectors import CircleDetectors, \
        DetectorBank
    from rsmcrt_tpu.io.writer import write_detected_photons

    circle = CircleDetectors(
        pos=jnp.asarray([[0.0, 0.0, 1.0]]),
        dir=jnp.asarray([[0.0, 0.0, 1.0]]),
        radius=jnp.asarray([0.5]),
        bin_wid=jnp.asarray([0.05]),
        data=jnp.asarray([[0.0, 2.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
                           0.0, 5.0]]),
        nbins=10,
    )
    bank = DetectorBank(
        circle=circle, annulus=None, fibre=None, camera=None,
        target_values=jnp.asarray([-1.0]),
        order=(("circle", 0),), ids=("mydect",), layers=(1,),
    )
    write_detected_photons(bank, 1000, tmp_path)
    out = read_detector_dat(tmp_path / "detector_1.dat")
    assert out["tag"] == 1.0
    assert out["id"] == "mydect"
    assert out["nphotons"] == 1000
    assert out["radius"] == 0.5
    assert np.isclose(out["counts"].sum(), 8.0)
    assert np.isclose(out["bins"][1], 1.5 * 0.05)
