"""Detector unit tests (model: reference test/detector/test_detector.f90 +
test/geometry/test_geometry.f90)."""

import jax.numpy as jnp
import numpy as np

from rsmcrt_tpu.detectors.detectors import (
    AnnulusDetectors,
    CameraDetectors,
    CircleDetectors,
    DetectorBank,
    FibreDetectors,
    intersect_circle,
    intersect_cone,
    intersect_cylinder,
    intersect_ellipse,
    intersect_plane,
    intersect_sphere,
    record_hits,
    totals,
    zero_detectors,
)


def arr(v):
    return jnp.asarray(v, jnp.float32)


# --- geometry intersectors (reference test_geometry.f90) -----------------

def test_intersect_sphere():
    hit, t = intersect_sphere(arr([[0.0, 0.0, -2.0]]),
                              arr([[0.0, 0.0, 1.0]]),
                              arr([0.0, 0.0, 0.0]), 1.0)
    assert bool(hit[0]) and np.isclose(float(t[0]), 1.0, atol=1e-6)


def test_intersect_plane_and_circle():
    n = arr([[0.0, 0.0, 1.0]])
    p0 = arr([[0.0, 0.0, 1.0]])
    hit, t = intersect_plane(n, p0, arr([[0.0, 0.0, 0.0]]),
                             arr([[0.0, 0.0, 1.0]]))
    assert bool(hit[0]) and np.isclose(float(t[0]), 1.0)
    # ray moving away never hits (denom <= 1e-6)
    hit, _ = intersect_plane(n, p0, arr([[0.0, 0.0, 0.0]]),
                             arr([[0.0, 0.0, -1.0]]))
    assert not bool(hit[0])
    hit, t, d = intersect_circle(n, p0, 0.5, arr([[0.3, 0.0, 0.0]]),
                                 arr([[0.0, 0.0, 1.0]]))
    assert bool(hit[0]) and np.isclose(float(d[0]), 0.3, atol=1e-6)
    hit, _, _ = intersect_circle(n, p0, 0.5, arr([[0.7, 0.0, 0.0]]),
                                 arr([[0.0, 0.0, 1.0]]))
    assert not bool(hit[0])


def test_intersect_cylinder_ellipse_cone():
    hit, t = intersect_cylinder(arr([[2.0, 0.0, 0.0]]),
                                arr([[-1.0, 0.0, 0.0]]),
                                arr([0.0, 0.0, 0.0]), 0.5)
    assert bool(hit[0]) and np.isclose(float(t[0]), 1.5, atol=1e-6)
    hit, t = intersect_ellipse(arr([[0.0, 2.0, 0.0]]),
                               arr([[0.0, -1.0, 0.0]]),
                               arr([0.0, 0.0, 0.0]), 1.0, 0.5)
    assert bool(hit[0]) and np.isclose(float(t[0]), 1.5, atol=1e-5)
    # cone: radius 1 at base z=0, apex z=1; ray at z=0 hits radius 1
    hit, t = intersect_cone(arr([[2.0, 0.0, 0.0]]),
                            arr([[-1.0, 0.0, 0.0]]),
                            arr([0.0, 0.0, 0.0]), 1.0, 1.0)
    assert bool(hit[0]) and np.isclose(float(t[0]), 1.0, atol=1e-5)


# --- detector binning (reference test_detector.f90) ----------------------

def make_circle(radius=0.5, nbins=10):
    return CircleDetectors(
        pos=arr([[0.0, 0.0, 0.0]]),
        dir=arr([[0.0, 0.0, 1.0]]),
        radius=arr([radius]),
        bin_wid=arr([radius / nbins]),
        data=jnp.zeros((1, nbins + 1), jnp.float32),
        nbins=nbins,
    )


def bank_with(circle=None, annulus=None, fibre=None, camera=None, n=1):
    return DetectorBank(
        circle=circle, annulus=annulus, fibre=fibre, camera=camera,
        target_values=jnp.full((n,), -1.0),
        order=tuple(
            [("circle", 0)] * (circle is not None)
            + [("annulus", 0)] * (annulus is not None)
            + [("fibre", 0)] * (fibre is not None)
            + [("camera", 0)] * (camera is not None)
        ),
        ids=tuple("d%d" % i for i in range(n)),
        layers=(1,) * n,
    )


def test_circle_hit_and_binned_sum():
    bank = bank_with(circle=make_circle())
    o = arr([[0.2, 0.0, -1.0]])
    d = arr([[0.0, 0.0, 1.0]])
    out = record_hits(bank, o, d, arr([2.0]), arr([1.0]))
    assert np.isclose(float(totals(out)[0]), 1.0)
    # radius 0.2 -> bin round(0.2/0.05)=4
    assert float(out.circle.data[0, 4]) == 1.0
    # segment too short: no hit
    out2 = record_hits(bank, o, d, arr([0.5]), arr([1.0]))
    assert float(totals(out2)[0]) == 0.0
    # outside the disc: no hit
    out3 = record_hits(bank, arr([[0.7, 0.0, -1.0]]), d, arr([2.0]),
                       arr([1.0]))
    assert float(totals(out3)[0]) == 0.0


def test_annulus_accept_reject():
    ann = AnnulusDetectors(
        pos=arr([[0.0, 0.0, 0.0]]),
        dir=arr([[0.0, 0.0, 1.0]]),
        r1=arr([0.25]),
        r2=arr([0.5]),
        bin_wid=arr([0.025]),
        data=jnp.zeros((1, 11), jnp.float32),
        nbins=10,
    )
    bank = bank_with(annulus=ann)
    d = arr([[0.0, 0.0, 1.0]])
    hit_in = record_hits(bank, arr([[0.3, 0.0, -1.0]]), d, arr([2.0]),
                         arr([1.0]))
    assert float(totals(hit_in)[0]) == 1.0
    miss_void = record_hits(bank, arr([[0.1, 0.0, -1.0]]), d, arr([2.0]),
                            arr([1.0]))
    assert float(totals(miss_void)[0]) == 0.0
    miss_out = record_hits(bank, arr([[0.6, 0.0, -1.0]]), d, arr([2.0]),
                           arr([1.0]))
    assert float(totals(miss_out)[0]) == 0.0


def test_fibre_on_axis_acceptance():
    fib = FibreDetectors(
        pos=arr([[0.0, 0.0, 0.0]]),
        dir=arr([[0.0, 0.0, 1.0]]),
        focalLength1=arr([1.0]), focalLength2=arr([1.0]),
        f1Aperture=arr([0.5]), f2Aperture=arr([0.5]),
        frontOffset=arr([0.0]), backOffset=arr([1.0]),
        frontToPinSep=arr([1.0]), pinToBackSep=arr([1.0]),
        pinAperture=arr([0.5]), acceptAngle=arr([10.0]),
        coreDiameter=arr([0.2]),
        bin_wid=arr([0.01]),
        data=jnp.zeros((1, 2), jnp.float32),
        nbins=1,
    )
    bank = bank_with(fibre=fib)
    d = arr([[0.0, 0.0, 1.0]])
    # on-axis photon through the 4f system reaches the fibre
    out = record_hits(bank, arr([[0.0, 0.0, -1.0]]), d, arr([2.0]),
                      arr([1.0]))
    assert float(totals(out)[0]) == 1.0
    # off-axis parallel ray images to -0.45 at the fibre plane; the
    # reference's core check uses the SIGNED radius so this is accepted
    # (detectors.f90:388 with negative radius) -- we match that behavior
    out2 = record_hits(bank, arr([[0.45, 0.0, -1.0]]), d, arr([2.0]),
                       arr([1.0]))
    assert float(totals(out2)[0]) == 1.0
    # a ray blocked by the pinhole IS rejected: shorten the front-to-pin
    # distance so the image plane is not at the pinhole
    import dataclasses
    fib2 = dataclasses.replace(bank.fibre, frontToPinSep=arr([0.5]),
                               pinAperture=arr([0.2]))
    bank2 = bank_with(fibre=fib2)
    out3 = record_hits(bank2, arr([[0.45, 0.0, -1.0]]), d, arr([2.0]),
                       arr([1.0]))
    assert float(totals(out3)[0]) == 0.0


def test_camera_counts_not_weights():
    p1 = arr([[-1.0, -1.0, -1.0]])
    e1 = arr([[2.0, 0.0, 0.0]])
    e2 = arr([[0.0, 2.0, 0.0]])
    n = jnp.cross(e2, e1)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    cam = CameraDetectors(
        pos=p1, n=n, e1=e1, e2=e2,
        width=jnp.linalg.norm(e1, axis=-1),
        height=jnp.linalg.norm(e2, axis=-1),
        bin_wid_x=arr([100.0 / 11]), bin_wid_y=arr([100.0 / 11]),
        data=jnp.zeros((1, 11, 11), jnp.float32),
        nbins=10,
    )
    bank = bank_with(camera=cam)
    out = record_hits(bank, arr([[0.0, 0.0, 0.0]]),
                      arr([[0.0, 0.0, -1.0]]), arr([5.0]), arr([0.25]))
    # camera adds counts (1), not the photon weight (detector_base.f90:229)
    assert float(totals(out)[0]) == 1.0


def test_camera_bins_segment_start():
    """Parity golden: the reference bins the SEGMENT START position, not
    the plane intersection -- x = start.z + det.pos.x, y = start.y +
    det.pos.y (detector_base.f90:222-223 with hitpoint%pos = the pre-move
    startPos, inttau2.f90:195-200).  Pinned here bug-for-bug (VERDICT r2
    Missing #2)."""
    p1 = arr([[-1.0, -1.0, -1.0]])
    e1 = arr([[2.0, 0.0, 0.0]])
    e2 = arr([[0.0, 2.0, 0.0]])
    n = jnp.cross(e2, e1)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    cam = CameraDetectors(
        pos=p1, n=n, e1=e1, e2=e2,
        width=jnp.linalg.norm(e1, axis=-1),
        height=jnp.linalg.norm(e2, axis=-1),
        bin_wid_x=arr([0.2]), bin_wid_y=arr([0.2]),
        data=jnp.zeros((1, 11, 11), jnp.float32),
        nbins=10,
    )
    bank = bank_with(camera=cam)
    # start (0.3, 0.45, 1.25), dir -z: intersects the z=-1 plane inside
    # the rectangle.  Reference binning: x = 1.25 - 1 = 0.25 ->
    # idx = min(int(0.25/0.2)+1, 10) = 2 (1-based); y = 0.45 - 1 = -0.55
    # -> int(-2.75)+1 = -1 < 1 -> idy = nbins = 10 (the negative-wrap
    # quirk).  0-based: data[0, 1, 9].
    out = record_hits(bank, arr([[0.3, 0.45, 1.25]]),
                      arr([[0.0, 0.0, -1.0]]), arr([5.0]), arr([1.0]))
    assert float(totals(out)[0]) == 1.0
    assert float(out.camera.data[0, 1, 9]) == 1.0
    # intersection-point binning would give x = -1 - 1 = -2 (wrap to 10)
    # instead: assert we did NOT bin there
    assert float(out.camera.data[0, 9, 9]) == 0.0


def test_zero_detectors_preserves_geometry():
    bank = bank_with(circle=make_circle())
    o = arr([[0.2, 0.0, -1.0]])
    d = arr([[0.0, 0.0, 1.0]])
    out = record_hits(bank, o, d, arr([2.0]), arr([1.0]))
    z = zero_detectors(out)
    assert float(totals(z)[0]) == 0.0
    assert float(z.circle.radius[0]) == 0.5
