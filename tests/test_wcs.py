"""Exact celestial WCS tests (nestfit_tpu/wcs.py).

Validated against analytic special-geometry identities of the
Calabretta & Greisen (2002) projection equations -- astropy is not
available in this environment, and closed-form cases at the equator
and pole pin the rotation + projection math jointly.
"""

import numpy as np
import pytest

from nestfit_tpu.wcs import CelestialWCS


def _hdr(code, crval1=83.5, crval2=22.0, cd=-2.8e-4, cd2=None):
    return {
        "CTYPE1": f"RA---{code}", "CTYPE2": f"DEC--{code}",
        "CRVAL1": crval1, "CRVAL2": crval2,
        "CRPIX1": 33.0, "CRPIX2": 17.0,
        "CDELT1": cd, "CDELT2": -cd if cd2 is None else cd2,
    }


@pytest.mark.parametrize("code", ["TAN", "SIN", "ARC"])
def test_reference_pixel_and_roundtrip(code):
    w = CelestialWCS(_hdr(code))
    ra, dec = w.pixel_to_world(33.0, 17.0)
    np.testing.assert_allclose([ra, dec], [83.5, 22.0], atol=1e-12)
    # pixel -> world -> pixel identity over a grid
    p1, p2 = np.meshgrid(np.arange(1.0, 66.0, 7.0),
                         np.arange(1.0, 34.0, 5.0))
    lon, lat = w.pixel_to_world(p1, p2)
    q1, q2 = w.world_to_pixel(lon, lat)
    # float64 trig roundtrip: ~1e-7 pixel at arcsecond pixel scales
    np.testing.assert_allclose(q1, p1, atol=1e-6)
    np.testing.assert_allclose(q2, p2, atol=1e-6)


def test_tan_equator_analytic():
    """Gnomonic projection at dec=0: a point at RA offset D on the
    equator lands at plane x = (180/pi) tan(D) exactly."""
    w = CelestialWCS(_hdr("TAN", crval1=180.0, crval2=0.0, cd=1.0, cd2=1.0))
    for d_deg in (0.5, 2.0, 10.0):
        x_expect = np.degrees(np.tan(np.radians(d_deg)))
        p1, p2 = w.world_to_pixel(180.0 + d_deg, 0.0)
        np.testing.assert_allclose(p1 - 33.0, x_expect, rtol=1e-12)
        np.testing.assert_allclose(p2, 17.0, atol=1e-9)
    # dec offsets map to y the same way
    p1, p2 = w.world_to_pixel(180.0, 5.0)
    np.testing.assert_allclose(
        p2 - 17.0, np.degrees(np.tan(np.radians(5.0))), rtol=1e-12)
    np.testing.assert_allclose(p1, 33.0, atol=1e-9)


def test_sin_equator_analytic():
    """Orthographic at dec=0: x = (180/pi) sin(D)."""
    w = CelestialWCS(_hdr("SIN", crval1=10.0, crval2=0.0, cd=1.0, cd2=1.0))
    p1, _ = w.world_to_pixel(10.0 + 4.0, 0.0)
    np.testing.assert_allclose(
        p1 - 33.0, np.degrees(np.sin(np.radians(4.0))), rtol=1e-12)


def test_arc_is_angular_distance():
    """Equidistant: plane radius equals the true angular separation
    from the reference point, any geometry."""
    w = CelestialWCS(_hdr("ARC", crval1=83.5, crval2=54.0, cd=1.0, cd2=1.0))
    ra, dec = 88.0, 57.0
    p1, p2 = w.world_to_pixel(ra, dec)
    r_plane = np.hypot(p1 - 33.0, p2 - 17.0)
    # analytic angular separation (spherical law of cosines)
    a1, d1, a2, d2 = np.radians([83.5, 54.0, ra, dec])
    sep = np.degrees(np.arccos(
        np.sin(d1) * np.sin(d2) + np.cos(d1) * np.cos(d2) * np.cos(a2 - a1)
    ))
    np.testing.assert_allclose(r_plane, sep, rtol=1e-10)


def test_cos_dec_scaling():
    """At dec=60 a small RA offset shrinks by cos(60) = 1/2 on the
    projection plane (all zenithal projections, first order)."""
    w = CelestialWCS(_hdr("TAN", crval1=50.0, crval2=60.0, cd=1.0, cd2=1.0))
    d = 0.01
    p1, _ = w.world_to_pixel(50.0 + d, 60.0)
    np.testing.assert_allclose(p1 - 33.0, d * 0.5, rtol=1e-4)


def test_car_and_errors():
    h = {"CTYPE1": "RA---CAR", "CTYPE2": "DEC--CAR", "CRVAL1": 30.0,
         "CRVAL2": 0.0, "CRPIX1": 1.0, "CRPIX2": 1.0,
         "CDELT1": 0.1, "CDELT2": 0.1}
    w = CelestialWCS(h)
    ra, dec = w.pixel_to_world(11.0, 21.0)
    np.testing.assert_allclose([ra, dec], [31.0, 2.0], atol=1e-12)
    with pytest.raises(ValueError, match="CRVAL2"):
        CelestialWCS({**h, "CRVAL2": 5.0})
    with pytest.raises(ValueError, match="unsupported projection"):
        CelestialWCS(_hdr("AIT"))
    with pytest.raises(ValueError, match="rotation matrix"):
        CelestialWCS({**_hdr("TAN"), "CD1_1": 2e-4})
    # identity PC matrix is tolerated
    CelestialWCS({**_hdr("TAN"), "PC1_1": 1.0, "PC1_2": 0.0})


def test_sexagesimal_formatters():
    from nestfit_tpu.plotting import format_dec_dms, format_ra_hms

    assert format_ra_hms(180.0) == "12:00:00.0"
    assert format_ra_hms(83.63308) == "5:34:31.9"
    assert format_dec_dms(22.0145) == "+22:00:52"
    assert format_dec_dms(-5.5) == "-5:30:00"
