"""Cube container, FITS I/O, and store tests.

Mirrors the reference pytest suite's coverage of NoiseMap/DataCube/
CubeStack (reference: nestfit/test/test_main.py:32-71) on synthetic
FITS cubes, plus round-trip tests for our self-contained FITS I/O.
"""

import numpy as np
import pytest

from nestfit_tpu.cube import (
    CubeStack,
    DataCube,
    NoiseMap,
    NoiseMapUniform,
    read_fits,
    write_fits,
)
from nestfit_tpu.models.tables import AMMONIA_TRANSITIONS
from nestfit_tpu.utils import freq_axis_from_velocity


def test_fits_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.normal(size=(5, 7, 11)).astype(np.float32)
    header = {
        "CTYPE3": "FREQ", "CRVAL3": 23.69e9, "CDELT3": 1.25e4,
        "CRPIX3": 1.0, "RESTFRQ": 23.6944955e9, "BUNIT": "K",
        "OBJECT": "synthetic",
    }
    path = tmp_path / "cube.fits"
    write_fits(path, data, header)
    data2, header2 = read_fits(path)
    np.testing.assert_array_equal(data, data2)
    assert header2["CTYPE3"] == "FREQ"
    np.testing.assert_allclose(header2["CRVAL3"], 23.69e9)
    assert header2["OBJECT"] == "synthetic"
    assert header2["NAXIS"] == 3
    assert header2["NAXIS1"] == 11


def make_cube(n_lon=4, n_lat=3, n_chan=64, trans_id=1, noise=0.3, seed=0):
    nu = AMMONIA_TRANSITIONS[trans_id - 1].nu
    vaxis = np.linspace(-10, 10, n_chan)
    xarr = freq_axis_from_velocity(vaxis, nu)
    rng = np.random.default_rng(seed)
    data = rng.normal(scale=noise, size=(n_lon, n_lat, n_chan))
    return DataCube(data, xarr, noise_map=noise, trans_id=trans_id)


def test_noise_maps():
    nm = NoiseMapUniform(0.33)
    assert nm.get_noise(3, 5) == 0.33
    img = np.arange(12.0).reshape(3, 4) + 1.0  # (b, l)
    nmap = NoiseMap.from_pbimg(2.0, img)
    # transposed to (l, b)
    assert nmap.shape == (4, 3)
    assert nmap.get_noise(0, 0) == 2.0 / img[0, 0]
    img2 = img.copy()
    img2[0, 0] = np.nan
    nmap2 = NoiseMap.from_pbimg(2.0, img2)
    assert np.isinf(nmap2.get_noise(0, 0))


def test_datacube_shapes_and_spec_data():
    cube = make_cube()
    assert cube.spatial_shape == (4, 3)
    assert cube.nchan == 64
    assert cube.xarr[1] > cube.xarr[0]
    xarr, arr, noise, tid, has_nans = cube.get_spec_data(1, 2)
    assert arr.shape == (64,)
    assert noise == 0.3 and tid == 1 and not has_nans
    # NaN detection
    cube.data[0, 0, 5] = np.nan
    *_, has_nans = cube.get_spec_data(0, 0)
    assert has_nans


def test_datacube_from_fits(tmp_path):
    nu = AMMONIA_TRANSITIONS[0].nu
    n_chan = 32
    vaxis = np.linspace(-10, 10, n_chan)
    xarr = freq_axis_from_velocity(vaxis, nu)
    data_sbl = np.zeros((n_chan, 3, 4), dtype=np.float32)  # (S, b, l)
    data_sbl[10, 1, 2] = 5.0
    header = {
        "CTYPE3": "FREQ", "CRVAL3": xarr[0],
        "CDELT3": xarr[1] - xarr[0], "CRPIX3": 1.0,
        "RESTFRQ": nu, "BUNIT": "K",
    }
    path = tmp_path / "c.fits"
    write_fits(path, data_sbl, header)
    cube = DataCube.from_fits(path, noise_map=0.2, trans_id=1)
    assert cube.spatial_shape == (4, 3)
    np.testing.assert_allclose(cube.xarr, xarr, rtol=1e-9)
    # transposed pixel lookup
    assert cube.data[2, 1, 10] == 5.0


def test_cubestack_batch_accessors():
    c1 = make_cube(trans_id=1, seed=1)
    c2 = make_cube(trans_id=2, seed=2)
    c1.data[0, 0, :] = np.nan
    c1.data[2, 1, 30] = 10.0  # strong "signal"
    stack = CubeStack([c1, c2])
    assert stack.spatial_shape == (4, 3)
    assert stack.shape == (64, 3, 4)
    datas, noises, nan_mask, max_snr = stack.get_flat_batch()
    assert len(datas) == 2 and datas[0].shape == (12, 64)
    assert nan_mask.sum() == 1 and nan_mask[0]
    flat = 2 * 3 + 1
    assert max_snr[flat] == pytest.approx(10.0 / 0.3, rel=1e-6)
    # per-pixel accessor agrees
    assert stack.get_max_snr(2, 1) == pytest.approx(10.0 / 0.3, rel=1e-6)
    spec_data, any_nans = stack.get_spec_data(0, 0)
    assert any_nans and len(spec_data) == 2


def test_jybeam_vrad_ingestion(tmp_path):
    """Jy/beam VRAD cube -> K spectra within 1e-5 of the independently
    computed Rayleigh-Jeans truth (the reference converts via
    spectral_cube.to('K'), main.py:134-146)."""
    rng = np.random.default_rng(3)
    n_s, n_b, n_l = 16, 3, 4
    rest = 23.6944955e9
    bmaj, bmin = 32.0 / 3600.0, 28.0 / 3600.0   # degrees
    truth_k = rng.normal(scale=2.0, size=(n_s, n_b, n_l))

    # independently-coded forward conversion K -> Jy/beam
    vel_ms = (np.arange(n_s) - 7.0) * 250.0     # m/s, ascending
    nu = rest * (1.0 - vel_ms / 2.99792458e8)   # radio convention
    omega = np.pi * np.deg2rad(bmaj) * np.deg2rad(bmin) / (4 * np.log(2))
    k_per_jy = 1e-26 * 2.99792458e8**2 / (2 * 1.380649e-23 * nu**2 * omega)
    data_jy = truth_k / k_per_jy[:, None, None]

    header = {
        "CTYPE3": "VRAD", "CRVAL3": vel_ms[0], "CDELT3": 250.0,
        "CRPIX3": 1.0, "CUNIT3": "m/s", "RESTFRQ": rest,
        "BUNIT": "Jy/beam", "BMAJ": bmaj, "BMIN": bmin,
        "CDELT1": -8.0 / 3600.0, "CDELT2": 8.0 / 3600.0,
    }
    path = tmp_path / "jybeam.fits"
    write_fits(path, data_jy.astype(np.float64), header)
    cube = DataCube.from_fits(path, noise_map=0.1, trans_id=1)

    # ascending VRAD -> descending frequency -> from_fits flips; match
    # truth channel by channel via the returned xarr
    assert cube.xarr[1] > cube.xarr[0]
    order = np.argsort(nu)
    np.testing.assert_allclose(cube.xarr, nu[order], rtol=0, atol=1e-3)
    want = truth_k[order].transpose()           # (l, b, S)
    np.testing.assert_allclose(cube.data, want, rtol=1e-5, atol=1e-7)


def test_ingestion_units_and_conventions(tmp_path):
    """mJy/beam scaling, Jy/pixel area, unknown-BUNIT rejection,
    VOPT/VELO axis conventions, and channel masking."""
    from nestfit_tpu.cube.cube import brightness_scale, spectral_axis_hz

    rest = 23.6944955e9
    hdr = {"CTYPE3": "VOPT", "CRVAL3": 0.0, "CDELT3": 500.0,
           "CRPIX3": 1.0, "CUNIT3": "m/s", "RESTFRQ": rest,
           "NAXIS3": 8}
    # optical convention: nu = nu0 / (1 + v/c)
    xarr, _ = spectral_axis_hz(hdr)
    v = np.arange(8) * 500.0 / 1e3
    np.testing.assert_allclose(xarr, rest / (1 + v / 2.99792458e5))

    # FELO behaves like VOPT
    hdr["CTYPE3"] = "FELO-LSR"
    xarr_felo, _ = spectral_axis_hz(hdr)
    np.testing.assert_allclose(xarr_felo, xarr)

    # VELO + VELREF 257 -> radio
    hdr["CTYPE3"], hdr["VELREF"] = "VELO-LSR", 257
    xarr_r, _ = spectral_axis_hz(hdr)
    np.testing.assert_allclose(xarr_r, rest * (1 - v / 2.99792458e5))
    # VELO without VELREF -> relativistic
    del hdr["VELREF"]
    xarr_rel, _ = spectral_axis_hz(hdr)
    beta = v / 2.99792458e5
    np.testing.assert_allclose(
        xarr_rel, rest * np.sqrt((1 - beta) / (1 + beta)))

    # km/s units
    hdr["CTYPE3"], hdr["CUNIT3"], hdr["CDELT3"] = "VRAD", "km/s", 0.5
    xarr_k, _ = spectral_axis_hz(hdr)
    np.testing.assert_allclose(xarr_k, rest * (1 - v / 2.99792458e5))

    # brightness scales
    bh = {"BMAJ": 30.0 / 3600, "BMIN": 30.0 / 3600,
          "CDELT1": 10.0 / 3600, "CDELT2": 10.0 / 3600}
    nu = np.full(4, rest)
    s_jyb = brightness_scale("Jy/beam", bh, nu)
    s_mjyb = brightness_scale("mJy/beam", bh, nu)
    np.testing.assert_allclose(s_mjyb, 1e-3 * s_jyb)
    s_pix = brightness_scale("Jy/pixel", bh, nu)
    # beam area (30" gaussian) > pixel area (10" square) -> smaller K/Jy
    assert np.all(s_jyb < s_pix)
    assert brightness_scale("K", bh, nu) == 1.0
    assert brightness_scale(None, bh, nu) == 1.0
    with pytest.raises(ValueError, match="cannot convert BUNIT"):
        brightness_scale("erg/s", bh, nu)
    with pytest.raises(ValueError, match="BMAJ"):
        brightness_scale("Jy/beam", {}, nu)

    # channel masking drops band edges from data and axis
    rng = np.random.default_rng(1)
    data = rng.normal(size=(8, 2, 2))
    hdr2 = {"CTYPE3": "FREQ", "CRVAL3": rest, "CDELT3": 1e5,
            "CRPIX3": 1.0, "CUNIT3": "Hz", "RESTFRQ": rest, "BUNIT": "K"}
    path = tmp_path / "mask.fits"
    write_fits(path, data, hdr2)
    cube = DataCube.from_fits(path, noise_map=0.1,
                              mask_channels=[0, 7])
    assert cube.nchan == 6
    np.testing.assert_allclose(
        cube.data, data[1:7].transpose(), rtol=1e-6)


def test_blank_integer_pixels(tmp_path):
    """Integer FITS data with BLANK (+BSCALE/BZERO) -> NaN pixels."""
    from nestfit_tpu.cube.fits_io import _format_card

    data = np.arange(12, dtype=">i2").reshape(3, 2, 2)
    header_cards = [
        _format_card("SIMPLE", True), _format_card("BITPIX", 16),
        _format_card("NAXIS", 3), _format_card("NAXIS1", 2),
        _format_card("NAXIS2", 2), _format_card("NAXIS3", 3),
        _format_card("BLANK", 5), _format_card("BSCALE", 0.5),
        _format_card("BZERO", 1.0),
        "END".ljust(80).encode("ascii"),
    ]
    raw = b"".join(header_cards)
    raw += b" " * (-len(raw) % 2880)
    body = data.tobytes()
    body += b"\x00" * (-len(body) % 2880)
    path = tmp_path / "blank.fits"
    path.write_bytes(raw + body)
    out, hdr = read_fits(path)
    assert np.isnan(out.reshape(-1)[5])
    np.testing.assert_allclose(out.reshape(-1)[4], 0.5 * 4 + 1.0)
